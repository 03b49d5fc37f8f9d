"""Physical-plan assertions: the optimizations the 100 TB story depends
on must be visible in `.explain`, not just assumed.

- filters + projection reach the parquet scan (PushedFilters/ReadSchema);
- small dimension sides broadcast (no shuffle join for them);
- expression pipelines stay inside WholeStageCodegen;
- the encode plan has exactly ONE exchange (the clustering shuffle).
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_range_filter_pushdown(spark):
    df = entrymod.queries()["range_filter"](spark, SF)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "IsNotNull" in plan or "GreaterThan" in plan
    # projection pruning: the scan must not read every lineitem column
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read


def test_semi_join_broadcasts(spark):
    df = entrymod.queries()["semi_join"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_inner_join_broadcasts_dim(spark):
    df = entrymod.queries()["inner_join"](spark, SF)
    plan = _plan(df)
    assert "BroadcastExchange" in plan


def test_queries_use_codegen(spark):
    # AQE wraps the plan until execution, hiding codegen subtrees from
    # a pre-execution explain — disable it just for this inspection
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for name in ("tpch_q1", "quality_score", "token_count"):
            df = entrymod.queries()[name](spark, SF)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "codegen")
            assert "Found 0 WholeStageCodegen" not in plan, name
            assert "WholeStageCodegen subtrees" in plan, name
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_encode_plan_single_exchange(spark):
    """The encode pipeline's only shuffle is the clustering exchange on
    part_id (the salt map joins via broadcast)."""
    from skar_spark.config import EngineConfig
    from skar_spark.engine.encode import plan_partitions
    from skar_spark.synth import synth_documents

    docs = synth_documents(spark, 2_000, partitions=4)
    planned = plan_partitions(docs, 4, EngineConfig(
        target_partition_rows=500, salt_threshold_rows=400))
    grouped = planned.groupBy("part_id").agg(F.count("*").alias("n"))
    plan = _plan(grouped)
    # one shuffle for the groupBy; the heavy-host salt join broadcasts
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2  # groupBy partial+final counts once under AQE
    assert "BroadcastExchange" in plan
