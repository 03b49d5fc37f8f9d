"""Spark-job level tests: distributed encode→decode, salting, resume.

Resume mirrors the reference's checkpoint-restart semantics
(db.next_block_num, skar/src/db/mod.rs:68-86; FIXTURES.md §4): kill after
K of P partition batches commit, restart, assert exactly-once partition
output identical to an uninterrupted run.
"""

import shutil

import pytest
from pyspark.sql import functions as F

from skar_spark.config import EngineConfig
from skar_spark.engine.decode import list_part_files, prune_partitions, scan
from skar_spark.engine.encode import (
    completed_part_ids,
    encode_documents,
    plan_partitions,
)
from skar_spark.synth import synth_documents

N_DOCS = 6_000
CFG = EngineConfig(target_partition_rows=1_000, max_row_group_size=500,
                   salt_threshold_rows=800, batch_partitions=2)

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def docs(spark):
    return synth_documents(spark, N_DOCS, partitions=8)


def test_salting_bounds_partition_size(spark, docs):
    planned = plan_partitions(docs, 8, CFG)
    sizes = planned.groupBy("part_id").count().collect()
    # zipf head host has ~20% of docs; without salting one partition would
    # hold >1200 rows from that host alone. With salting, each (host,salt)
    # group ≤ threshold, so no partition should be wildly above fair share.
    assert max(r["count"] for r in sizes) < 3 * N_DOCS / 8
    # salts actually used for the heavy host
    n_salted = planned.filter(F.col("salt") > 0).count()
    assert n_salted > 0


def test_encode_decode_identity(spark, docs, tmp_path):
    out = str(tmp_path / "out")
    lin = encode_documents(spark, docs, out, CFG, n_rows=N_DOCS)
    assert lin.agg(F.sum("row_count")).collect()[0][0] == N_DOCS
    assert lin.filter(F.col("status") != "committed").count() == 0

    dec = scan(spark, out)
    assert dec.count() == N_DOCS
    a = docs.select("url", "warc_ts", "html", "text", "lang")
    b = dec.select("url", "warc_ts", "html", "text", "lang")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_resume_exactly_once(spark, docs, tmp_path):
    out_full = str(tmp_path / "full")
    out_resume = str(tmp_path / "resumed")

    lin_full = encode_documents(spark, docs, out_full, CFG, n_rows=N_DOCS)
    full_rows = {(r.partition_id, r.row_count) for r in
                 lin_full.select("partition_id", "row_count").collect()}

    # run only the first batch, "kill", then resume
    encode_documents(spark, docs, out_resume, CFG, n_rows=N_DOCS,
                     max_batches=1)
    partial = completed_part_ids(spark, out_resume)
    assert 0 < len(partial) < len(full_rows)

    lin_res = encode_documents(spark, docs, out_resume, CFG, n_rows=N_DOCS,
                               resume=True)
    res_rows = {(r.partition_id, r.row_count) for r in
                lin_res.select("partition_id", "row_count").collect()}
    assert res_rows == full_rows  # exactly-once, identical partitioning
    # no duplicate partition ids in lineage
    ids = [r.partition_id for r in lin_res.select("partition_id").collect()]
    assert len(ids) == len(set(ids))
    # decoded content identical between interrupted+resumed and full runs
    a = scan(spark, out_full).select("url", "text")
    b = scan(spark, out_resume).select("url", "text")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_partition_pruning_via_lineage(spark, docs, tmp_path):
    out = str(tmp_path / "out2")
    encode_documents(spark, docs, out, CFG, n_rows=N_DOCS)
    all_files = list_part_files(out)
    # a host that exists
    some_host = (plan_partitions(docs, 8, CFG)
                 .select("host").limit(1).collect()[0].host)
    kept = prune_partitions(spark, out, host_eq=some_host)
    assert 0 < len(kept) <= len(all_files)
    rows = scan(spark, out, columns=["url"], host_eq=some_host).count()
    assert rows > 0
    # absent host prunes everything (bloom has no false negatives)
    kept_none = prune_partitions(spark, out, host_eq="www.no-such-host.zz")
    assert len(kept_none) <= max(1, len(all_files) // 2)
