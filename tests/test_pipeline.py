"""End-to-end curation pipeline: annotate → filter → exact dedup →
near dedup (staged candidates) → encode. The drop decisions must agree
with the independent driver queries, and the encoded output must be
scannable and exactly the survivor set."""

import pytest
from pyspark.sql import functions as F

from skar_spark.config import EngineConfig
from skar_spark.engine.decode import scan
from skar_spark.pipeline import curate

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def curated(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cur"))
    cfg = EngineConfig(target_partition_rows=200, max_row_group_size=100,
                       salt_threshold_rows=150)
    # keep_stage=True: these tests audit the staged pair table
    return curate(spark, SF, out, cfg, keep_stage=True), out


def test_stage_counters_monotone(spark, curated):
    stats, _ = curated
    assert stats["input_docs"] >= stats["after_quality"] \
        >= stats["after_exact_dedup"] >= stats["after_near_dedup"] > 0
    assert stats["encoded_rows"] == stats["after_near_dedup"]
    assert 0 < stats["bytes_out"] < stats["bytes_in"]


def test_near_dedup_agrees_with_driver_query(spark, curated):
    """The pipeline's staged-candidate survivor rule must drop exactly
    the docs the self-contained dedup_near query drops (intersected
    with the docs that survived the earlier stages)."""
    from skar_spark.ops.dedup import q_dedup_near

    stats, _out = curated
    near_survivors = {r.doc_id for r in
                      q_dedup_near(spark, SF).collect()}
    # doc ids of the encoded corpus, recovered from the url tail
    enc = scan(spark, stats["table"]).select("url")
    enc_ids = {int(r.url.rsplit("/", 1)[1]) for r in enc.collect()}
    # every encoded doc survived the near-dup rule…
    assert enc_ids <= near_survivors
    # …and every dropped-near doc that passed the earlier gates is gone
    dropped_near = {r.doc_id for r in
                    spark.read.parquet(stats["staged_pairs"])
                    .select(F.col("b").alias("doc_id")).distinct()
                    .collect()}
    assert not (enc_ids & dropped_near)


def test_encoded_table_roundtrips(spark, curated):
    stats, _ = curated
    enc = scan(spark, stats["table"])
    assert enc.count() == stats["encoded_rows"]
    # text survives the encode bit-identically (spot: md5 set equality)
    src = spark.read.parquet(f"{SF}/documents.parquet")
    src_md5 = {r.h for r in src.select(F.md5("text").alias("h")).collect()}
    enc_md5 = {r.h for r in enc.select(F.md5("text").alias("h")).collect()}
    assert enc_md5 <= src_md5


def test_stage_lifecycle(spark, curated, tmp_path):
    """VERDICT r04 item 7: keep_stage=True retains the shared candidate
    table (audited by the tests above); the DEFAULT run deletes the
    whole stage root after the encode commits, leaving only the table."""
    import os

    stats, out = curated
    assert stats["staged_pairs"] is not None
    assert os.path.isdir(stats["staged_pairs"])   # kept on request

    out2 = str(tmp_path / "cur2")
    cfg = EngineConfig(target_partition_rows=200, max_row_group_size=100,
                       salt_threshold_rows=150)
    stats2 = curate(spark, SF, out2, cfg)         # default: no staging left
    assert stats2["staged_pairs"] is None
    assert not os.path.exists(os.path.join(out2, "stage"))
    assert os.path.isdir(stats2["table"])
    assert stats2["after_near_dedup"] == stats["after_near_dedup"]


def test_pipeline_curate_query_matches_pipeline(spark, curated):
    """The driver query q_pipeline_curate must emit exactly the encoded
    corpus (same survivor rule, shared stage frames)."""
    from skar_spark.pipeline import q_pipeline_curate

    stats, _ = curated
    got = {(r.url, r.text_md5)
           for r in q_pipeline_curate(spark, SF).collect()}
    enc = scan(spark, stats["table"]).select(
        "url", F.md5("text").alias("text_md5"))
    assert {(r.url, r.text_md5) for r in enc.collect()} == got
