"""Snapshot rollback (Iceberg rollback_to_timestamp analog): a
metadata-only lineage rewrite that reverts merges/deletes/appends, with
an EXACT safety guard (file-set intersection — kept rows' bytes must be
untouched by the undone attempts) rather than a flag check."""

import time

import pytest
from pyspark.sql import functions as F

from skar_spark.config import EngineConfig
from skar_spark.engine.decode import scan, validate_output
from skar_spark.engine.encode import (
    delete_rows,
    encode_documents,
    merge_updates,
    read_lineage,
    rollback,
    vacuum,
)
from skar_spark.synth import synth_documents

pytestmark = pytest.mark.spark

N_DOCS = 3_000
RCFG = EngineConfig(target_partition_rows=400, max_row_group_size=200,
                    salt_threshold_rows=350, retain_superseded=True)


def _encode(spark, tmp_path, cfg=RCFG, name="tbl"):
    docs = synth_documents(spark, N_DOCS, partitions=8).cache()
    out = str(tmp_path / name)
    encode_documents(spark, docs, out, cfg, n_rows=N_DOCS)
    return docs, out


def test_rollback_reverts_merge_and_delete(spark, tmp_path):
    docs, out = _encode(spark, tmp_path)
    t_pre = time.time()
    time.sleep(0.05)
    updates = docs.limit(9).withColumn(
        "text", F.concat("text", F.lit(" [oops]")))
    merge_updates(spark, updates, out, RCFG)
    delete_rows(spark, docs.select("url").limit(4), out, RCFG)
    assert scan(spark, out).count() == N_DOCS - 4

    lin = rollback(spark, out, t_pre)

    back = scan(spark, out).select("url", "text")
    expected = docs.select("url", "text")
    assert back.exceptAll(expected).count() == 0
    assert expected.exceptAll(back).count() == 0
    assert all(r.ok for r in validate_output(spark, out).collect())
    # every surviving lineage row predates the rollback point
    assert all(r.committed_at <= t_pre for r in lin.collect())


def test_rollback_noop_when_nothing_after(spark, tmp_path):
    docs, out = _encode(spark, tmp_path)
    n_rows = read_lineage(spark, out, latest=True).count()
    lin = rollback(spark, out, time.time() + 10)
    assert lin.count() == n_rows
    assert scan(spark, out).count() == N_DOCS


def test_rollback_refused_without_retained_files(spark, tmp_path):
    cfg = EngineConfig(target_partition_rows=400, max_row_group_size=200,
                       salt_threshold_rows=350)  # no retain_superseded
    docs, out = _encode(spark, tmp_path, cfg=cfg)
    t_pre = time.time()
    time.sleep(0.05)
    updates = docs.limit(5).withColumn(
        "text", F.concat("text", F.lit(" [oops]")))
    merge_updates(spark, updates, out, cfg)
    with pytest.raises(ValueError, match="overwrote kept part files"):
        rollback(spark, out, t_pre)


def test_rollback_before_first_commit_refused(spark, tmp_path):
    _docs, out = _encode(spark, tmp_path)
    with pytest.raises(ValueError, match="precedes"):
        rollback(spark, out, 1.0)


def test_rollback_erases_evolved_column(spark, tmp_path):
    docs, out = _encode(spark, tmp_path)
    t_pre = time.time()
    time.sleep(0.05)
    updates = (docs.limit(6)
               .withColumn("rev", F.lit(7).cast("long")))
    merge_updates(spark, updates, out, RCFG)
    assert "rev" in scan(spark, out).columns
    rollback(spark, out, t_pre)
    assert "rev" not in scan(spark, out).columns
    assert scan(spark, out).count() == N_DOCS


def test_rollback_deletes_undone_files_and_vacuum_composes(spark,
                                                           tmp_path):
    import os

    docs, out = _encode(spark, tmp_path)
    t_pre = time.time()
    time.sleep(0.05)
    updates = docs.limit(5).withColumn(
        "text", F.concat("text", F.lit(" [oops]")))
    merge_updates(spark, updates, out, RCFG)
    merged_files = {r.file for r in
                    read_lineage(spark, out, latest=True).collect()}
    rollback(spark, out, t_pre)
    kept_files = {r.file for r in
                  read_lineage(spark, out, latest=True).collect()}
    gone = merged_files - kept_files
    assert gone and not any(os.path.exists(f) for f in gone)
    # vacuum on the rolled-back table keeps it intact
    vacuum(spark, out)
    assert scan(spark, out).count() == N_DOCS
    assert all(r.ok for r in validate_output(spark, out).collect())
