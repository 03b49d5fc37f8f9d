"""Late-data rollback: inject late rows for a committed day and assert
exactly-once final content — the executable mirror of the reference's
reorg walk-back + refetch (skar/src/skar_runner.rs:160-232)."""

import pytest
from pyspark.sql import functions as F

from skar_spark.config import EngineConfig
from skar_spark.engine.decode import list_part_files, scan, validate_output
from skar_spark.engine.encode import (
    encode_documents,
    read_lineage,
    reencode_late,
)
from skar_spark.synth import synth_documents

pytestmark = pytest.mark.spark

N_DOCS = 4_000
CFG = EngineConfig(target_partition_rows=500, max_row_group_size=250,
                   salt_threshold_rows=400)


def _split(docs):
    """Hold back a handful of rows as 'late' arrivals — few enough that
    some partitions stay untouched, proving the rollback is surgical."""
    is_late = (F.pmod(F.xxhash64("url"), F.lit(997)) == 0)
    return docs.filter(~is_late), docs.filter(is_late)


@pytest.mark.parametrize("scheme", ["day_hash", "hash"])
def test_late_rows_reencoded_exactly_once(spark, tmp_path, scheme):
    docs = synth_documents(spark, N_DOCS, partitions=8)
    on_time, late = _split(docs)
    out = str(tmp_path / f"out_{scheme}")

    encode_documents(spark, on_time, out, CFG, scheme=scheme,
                     n_rows=None if scheme == "day_hash" else N_DOCS)
    before_files = set(list_part_files(out))
    before = {r.partition_id: (r.row_count, bytes(r.text_checksum))
              for r in read_lineage(spark, out, latest=True).collect()}

    lin = reencode_late(spark, docs, late, out, CFG)

    # exactly-once: decoded content == full corrected dataset
    back = scan(spark, out).select("url", "text")
    src = docs.select("url", "text")
    assert back.exceptAll(src).count() == 0
    assert src.exceptAll(back).count() == 0
    # latest lineage has one row per partition and passes validation
    after = {r.partition_id: (r.row_count, bytes(r.text_checksum))
             for r in lin.collect()}
    assert len(after) == len(set(after))
    assert all(r.ok for r in validate_output(spark, out).collect())
    # only the affected partitions changed; at least one did, and at
    # least one untouched partition kept its exact checksum
    changed = {p for p in before if p in after and before[p] != after[p]}
    unchanged = {p for p in before if after.get(p) == before[p]}
    assert changed and unchanged
    # no stray files: every lineage file exists
    assert {r.file for r in lin.collect()} <= set(list_part_files(out)) | \
        before_files


def test_late_rows_before_day_range_rejected(spark, tmp_path):
    docs = synth_documents(spark, N_DOCS, partitions=8)
    out = str(tmp_path / "out")
    encode_documents(spark, docs, out, CFG, scheme="day_hash")
    too_early = docs.limit(50).withColumn(
        "warc_ts", F.col("warc_ts") - F.expr("INTERVAL 30 DAYS"))
    with pytest.raises(ValueError, match="rollback bound"):
        reencode_late(spark, docs.unionAll(too_early), too_early, out, CFG)
