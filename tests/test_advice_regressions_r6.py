"""ADVICE r05 regression pins (fixed in r6).

1. (high) merge_updates / delete_rows / reencode_late must REFUSE a
   table with appended partitions: appends plan from their own stats
   above the pid high-water, so the stored url→partition function
   cannot locate rows living in appended parts — a merge would leave
   the stale version alive there and a delete would silently miss it.
2. (medium) type-widening schema evolution: read_part_file must cast a
   pre-widening part's stored arrays to the merged (wider) type.
3. (low) compact_parts must not leak schema_json into the swapped
   lineage (append_lineage_rows strips it; lineage schema must be
   identical across write paths).
"""

import pytest
from pyspark.sql import functions as F

from skar_spark.config import EngineConfig
from skar_spark.engine.encode import (append_documents, delete_rows,
                                      encode_documents, merge_updates,
                                      reencode_late)

pytestmark = pytest.mark.spark

CFG = EngineConfig(target_partition_rows=200, salt_threshold_rows=200,
                   batch_partitions=64)


def _docs(spark, n, base=0):
    return spark.range(n).select(
        (F.col("id") + base).alias("id"),
        F.concat(F.lit("https://h"), (F.col("id") + base) % 7,
                 F.lit(".local/"), F.col("id") + base).alias("url"),
        F.concat(F.lit("text body number "),
                 (F.col("id") + base).cast("string")).alias("text"),
        F.lit("<html></html>").alias("html"),
        F.lit("en").alias("lang"),
        (F.timestamp_seconds(1_700_000_000 + (F.col("id") + base) * 60)
         .cast("timestamp")).alias("warc_ts"),
    ).drop("id")


def _encoded_with_append(spark, tmp_path):
    out = str(tmp_path / "tbl")
    encode_documents(spark, _docs(spark, 400), out, CFG, n_rows=400)
    n = append_documents(spark, _docs(spark, 120, base=1000), out, CFG)
    assert n > 0
    return out


def test_merge_refused_on_appended_table(spark, tmp_path):
    out = _encoded_with_append(spark, tmp_path)
    upd = _docs(spark, 5, base=1000)  # urls living in appended parts
    with pytest.raises(NotImplementedError, match="appended"):
        merge_updates(spark, upd, out, CFG)


def test_delete_refused_on_appended_table(spark, tmp_path):
    out = _encoded_with_append(spark, tmp_path)
    urls = _docs(spark, 5, base=1000).select("url")
    with pytest.raises(NotImplementedError, match="appended"):
        delete_rows(spark, urls, out, CFG)


def test_reencode_late_refused_on_appended_table(spark, tmp_path):
    out = _encoded_with_append(spark, tmp_path)
    late = _docs(spark, 3, base=5000)
    full = _docs(spark, 400).unionByName(late)
    with pytest.raises(NotImplementedError, match="appended"):
        reencode_late(spark, full, late, out, CFG)


def test_merge_still_works_without_appends(spark, tmp_path):
    out = str(tmp_path / "tbl2")
    encode_documents(spark, _docs(spark, 400), out, CFG, n_rows=400)
    upd = _docs(spark, 3).withColumn("text", F.lit("updated!"))
    merge_updates(spark, upd, out, CFG)
    from skar_spark.engine.decode import scan
    got = {r.url: r.text for r in scan(spark, out).collect()}
    for r in upd.collect():
        assert got[r.url] == "updated!"


def test_read_part_file_casts_widened_types(tmp_path):
    import pyarrow as pa

    from skar_spark.engine.partfile import read_part_file, write_part_file

    t = pa.table({
        "url": pa.array([f"https://x.local/{i}" for i in range(10)]),
        "score": pa.array(list(range(10)), pa.int32()),
        "ratio": pa.array([i / 3.0 for i in range(10)], pa.float32()),
    })
    p = str(tmp_path / "w.skar")
    write_part_file(p, t, CFG)
    # merged schema widened the columns after this part was written
    got = read_part_file(p, columns=["url", "score", "ratio"],
                         fill_missing={"url": "str", "score": "i64",
                                       "ratio": "f64"})
    assert got["score"].type == pa.int64()
    assert got["ratio"].type == pa.float64()
    assert got["score"].to_pylist() == list(range(10))
    assert got["ratio"].to_pylist() == pytest.approx(
        [float(pa.scalar(i / 3.0, pa.float32()).as_py())
         for i in range(10)])


def test_compact_lineage_has_no_schema_json(spark, tmp_path):
    from skar_spark.engine.compact import compact_parts
    from skar_spark.engine.encode import read_lineage

    out = str(tmp_path / "tbl3")
    encode_documents(spark, _docs(spark, 400), out, CFG, n_rows=400)
    res = compact_parts(spark, out, CFG, small_rows=1000)
    assert res["new_parts"] >= 1
    lin = read_lineage(spark, out)
    assert "schema_json" not in lin.columns


def test_cosine_blocked_zero_norm_matches_oracle(spark, tmp_path):
    """ADVICE r05 #4, oracle-exact since r6: zero-norm vectors score as
    NULL cos ranked LAST (DuckDB x/0 = NULL; DESC NULLS LAST) — they
    enter the top-k only when fewer than k nonzero candidates exist.
    Build a 12-vector base with 5 zero vectors so every query has just
    6 nonzero non-self candidates and the null fillers are exercised,
    then hash-compare against the shared SQL_COSINE_TOPK oracle."""
    import math

    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from skar_spark.ops.dedup import _DIM, q_cosine_topk_blocked

    rng = np.random.RandomState(7)
    vecs = [rng.randn(_DIM).astype(np.float32) for _ in range(7)] + \
        [np.zeros(_DIM, np.float32) for _ in range(5)]
    pq.write_table(pa.table({
        "vec_id": pa.array(range(12), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))

    got = {(r.qid, r.rk, r.vec_id,
            None if r.cos is None else round(r.cos, 4))
           for r in q_cosine_topk_blocked(spark, str(tmp_path)).collect()}

    from skar_spark.ops.dedup import SQL_COSINE_TOPK
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{tmp_path}/embeddings.parquet')")
    want = set()
    for qid, rk, vec_id, cos in con.execute(SQL_COSINE_TOPK).fetchall():
        want.add((qid, rk, vec_id,
                  None if cos is None or math.isnan(cos)
                  else round(cos, 4)))
    assert got == want
    # null-cos rows exist and always rank after every nonzero row
    nulls = {r for r in got if r[3] is None}
    assert nulls
    for qid, rk, _v, _c in nulls:
        assert all(r[1] < rk for r in got
                   if r[0] == qid and r[3] is not None)
