"""Engine-level queries for the driver contract (non-SQL-expressible).

These exercise the actual north-rule path — encode → decode → verify —
on a webtext-shaped table derived deterministically from the driver's
`documents` table. No oracle SQL exists for them (custom storage format);
the driver records the weaker rows-only check.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skar_spark.config import EngineConfig


def webtext_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically lift the driver's documents table to the
    north-rule input shape (url, warc_ts, html, text, lang)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.concat(F.lit("https://docs-"),
                 F.pmod(F.xxhash64("doc_id"), F.lit(97)).cast("string"),
                 F.lit(".local/"), F.col("doc_id").cast("string")).alias("url"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body><p>"), F.col("text"),
                          F.lit("</p></body></html>")), "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def _out_dir(sf_dir: str) -> str:
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return f"/tmp/skar_spark_engine_{tag}"


def q_encode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full engine pass: encode the webtext table, decode it, verify the
    north-rule invariant (byte-identical text per url), return one row per
    partition with codec choices + verification flags."""
    from skar_spark.engine.decode import scan
    from skar_spark.engine.encode import encode_documents

    cfg = EngineConfig(target_partition_rows=5_000, max_row_group_size=2_000,
                       salt_threshold_rows=4_000)
    docs = webtext_from_documents(spark, sf_dir)
    out = _out_dir(sf_dir)
    shutil.rmtree(out, ignore_errors=True)
    n = docs.count()
    lin = encode_documents(spark, docs, out, cfg, n_rows=n)

    dec = scan(spark, out)
    orig = docs.select("url", F.md5(F.col("text")).alias("h_orig"))
    back = dec.select("url", F.md5(F.col("text")).alias("h_back"))
    mismatches = (orig.join(back, "url", "full_outer")
                  .filter((F.col("h_orig").isNull()) | (F.col("h_back").isNull())
                          | (F.col("h_orig") != F.col("h_back"))).count())

    return (lin.select("partition_id", "row_count", "bytes_in", "bytes_out",
                       "n_row_groups", "codec_choices")
            .withColumn("text_mismatches", F.lit(mismatches))
            .withColumn("verified", F.lit(mismatches == 0))
            .orderBy("partition_id"))


def q_engine_scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-side projection + pruning over the encoded output of
    q_encode_roundtrip (depends on it having run; re-runs encode if not)."""
    from skar_spark.engine.decode import scan

    out = _out_dir(sf_dir)
    if not os.path.isdir(os.path.join(out, "parts")):
        q_encode_roundtrip(spark, sf_dir).collect()
    dec = scan(spark, out, columns=["url", "lang"])
    return (dec.groupBy("lang").agg(F.count("*").alias("n_docs"))
            .orderBy(F.col("n_docs").desc(), F.col("lang")))
