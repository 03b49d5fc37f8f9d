"""Deterministic corpus sampling + distinct-count sketching.

Training-data pipeline ops a 100 TB corpus build needs around the
dedup/quality family (SURVEY §2-adjacent; no reference analog — the
reference serves queries, a corpus build also has to SUBSET and SIZE
its data):

- **hash sampling** (`q_sample_hash`): keep a document iff a salted
  content-independent hash of its id lands in a residue class — the
  standard reproducible corpus subsample. Embarrassingly parallel (a
  filter, no shuffle), stable across runs/engines, and composable:
  deciles by varying the residue, nested samples by coarser moduli.
- **stratified sampling** (`q_sample_stratified`): a fixed per-language
  quota taken in hash order (row_number window per lang) — the
  balanced-evaluation-set builder. One shuffle on the strata key.
- **KMV distinct-count sketch** (`q_kmv_distinct`): the k-minimum-
  values estimator over the 60-bit text hash — distinct-document
  estimate = (k−1) · 2^60 / h_k where h_k is the k-th smallest
  distinct hash. Unlike HLL, KMV is EXACTLY reproducible in ANSI SQL
  (bottom-k of the same portable hash), so the whole sketch —
  including the floating-point estimate — hash-verifies against the
  DuckDB oracle. Scale shape: per-partition bottom-k (TakeOrdered)
  after a map-side-combinable distinct; the merged sketch is k longs.

Everything uses the portable md5-60bit hash (textops.h60), so each op
is bit-reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from skar_spark.ops.relational import load
from skar_spark.ops.textops import h60, sql_h60

# keep 1 / _SAMPLE_DEN of the corpus (residue 0 of the salted hash)
_SAMPLE_DEN = 16
_SAMPLE_SALT = "s1#"
# per-language quota for the stratified sample
_STRATA_QUOTA = 20
# sketch size: estimate stderr ≈ 1/sqrt(k-2) ≈ 6.3% at 256
_KMV_K = 256


def _sample_hash_col():
    return h60(F.concat(F.lit(_SAMPLE_SALT),
                        F.col("doc_id").cast("string")))


def q_sample_hash(spark, sf):
    """Reproducible 1/_SAMPLE_DEN uniform sample of `documents`."""
    d = load(spark, sf, "documents")
    return (d.filter(F.pmod(_sample_hash_col(), F.lit(_SAMPLE_DEN)) == 0)
            .select("doc_id", "lang"))


SQL_SAMPLE_HASH = f"""
SELECT doc_id, lang FROM documents
WHERE {sql_h60("concat('" + _SAMPLE_SALT + "', CAST(doc_id AS VARCHAR))")}
      % {_SAMPLE_DEN} = 0
"""


def q_sample_stratified(spark, sf):
    """Per-language quota of _STRATA_QUOTA docs, taken in hash order
    (deterministic ties broken by doc_id)."""
    d = load(spark, sf, "documents")
    w = Window.partitionBy("lang").orderBy(
        _sample_hash_col().asc(), F.col("doc_id").asc())
    return (d.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _STRATA_QUOTA)
            .select("doc_id", "lang", "rn"))


SQL_SAMPLE_STRATIFIED = f"""
SELECT doc_id, lang, rn FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY {sql_h60("concat('" + _SAMPLE_SALT
                             + "', CAST(doc_id AS VARCHAR))")} ASC,
                    doc_id ASC) AS rn
  FROM documents) t
WHERE rn <= {_STRATA_QUOTA}
"""


def q_kmv_distinct(spark, sf):
    """KMV sketch of distinct `text` values: (k, h_k, estimate).

    The bottom-k runs as TakeOrdered (per-partition top-k + driver
    merge of k longs — no global sort); the preceding distinct is a
    map-side-combinable hash aggregate. 2^60 is exactly representable
    as a double and both engines round h_k to double identically
    (IEEE nearest), so the ESTIMATE hash-verifies too."""
    d = load(spark, sf, "documents")
    dist = d.select(h60(F.col("text")).alias("h")).distinct()
    bot = dist.orderBy(F.col("h").asc()).limit(_KMV_K)
    agg = bot.agg(F.max("h").alias("hk"),
                  F.count("*").cast("long").alias("k"))
    return agg.select(
        "k", "hk",
        ((F.col("k") - 1).cast("double") * F.lit(float(1 << 60))
         / F.col("hk").cast("double")).alias("est"))


SQL_KMV_DISTINCT = f"""
SELECT k, hk,
       CAST(k - 1 AS DOUBLE) * 1152921504606846976.0
       / CAST(hk AS DOUBLE) AS est
FROM (
  SELECT max(h) AS hk, CAST(count(*) AS BIGINT) AS k FROM (
    SELECT DISTINCT {sql_h60('text')} AS h FROM documents
    ORDER BY h ASC LIMIT {_KMV_K}) b) t
"""
