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


# sub-strata for the stratified pre-reduction: the global per-lang rank
# window only ever sees ≤ quota × _STRATA_SUB rows per lang
_STRATA_SUB = 64


def q_sample_stratified(spark, sf):
    """Per-language quota of _STRATA_QUOTA docs, taken in hash order
    (deterministic ties broken by doc_id).

    Local top-quota pre-reduction (VERDICT r05 #6): a single per-`lang`
    row_number window funnels the dominant language through one sort
    task at 100×. Instead rank first within (lang, hash-sub-stratum) —
    a key that spreads the hot lang across _STRATA_SUB tasks — and keep
    each sub-stratum's top quota; any row in the global per-lang top
    quota is also in its sub-stratum's top quota (rank over a subset
    never exceeds rank over the set), so the survivors (≤ quota ×
    _STRATA_SUB per lang, metadata-sized) rank globally to the
    IDENTICAL result."""
    d = load(spark, sf, "documents")
    staged = d.select("doc_id", "lang", _sample_hash_col().alias("_h"))
    sub = Window.partitionBy(
        "lang", F.pmod(F.col("_h"), F.lit(_STRATA_SUB))).orderBy(
        F.col("_h").asc(), F.col("doc_id").asc())
    pre = (staged.withColumn("_rs", F.row_number().over(sub))
           .filter(F.col("_rs") <= _STRATA_QUOTA))
    w = Window.partitionBy("lang").orderBy(
        F.col("_h").asc(), F.col("doc_id").asc())
    return (pre.withColumn("rn", F.row_number().over(w))
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


# --- KMV set algebra: corpus-overlap estimation --------------------------------
#
# The property that makes KMV the right sketch at 100 TB is MERGEABILITY:
# bottom-k sketches built independently per corpus shard combine into the
# union sketch by re-taking the bottom-k of their concatenation, and the
# Jaccard of two sets is estimated from sketches alone as
# |A_sk ∩ B_sk ∩ U_sk| / |U_sk|.  This op demonstrates the full algebra
# on the two doc_id parities of `documents`, sketching their DISTINCT
# TOKEN-TRIGRAM sets (the standard corpus-overlap basis — whole-document
# hashes rarely collide across independently-crawled shards, n-grams do).
# Every stage is bottom-k of a portable hash, so the result — including
# all four floating-point estimates — hash-verifies against DuckDB.

_OVL_N = 3  # token n-gram order for the overlap basis


def _gram_hashes(spark, sf):
    from skar_spark.ops.corpus import _ngrams, _toks
    from skar_spark.ops.relational import _spread
    # stage tokens before the gram transform (unstaged, the split re-runs
    # per gram — see corpus._doc_grams) and spread the 1-2-split bench
    # scan across cores; both are no-ops semantically
    d = _spread(spark, load(spark, sf, "documents").select("doc_id", "text"))
    staged = d.select("doc_id", _toks().alias("_t"))
    return (staged.select((F.col("doc_id") % 2).alias("side"),
                          F.explode(F.array_distinct(
                              _ngrams(F.col("_t"), _OVL_N))).alias("gram"))
            .select("side", h60(F.col("gram")).alias("h"))
            .distinct())


def q_kmv_overlap(spark, sf):
    """KMV union/intersection/Jaccard estimates between the distinct
    trigram sets of the two doc_id parities.

    Scale shape: one distinct over (side, gram-hash) with map-side
    combine, then three TakeOrdered bottom-k sketches; all joins below
    run on ≤ _KMV_K-row frames (broadcast)."""
    g = _gram_hashes(spark, sf)
    a = g.filter(F.col("side") == 0).select("h").orderBy("h").limit(_KMV_K)
    b = g.filter(F.col("side") == 1).select("h").orderBy("h").limit(_KMV_K)
    u = a.union(b).distinct().orderBy("h").limit(_KMV_K)

    two60 = F.lit(float(1 << 60))

    def est(df, kname, hkname, ename):
        agg = df.agg(F.max("h").alias(hkname),
                     F.count("*").cast("long").alias(kname))
        return agg.select(
            kname, hkname,
            ((F.col(kname) - 1).cast("double") * two60
             / F.col(hkname).cast("double")).alias(ename))

    ea = est(a, "k_a", "hk_a", "est_a").select("est_a")
    eb = est(b, "k_b", "hk_b", "est_b").select("est_b")
    eu = est(u, "k_u", "hk_u", "est_union")
    common = (u.join(a, "h").join(b, "h")
              .agg(F.count("*").cast("long").alias("n_common")))
    out = eu.crossJoin(ea).crossJoin(eb).crossJoin(common)
    jac = F.col("n_common").cast("double") / F.col("k_u").cast("double")
    return out.select(
        "k_u", "hk_u", "est_a", "est_b", "est_union", "n_common",
        jac.alias("jaccard"),
        (jac * F.col("est_union")).alias("est_intersect"))


def sql_kmv_overlap() -> str:
    from skar_spark.ops.corpus import _SQL_TOKS
    grams = (f"[array_to_string(t[i:i+{_OVL_N - 1}], ' ') "
             f"for i in range(1, len(t) - {_OVL_N - 2})]")
    return f"""
WITH g AS (
  SELECT DISTINCT side, {sql_h60('gram')} AS h FROM (
    SELECT doc_id % 2 AS side, unnest(list_distinct({grams})) AS gram
    FROM (SELECT doc_id, {_SQL_TOKS} AS t FROM documents) s) e),
a AS (SELECT h FROM g WHERE side = 0 ORDER BY h LIMIT {_KMV_K}),
b AS (SELECT h FROM g WHERE side = 1 ORDER BY h LIMIT {_KMV_K}),
u AS (SELECT DISTINCT h FROM (SELECT h FROM a UNION ALL SELECT h FROM b) x
      ORDER BY h LIMIT {_KMV_K}),
ea AS (SELECT CAST(count(*) - 1 AS DOUBLE) * 1152921504606846976.0
              / CAST(max(h) AS DOUBLE) AS est_a FROM a),
eb AS (SELECT CAST(count(*) - 1 AS DOUBLE) * 1152921504606846976.0
              / CAST(max(h) AS DOUBLE) AS est_b FROM b),
eu AS (SELECT CAST(count(*) AS BIGINT) AS k_u, max(h) AS hk_u,
              CAST(count(*) - 1 AS DOUBLE) * 1152921504606846976.0
              / CAST(max(h) AS DOUBLE) AS est_union FROM u),
com AS (SELECT CAST(count(*) AS BIGINT) AS n_common
        FROM u JOIN a USING (h) JOIN b USING (h))
SELECT k_u, hk_u, est_a, est_b, est_union, n_common,
       CAST(n_common AS DOUBLE) / CAST(k_u AS DOUBLE) AS jaccard,
       CAST(n_common AS DOUBLE) / CAST(k_u AS DOUBLE) * est_union
           AS est_intersect
FROM eu, ea, eb, com
"""
