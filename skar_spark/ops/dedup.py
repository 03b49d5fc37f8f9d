"""Near-duplicate detection + similarity search (training-data pipeline ops).

All hashing uses the portable md5-60bit scheme (see textops.h60) so every
stage is reproducible in the DuckDB oracle. Spark side is built-in
higher-order functions (transform/aggregate/zip_with) — JVM-side, no
Python in the hot path.

Scale notes (10^12-doc story): minhash/simhash signatures are embarrassed
parallel projections; the LSH candidate join is an equi-join on band keys
(shuffle on band hash — bounded by band-bucket sizes, not O(n²));
brute-force cosine is quadratic and exists as the correctness baseline
for the LSH-bucketed variant.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from skar_spark.ops.relational import load
from skar_spark.ops.textops import h60, sql_h60, _tokens

# --- minhash signatures over 3-word shingles ---------------------------------

_N_HASHES = 4


def _shingles(tokens):
    n = F.size(tokens)
    return F.when(n >= 3, F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: F.concat_ws(" ", F.element_at(tokens, i),
                              F.element_at(tokens, i + 1),
                              F.element_at(tokens, i + 2)))
    ).otherwise(F.array().cast("array<string>"))


def _minhash_col(shingles, j: int):
    return F.array_min(F.transform(
        shingles, lambda s: h60(F.concat(s, F.lit(f"#{j}")))))


def q_minhash(spark, sf):
    d = load(spark, sf, "documents")
    # stage the arrays as real columns: referencing a nested HOF
    # expression from several minhash columns re-evaluates the whole
    # tokenize+shingle tree per element (measured 28s → <2s at sf0.1)
    staged = (d.select("doc_id", _tokens(F.col("text")).alias("_toks"))
              .select("doc_id", _shingles(F.col("_toks")).alias("_sh")))
    cols = [_minhash_col(F.col("_sh"), j).alias(f"mh{j}")
            for j in range(_N_HASHES)]
    return staged.select("doc_id", *cols)


def _sql_shingles() -> str:
    return (r"list_transform(range(1, greatest(array_length("
            r"regexp_split_to_array(trim(text), '\s+')) - 1, 1)), "
            r"i -> concat_ws(' ', "
            r"regexp_split_to_array(trim(text), '\s+')[i], "
            r"regexp_split_to_array(trim(text), '\s+')[i+1], "
            r"regexp_split_to_array(trim(text), '\s+')[i+2]))")


def _sql_minhash(j: int) -> str:
    salted = "s || '#%d'" % j
    return (f"list_min(list_transform({_sql_shingles()}, "
            f"s -> {sql_h60(salted)}))")


SQL_MINHASH = f"""
SELECT doc_id,
       {', '.join(f'{_sql_minhash(j)} AS mh{j}' for j in range(_N_HASHES))}
FROM documents
"""

# --- LSH candidate pairs (banded minhash → equi-join on band key) -------------

def q_lsh_pairs(spark, sf):
    sig = q_minhash(spark, sf)
    # cache: the banded signatures feed 4 self-join branches (2 bands × 2
    # sides); without it Spark recomputes the minhash transform per branch
    banded = sig.select(
        "doc_id",
        F.concat_ws(":", F.col("mh0").cast("string"),
                    F.col("mh1").cast("string")).alias("band0"),
        F.concat_ws(":", F.col("mh2").cast("string"),
                    F.col("mh3").cast("string")).alias("band1")).cache()
    pairs = None
    for b in ("band0", "band1"):
        l = banded.select(F.col("doc_id").alias("a"), F.col(b).alias("k"))
        r = banded.select(F.col("doc_id").alias("b_"), F.col(b).alias("k"))
        p = (l.join(r, "k").filter(F.col("a") < F.col("b_"))
             .select("a", F.col("b_").alias("b")))
        pairs = p if pairs is None else pairs.unionAll(p)
    return pairs.distinct()


def _sql_band_cte() -> str:
    mh = [f"{_sql_minhash(j)} AS mh{j}" for j in range(_N_HASHES)]
    return f"""
WITH sig AS (SELECT doc_id, {', '.join(mh)} FROM documents),
banded AS (SELECT doc_id,
                  concat(CAST(mh0 AS VARCHAR), ':', CAST(mh1 AS VARCHAR)) AS band0,
                  concat(CAST(mh2 AS VARCHAR), ':', CAST(mh3 AS VARCHAR)) AS band1
           FROM sig)
"""


SQL_LSH_PAIRS = _sql_band_cte() + """
SELECT DISTINCT a, b FROM (
  SELECT l.doc_id AS a, r.doc_id AS b FROM banded l JOIN banded r
    ON l.band0 = r.band0 AND l.doc_id < r.doc_id
  UNION ALL
  SELECT l.doc_id AS a, r.doc_id AS b FROM banded l JOIN banded r
    ON l.band1 = r.band1 AND l.doc_id < r.doc_id) t
"""

# --- simhash (64→16-bit projection of token hash signs) -----------------------

_SIM_BITS = 16


def q_simhash(spark, sf):
    d = load(spark, sf, "documents")
    toks = F.array_distinct(_tokens(F.col("text")))
    th = F.transform(toks, lambda t: h60(t))

    def bit_sum(b: int):
        return F.aggregate(
            th, F.lit(0),
            lambda acc, h: acc + F.when(
                h.bitwiseAND(F.lit(1 << b)) > 0, 1).otherwise(-1))

    sim = None
    for b in range(_SIM_BITS):
        term = F.when(bit_sum(b) > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    empty = F.length(F.trim("text")) == 0
    return d.select("doc_id",
                    F.when(empty, F.lit(0)).otherwise(sim).alias("simhash"))


def _sql_simhash() -> str:
    th = (r"list_transform(list_distinct(regexp_split_to_array(trim(text), "
          r"'\s+')), t -> " + sql_h60("t") + ")")
    terms = []
    for b in range(_SIM_BITS):
        s = (f"CASE WHEN list_sum(list_transform({th}, "
             f"h -> CASE WHEN (h & {1 << b}) > 0 THEN 1 ELSE -1 END)) > 0 "
             f"THEN {1 << b} ELSE 0 END")
        terms.append(s)
    return " + ".join(terms)


SQL_SIMHASH = f"""
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE {_sql_simhash()} END AS simhash
FROM documents
"""

# --- n-gram jaccard pairs (char 4-grams, same-lang candidates) ----------------

def q_ngram_jaccard(spark, sf):
    d = load(spark, sf, "documents").select("doc_id", "lang", "text")
    grams = F.array_distinct(F.when(
        F.length("text") >= 4,
        F.transform(F.sequence(F.lit(1), F.length("text") - 3),
                    lambda i: F.col("text").substr(i, F.lit(4)))
    ).otherwise(F.array().cast("array<string>")))
    g = d.select("doc_id", "lang", grams.alias("grams"))
    a = g.select(F.col("doc_id").alias("a"), F.col("lang"),
                 F.col("grams").alias("ga"))
    b = g.select(F.col("doc_id").alias("b"), F.col("lang"),
                 F.col("grams").alias("gb"))
    pairs = (a.join(b, "lang").filter(F.col("a") < F.col("b"))
             .filter(F.abs(F.size("ga") - F.size("gb")) <= 5))
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size(F.array_union("ga", "gb"))
    jac = F.round(inter.cast("double") / union, 4)
    return (pairs.select("a", "b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= 0.35))


_SQL_GRAMS = ("list_distinct(CASE WHEN length(text) >= 4 THEN "
              "list_transform(range(1, length(text) - 2), "
              "i -> substr(text, i, 4)) ELSE [] END)")

SQL_NGRAM_JACCARD = f"""
WITH g AS (SELECT doc_id, lang, {_SQL_GRAMS} AS grams FROM documents)
SELECT a, b, jaccard FROM (
  SELECT l.doc_id AS a, r.doc_id AS b,
         round(CAST(array_length(list_intersect(l.grams, r.grams)) AS DOUBLE)
               / array_length(list_distinct(list_concat(l.grams, r.grams))), 4)
             AS jaccard
  FROM g l JOIN g r ON l.lang = r.lang AND l.doc_id < r.doc_id
  WHERE abs(array_length(l.grams) - array_length(r.grams)) <= 5) t
WHERE jaccard >= 0.35
"""

# --- embedding cosine top-k (brute force baseline) -----------------------------

_TOPK = 10
_N_QUERIES = 8


def q_cosine_topk(spark, sf):
    e = load(spark, sf, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = e.select("vec_id", dbl.alias("v"))
    q = (base.filter(F.col("vec_id") < _N_QUERIES)
         .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv")))
    dot = F.aggregate(F.zip_with("qv", "v", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    joined = (q.crossJoin(base).filter(F.col("qid") != F.col("vec_id"))
              .withColumn("cos", F.round(
                  dot / (norm(F.col("qv")) * norm(F.col("v"))), 4)))
    from pyspark.sql import Window
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(),
                                          F.col("vec_id").asc())
    return (joined.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _TOPK)
            .select("qid", "rk", "vec_id", "cos"))


SQL_COSINE_TOPK = f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
q AS (SELECT vec_id AS qid, v AS qv FROM base WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q.qid, b.vec_id,
         round(
           list_sum(list_transform(range(1, len(q.qv) + 1),
                                   i -> q.qv[i] * b.v[i]))
           / (sqrt(list_sum(list_transform(q.qv, x -> x * x)))
              * sqrt(list_sum(list_transform(b.v, x -> x * x)))), 4) AS cos
  FROM q CROSS JOIN base b WHERE q.qid != b.vec_id)
SELECT qid, rk, vec_id, cos FROM (
  SELECT qid, vec_id, cos,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos DESC, vec_id ASC) AS rk
  FROM scored) t
WHERE rk <= {_TOPK}
"""

# --- ANN via random-hyperplane LSH (the similarity-search scale path) ---------
#
# Brute-force cosine (q_cosine_topk) is the correctness baseline; at scale
# the cross join is quadratic. This variant buckets vectors by the sign
# pattern of K deterministic pseudo-random hyperplanes (SimHash-for-vectors)
# and only scores candidates sharing a bucket — the shuffle is an equi-join
# on the bucket key. Hyperplane components are ±1 derived from the portable
# md5-60bit hash so the DuckDB oracle reproduces them exactly.

_ANN_PLANES = 6
_DIM = 64
_ANN_MIN_COS = 0.2


def _plane_sign(k: int, i: int):
    # deterministic ±1 for hyperplane k, dimension i (portable)
    return F.when(
        F.conv(F.substring(F.md5(F.lit(f"plane-{k}-{i}")), 1, 15), 16, 10)
        .cast("long") % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))


def q_ann_lsh(spark, sf):
    from pyspark.sql import Window
    e = load(spark, sf, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = e.select("vec_id", dbl.alias("v"))

    bucket_bits = []
    for k in range(_ANN_PLANES):
        dot_k = None
        for i in range(_DIM):
            term = F.element_at("v", i + 1) * _plane_sign(k, i)
            dot_k = term if dot_k is None else dot_k + term
        bucket_bits.append(F.when(dot_k > 0, F.lit(1 << k)).otherwise(F.lit(0)))
    bucket = sum(bucket_bits[1:], bucket_bits[0]).alias("bucket")
    b = base.select("vec_id", "v", bucket)

    l = b.select(F.col("vec_id").alias("a"), F.col("v").alias("va"),
                 F.col("bucket"))
    r = b.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"),
                 F.col("bucket"))
    cand = l.join(r, "bucket").filter(F.col("a") < F.col("b"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    nrm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    out = cand.withColumn("cos", F.round(
        dot / (nrm(F.col("va")) * nrm(F.col("vb"))), 4))
    return (out.filter(F.col("cos") >= _ANN_MIN_COS)
            .select("bucket", "a", "b", "cos"))


def _sql_plane_sign(k: int, i: int) -> str:
    h = sql_h60(f"'plane-{k}-{i}'")
    return f"CASE WHEN {h} % 2 = 0 THEN 1.0 ELSE -1.0 END"


def _sql_ann() -> str:
    buckets = []
    for k in range(_ANN_PLANES):
        terms = " + ".join(f"v[{i + 1}] * {_sql_plane_sign(k, i)}"
                           for i in range(_DIM))
        buckets.append(f"CASE WHEN ({terms}) > 0 THEN {1 << k} ELSE 0 END")
    return " + ".join(buckets)


SQL_ANN_LSH = f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
bucketed AS (
  SELECT vec_id, v, {_sql_ann()} AS bucket FROM base)
SELECT l.bucket AS bucket, l.vec_id AS a, r.vec_id AS b,
       round(
         list_sum(list_transform(range(1, {_DIM} + 1),
                                 i -> l.v[i] * r.v[i]))
         / (sqrt(list_sum(list_transform(l.v, x -> x * x)))
            * sqrt(list_sum(list_transform(r.v, x -> x * x)))), 4) AS cos
FROM bucketed l JOIN bucketed r
  ON l.bucket = r.bucket AND l.vec_id < r.vec_id
WHERE round(
         list_sum(list_transform(range(1, {_DIM} + 1),
                                 i -> l.v[i] * r.v[i]))
         / (sqrt(list_sum(list_transform(l.v, x -> x * x)))
            * sqrt(list_sum(list_transform(r.v, x -> x * x)))), 4)
      >= {_ANN_MIN_COS}
"""
