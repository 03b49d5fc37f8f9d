"""Corpus-construction operators over the `documents` table (round 5).

The second half of the LLM training-data toolkit, beyond dedup/quality
(textops/dedup/sampling): the ops that turn a filtered corpus into an
actual training set. No reference analog (skar serves log queries); the
surface follows what public corpus pipelines (C4 / Gopher / Dolma-style)
run at scale. Everything is pure Spark built-ins with a DuckDB oracle,
using the portable md5-60bit hash (textops.h60) where hashing is needed.

- **decontamination** (`q_decontam`): flag training documents that share
  any token 5-gram with a held-out evaluation set. Scale shape: the eval
  set is benchmark-sized (≪ corpus), so its distinct-gram table is
  BROADCAST; the corpus side is a single projection + explode + broadcast
  hash join + partial-agg count — no corpus-sized shuffle at all. The
  corpus grams are `array_distinct`-ed per document BEFORE the explode so
  the join input (and the hit count semantics: distinct grams shared) is
  bounded by document length, not n-gram multiplicity.
- **sequence packing** (`q_seq_pack`): assign every document its
  (sequence index, token offset) under GPT-style concat-then-split
  packing with a fixed token budget per sequence, deterministically
  ordered by doc_id within each `lang` partition. One window per
  stratum — the cumulative sum parallelizes across strata, which is how
  a 100 TB pack runs (per-shard packing; sequences never cross shards).
- **domain statistics** (`q_domain_stats`): per-source doc counts, token
  mass, mean length, language spread — the crawl-health dashboard query.
  Single map-side-combinable aggregate on a low-cardinality key.
- **repetition stats** (`q_rep_stats`): Gopher-style within-document
  repetition signals (duplicate-token fraction, duplicate-2-gram
  fraction) as a pure projection — array ops per row, no shuffle.
- **histogram quantile** (`q_hist_quantile`): corpus length quantiles
  from a fixed-width histogram — the deterministic (hence oracle-able)
  stand-in for a mergeable quantile sketch. The groupBy collapses the
  corpus to ≤ a few hundred bin rows; the window over bins is
  driver-trivial. At 100 TB the bin table is still tiny: this is the
  right shape (partial agg → reduce), unlike a global sort-percentile.
- **leakage-safe split** (`q_split_assign`): train/val/test assignment
  hashed at SOURCE granularity (every doc of a source lands in the same
  split — the standard guard against near-dup leakage across splits).
- **PII redaction** (`q_pii_redact`): count-then-mask emails / IPv4s /
  phone spans per document (the C4/Dolma pre-release scrub). Pure
  projection, three regex passes per row, zero exchanges; patterns are
  restricted to the Java-regex ∩ RE2 common subset so the DuckDB oracle
  redacts identically. The synthetic corpus has no PII, so the op
  deterministically plants one of each kind in 2/3 of the docs (both
  engines plant the same spans) — the redaction is exercised, not
  vacuous.
- **heavy hitters** (`q_heavy_hitters`): exact global top-20 tokens by
  frequency — explode + map-side-combinable count + TakeOrdered(20)
  (per-partition top-k, driver merges k rows; no global sort).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from skar_spark.ops.relational import load, _spread
from skar_spark.ops.textops import h60, sql_h60

# decontamination: eval membership + n-gram order. Real pipelines use
# 8-13-gram overlap; the synthetic corpus' docs are ~30-90 tokens from a
# small vocabulary, so trigrams give the same statistical shape (a few %
# of train docs flagged) at test scale.
_EVAL_MOD = 41          # doc_id % 41 == 0 → held-out eval doc
_DECON_N = 3            # token n-gram order
# sequence packing
_SEQ_BUDGET = 512       # tokens per packed training sequence
# histogram quantile
_HIST_BIN = 64          # n_chars bin width
_HIST_QS = (0.5, 0.9, 0.99)
# heavy hitters
_TOPK_TOKENS = 20
# line-level dedup: tokens per synthetic "line"
_LINE_TOKS = 8
# temperature sampling: hash-threshold denominator (2^20)
_TS_SCALE = 1 << 20
# vocabulary size (UNK id == _VOCAB_K); the synthetic corpus has a tiny
# vocabulary, so pick K below it to exercise the UNK path
_VOCAB_K = 24


def _toks(col="text"):
    return F.split(F.trim(F.col(col)), r"\s+")


_SQL_TOKS = r"regexp_split_to_array(trim(text), '\s+')"


def _n_tokens(col="text", toks=None):
    """0 for blank text (split('') yields [''] in both engines).
    Pass `toks` to count a pre-staged token column instead of
    re-splitting (single definition of the blank-text rule)."""
    return F.when(F.length(F.trim(F.col(col))) == 0, F.lit(0)) \
            .otherwise(F.size(toks if toks is not None else _toks(col)))


_SQL_N_TOKENS = (r"CASE WHEN length(trim(text)) = 0 THEN 0 "
                 r"ELSE array_length(regexp_split_to_array(trim(text), "
                 r"'\s+')) END")


def _ngrams(tokens, n: int):
    """Token n-grams joined by single spaces; empty array below n."""
    sz = F.size(tokens)
    return F.when(sz >= n, F.transform(
        F.sequence(F.lit(1), sz - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, n)))
    ).otherwise(F.array().cast("array<string>"))


# --- decontamination ----------------------------------------------------------

def _doc_grams(spark, sf):
    # stage the token array as a real column BEFORE the n-gram transform:
    # an unstaged _ngrams(_toks(), n) embeds the regex split inside the
    # HOF lambda, so Spark re-tokenizes the document once PER GRAM —
    # O(tokens²) per doc (the q_minhash staging lesson; measured 26 s →
    # 1.5 s for the gram pass at sf1.0). _spread: the gram explode is the
    # CPU-heavy stage and a bench-sized corpus arrives as 1-2 parquet
    # splits; at production scale the scan has ≥ cores splits and no
    # shuffle is added (see _spread).
    d = _spread(spark, load(spark, sf, "documents").select("doc_id", "text"))
    staged = d.select("doc_id", _toks().alias("_t"))
    return staged.select(
        "doc_id",
        F.explode(F.array_distinct(
            _ngrams(F.col("_t"), _DECON_N))).alias("gram"))


def q_decontam(spark, sf):
    """Training docs sharing ≥1 token _DECON_N-gram with the eval split
    (doc_id % _EVAL_MOD == 0), with the distinct-gram hit count."""
    g = _doc_grams(spark, sf)
    ev = (g.filter(F.col("doc_id") % _EVAL_MOD == 0)
           .select("gram").distinct())
    return (g.filter(F.col("doc_id") % _EVAL_MOD != 0)
            .join(F.broadcast(ev), "gram")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_hit_grams")))


SQL_DECONTAM = rf"""
WITH g AS (
  SELECT doc_id,
         unnest(list_distinct(
           [array_to_string(t[i:i+{_DECON_N - 1}], ' ')
            for i in range(1, len(t) - {_DECON_N - 2})])) AS gram
  FROM (SELECT doc_id, {_SQL_TOKS} AS t FROM documents) s
),
ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % {_EVAL_MOD} = 0)
SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_hit_grams
FROM g JOIN ev USING (gram)
WHERE g.doc_id % {_EVAL_MOD} <> 0
GROUP BY g.doc_id
"""

# --- sequence packing ---------------------------------------------------------

# doc_id range per prefix-sum bucket: floor(doc_id / B) is monotone in
# doc_id, so ordering by doc_id within a lang == ordering by (bucket,
# doc_id) — the invariant the two-phase cumulative sum relies on. At
# bench scale a lang spans a handful of buckets; at 10^12 docs no
# single window task ever sees more than B rows of the dominant lang.
_PACK_BUCKET = 65_536


def q_seq_pack(spark, sf):
    """(seq_index, tok_offset) per document under concat-then-split
    packing at _SEQ_BUDGET tokens, packed per `lang` in doc_id order.

    Two-phase prefix sum (VERDICT r05 #5 — a single per-`lang`
    unbounded-preceding window puts the whole dominant-language corpus
    through ONE task at 100×): (1) a partition-local cumulative sum per
    (lang, doc_id-range bucket) — the corpus-sized window key now
    spreads the hot lang across tasks; (2) per-bucket token subtotals
    cascade into bucket offsets with a window over the (lang, bucket)
    subtotal table — n/B rows, 4-5 orders of magnitude smaller; (3) a
    join re-attaches the offsets (AQE broadcasts the runtime-tiny
    subtotal side; unhinted so a multi-TB run may keep it a shuffle
    join on the partitioning the window already established).
    Integer addition is associative, so cum_before is bit-identical to
    the single-window formulation."""
    d = load(spark, sf, "documents")
    b = F.floor(F.col("doc_id") / F.lit(_PACK_BUCKET)).alias("_b")
    t = d.select("doc_id", "lang", _n_tokens().alias("n_tokens"), b)
    wl = (Window.partitionBy("lang", "_b").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1))
    local = F.coalesce(F.sum("n_tokens").over(wl), F.lit(0)).cast("long")
    cumed = t.withColumn("_local", local)
    # bucket totals DERIVED from the windowed result (one scan, the
    # window's exchange reused): _local + n_tokens is nondecreasing in
    # doc_id within a bucket (n_tokens ≥ 0), so its max == the last
    # row's running total == the bucket's token sum
    sub = cumed.groupBy("lang", "_b").agg(
        F.max(F.col("_local") + F.col("n_tokens")).cast("long")
        .alias("_bt"))
    wo = (Window.partitionBy("lang").orderBy("_b")
          .rowsBetween(Window.unboundedPreceding, -1))
    off = (sub.select(
        "lang", "_b",
        F.coalesce(F.sum("_bt").over(wo), F.lit(0)).cast("long")
        .alias("_off"))
        .withColumnsRenamed({"lang": "_olang", "_b": "_ob"}))
    # null-SAFE attach: a NULL lang is a real stratum to the window
    # formulation (and the DuckDB oracle) — a null-unsafe equi-join
    # would silently drop its rows
    out = (cumed.join(off, F.col("lang").eqNullSafe(F.col("_olang"))
                      & (F.col("_b") == F.col("_ob")))
           .withColumn("cum_before", F.col("_off") + F.col("_local")))
    return out.select(
        "doc_id", "lang", "n_tokens",
        F.floor(F.col("cum_before") / F.lit(_SEQ_BUDGET)).alias("seq_index"),
        (F.col("cum_before") % _SEQ_BUDGET).alias("tok_offset"))


SQL_SEQ_PACK = f"""
SELECT doc_id, lang, n_tokens,
       CAST(floor(cum_before / {_SEQ_BUDGET}) AS BIGINT) AS seq_index,
       cum_before % {_SEQ_BUDGET} AS tok_offset
FROM (
  SELECT doc_id, lang, {_SQL_N_TOKENS} AS n_tokens,
         CAST(coalesce(sum({_SQL_N_TOKENS}) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_before
  FROM documents) t
"""

# --- per-domain statistics ----------------------------------------------------

def q_domain_stats(spark, sf):
    d = load(spark, sf, "documents")
    return (d.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(_n_tokens()).cast("long").alias("total_tokens"),
                 (F.sum("n_chars").cast("double")
                  / F.count("*")).alias("avg_chars"),
                 F.countDistinct("lang").alias("n_langs")))


SQL_DOMAIN_STATS = f"""
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum({_SQL_N_TOKENS}) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
FROM documents GROUP BY source
"""

# --- within-document repetition stats (Gopher-style) --------------------------

def q_rep_stats(spark, sf):
    # stage tokens and 2-grams as real columns (projections, no
    # exchange): every aggregate below references them several times,
    # and an unstaged HOF expression re-tokenizes per reference
    d = load(spark, sf, "documents")
    s1 = d.select("doc_id", "text", _toks().alias("_t"))
    s2 = s1.select("doc_id", "text", "_t",
                   _ngrams(F.col("_t"), 2).alias("_g2"))
    toks = F.col("_t")
    n = _n_tokens(toks=toks)  # blank rule shared, staged column counted
    nd = F.when(n == 0, F.lit(0)) \
          .otherwise(F.size(F.array_distinct(toks)))
    g2 = F.col("_g2")
    n2 = F.size(g2)
    nd2 = F.size(F.array_distinct(g2))
    frac = lambda tot, dis: F.when(
        tot > 0, (tot - dis).cast("double") / tot).otherwise(F.lit(0.0))
    return s2.select(
        "doc_id", n.alias("n_tokens"), nd.alias("n_distinct_tokens"),
        frac(n, nd).alias("dup_token_frac"),
        n2.alias("n_2grams"), nd2.alias("n_distinct_2grams"),
        frac(n2, nd2).alias("dup_2gram_frac"))


SQL_REP_STATS = rf"""
SELECT doc_id, n_tokens,
       CASE WHEN n_tokens = 0 THEN 0 ELSE len(list_distinct(t)) END
           AS n_distinct_tokens,
       CASE WHEN n_tokens > 0 THEN
         CAST(n_tokens - (CASE WHEN n_tokens = 0 THEN 0
                          ELSE len(list_distinct(t)) END) AS DOUBLE)
         / n_tokens ELSE 0.0 END AS dup_token_frac,
       len(g2) AS n_2grams, len(list_distinct(g2)) AS n_distinct_2grams,
       CASE WHEN len(g2) > 0 THEN
         CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2)
       ELSE 0.0 END AS dup_2gram_frac
FROM (
  SELECT doc_id, {_SQL_N_TOKENS} AS n_tokens, t,
         [array_to_string(t[i:i+1], ' ') for i in range(1, len(t))] AS g2
  FROM (SELECT doc_id, text, {_SQL_TOKS} AS t FROM documents) s) u
"""

# --- histogram-based quantiles ------------------------------------------------

def q_hist_quantile(spark, sf):
    """Length quantiles from a fixed-width histogram of n_chars.

    The only corpus-sized stage is the bin groupBy (map-side combine →
    ≤ a few hundred rows); the windows below it run over the tiny bin
    table, so the single-partition window frame is deliberate."""
    d = load(spark, sf, "documents")
    bins = (d.groupBy(F.floor(F.col("n_chars") / F.lit(_HIST_BIN))
                      .alias("bin"))
            .agg(F.count("*").alias("cnt")))
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    c = bins.select(
        "bin",
        F.sum("cnt").over(wc).cast("long").alias("cum"),
        F.sum("cnt").over(wt).cast("long").alias("tot"))
    qs = spark.createDataFrame([(q,) for q in _HIST_QS], "q double")
    return (qs.join(c, c["cum"] >= F.ceil(qs["q"] * c["tot"]))
            .groupBy("q").agg(F.min("bin").alias("bin"))
            .select("q", "bin",
                    (F.col("bin") * _HIST_BIN).alias("bin_lo")))


SQL_HIST_QUANTILE = f"""
WITH bins AS (
  SELECT CAST(floor(n_chars / {_HIST_BIN}) AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS cnt
  FROM documents GROUP BY 1),
c AS (
  SELECT bin,
         CAST(sum(cnt) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(sum(cnt) OVER () AS BIGINT) AS tot
  FROM bins),
qs AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES (0.5), (0.9), (0.99)) v(q))
SELECT q, min(bin) AS bin, min(bin) * {_HIST_BIN} AS bin_lo
FROM qs JOIN c ON c.cum >= ceil(q * c.tot)
GROUP BY q
"""

# --- leakage-safe train/val/test split ----------------------------------------

def q_split_assign(spark, sf):
    """Split assignment hashed at source granularity: bucket 0-7 train,
    8 val, 9 test — no source (hence no near-dup family) crosses
    splits."""
    d = load(spark, sf, "documents")
    agg = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    b = F.pmod(h60(F.concat(F.lit("split#"), F.col("source"))), F.lit(10))
    split = (F.when(b < 8, "train").when(b == 8, "val").otherwise("test"))
    return agg.select("source", b.alias("bucket"), split.alias("split"),
                      "n_docs")


SQL_SPLIT_ASSIGN = f"""
SELECT source,
       {sql_h60("concat('split#', source)")} % 10 AS bucket,
       CASE WHEN {sql_h60("concat('split#', source)")} % 10 < 8 THEN 'train'
            WHEN {sql_h60("concat('split#', source)")} % 10 = 8 THEN 'val'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY source
"""

# --- corpus-wide line-level exact dedup (CCNet / RefinedWeb shape) -----------

def q_line_dedup(spark, sf):
    """Corpus-wide line-level exact dedup with in-order reassembly.

    CCNet / RefinedWeb drop every repeated LINE across the whole corpus,
    keeping only its first occurrence, then stitch each document back
    together from its surviving lines. The synthetic corpus has no
    newlines, so "lines" here are consecutive `_LINE_TOKS`-token chunks —
    a synthetic delimiter; the distributed shape is the real one:
    chunk → posexplode → ONE shuffle on the line text (first-occurrence
    window) → re-aggregate in original order. Docs whose every line is a
    duplicate drop out (their text is fully boilerplate).

    At 100 TB: the only corpus-sized exchange is the line shuffle, the
    same cost class as exact doc dedup; the reassembly groupBy reuses
    the doc_id clustering and the per-doc state is bounded by document
    length. First-occurrence selection is a map-side-combinable
    `min(struct(doc_id, pos))` per line — NOT a row_number window over
    the line text, which would funnel every occurrence of a
    billion-copy boilerplate line into one sort task (VERDICT r05 #4):
    the partial min collapses each map partition's occurrences of a hot
    line to ONE row before the exchange, so the hot key's reduce input
    is bounded by #map tasks, not #occurrences.
    """
    d = _spread(spark, load(spark, sf, "documents").select("doc_id", "text"))
    # stage tokens: an unstaged transform re-tokenizes per line chunk
    staged = d.select("doc_id", _toks().alias("_t"))
    toks = F.col("_t")
    nlines = F.ceil(F.size(toks) / F.lit(_LINE_TOKS)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), nlines - 1),
        lambda i: F.struct(
            i.alias("pos"),
            F.concat_ws(" ", F.slice(toks, i * _LINE_TOKS + 1, _LINE_TOKS))
             .alias("line")))
    e = (staged.select("doc_id", F.explode(lines).alias("u"))
         .select("doc_id", F.col("u.pos").alias("pos"),
                 F.col("u.line").alias("line")))
    # first occurrence = min (doc_id, pos) per line, lexicographic struct
    # min == the old window's ORDER BY doc_id, pos rank-1 row
    kept = (e.groupBy("line")
            .agg(F.min(F.struct("doc_id", "pos")).alias("m"))
            .select(F.col("m.doc_id").alias("doc_id"),
                    F.col("m.pos").alias("pos"), "line"))
    return (kept.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_kept"),
                 F.md5(F.array_join(F.transform(
                     F.array_sort(F.collect_list(F.struct("pos", "line"))),
                     lambda s: s["line"]), " ")).alias("kept_md5")))


SQL_LINE_DEDUP = rf"""
WITH s AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
e0 AS (
  SELECT doc_id,
         unnest([{{'pos': i, 'line': array_to_string(
                     t[i*{_LINE_TOKS}+1:i*{_LINE_TOKS}+{_LINE_TOKS}], ' ')}}
                 for i in range(0, CAST(ceil(len(t)/{_LINE_TOKS}.0)
                                        AS BIGINT))]) AS u
  FROM s),
e AS (SELECT doc_id, u.pos AS pos, u.line AS line FROM e0),
k AS (
  SELECT doc_id, pos, line,
         row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
  FROM e)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       md5(string_agg(line, ' ' ORDER BY pos)) AS kept_md5
FROM k WHERE rn = 1 GROUP BY doc_id
"""

# --- temperature (mixture) resampling across languages ------------------------

def q_temp_sample(spark, sf):
    """Temperature resampling of the language mixture (alpha = 0.5).

    Multilingual pipelines rebalance head languages by sampling stratum
    s down to ∝ n_s^alpha; anchoring the smallest stratum at keep-rate 1
    gives rate_s = sqrt(n_min / n_s) for alpha = 0.5. The keep decision
    is a deterministic per-doc hash threshold (floor(rate * 2^20) — the
    division, sqrt, and power-of-two scaling are all exactly reproduced
    by any IEEE engine, so the oracle matches bit-for-bit).

    Scale shape: the rate table is one tiny agg (≤ #langs rows),
    broadcast back onto the corpus; the filter is a projection. No
    corpus-sized shuffle beyond the count agg's map-side combine.
    """
    d = load(spark, sf, "documents")
    agg = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    wall = Window.partitionBy()
    rates = agg.select(
        "lang", "n_docs",
        F.floor(F.sqrt(F.min("n_docs").over(wall) / F.col("n_docs"))
                * F.lit(_TS_SCALE)).cast("long").alias("keep_thresh"))
    keep = (d.join(F.broadcast(rates), "lang")
            .filter(F.pmod(h60(F.concat(F.lit("ts#"),
                                        F.col("doc_id").cast("string"))),
                           F.lit(_TS_SCALE)) < F.col("keep_thresh")))
    return (keep.groupBy("lang")
            .agg(F.min("n_docs").cast("long").alias("n_docs"),
                 F.count("*").cast("long").alias("n_kept"),
                 F.min("keep_thresh").alias("keep_thresh")))


SQL_TEMP_SAMPLE = f"""
WITH agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY lang),
r AS (
  SELECT lang, n_docs,
         CAST(floor(sqrt(CAST(min(n_docs) OVER () AS DOUBLE) / n_docs)
                    * {_TS_SCALE}) AS BIGINT) AS keep_thresh
  FROM agg)
SELECT d.lang, min(r.n_docs) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_kept,
       min(r.keep_thresh) AS keep_thresh
FROM documents d JOIN r USING (lang)
WHERE {sql_h60("concat('ts#', doc_id)")} % {_TS_SCALE} < r.keep_thresh
GROUP BY d.lang
"""

# --- vocabulary build + tokenizer apply ---------------------------------------

def q_vocab_encode(spark, sf):
    """Frequency-ranked top-`_VOCAB_K` vocabulary, then every document
    re-encoded as its id sequence (out-of-vocab → UNK id = `_VOCAB_K`),
    emitted as (doc_id, n_tokens, n_unk, md5 of the comma-joined ids in
    position order) — the tokenizer-vocab construction + apply step of
    a training pipeline, minus the BPE merge loop.

    Scale shape: the vocab is ONE map-side-combinable count agg
    truncated to K rows and broadcast; the corpus side is posexplode →
    broadcast hash join → per-doc re-aggregation (same doc_id clustering
    the explode came from). No corpus-sized join shuffle; the global
    rank window runs over the tiny count table only. Docs whose text is
    blank have no tokens and drop out (both engines).
    """
    d = _spread(spark, load(spark, sf, "documents").select("doc_id", "text"))
    tok = (d.select("doc_id", F.posexplode(_toks()).alias("pos", "token"))
           .filter(F.col("token") != ""))
    cnt = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    vocab = (cnt.select("token",
                        (F.row_number().over(w) - 1).alias("id"))
             .filter(F.col("id") < _VOCAB_K))
    ids = (tok.join(F.broadcast(vocab), "token", "left")
           .select("doc_id", "pos",
                   F.coalesce(F.col("id"), F.lit(_VOCAB_K)).alias("id")))
    return (ids.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_tokens"),
                 F.sum((F.col("id") == _VOCAB_K).cast("long"))
                  .cast("long").alias("n_unk"),
                 F.md5(F.array_join(F.transform(
                     F.array_sort(F.collect_list(F.struct(
                         "pos", F.col("id").cast("string").alias("s")))),
                     lambda x: x["s"]), ",")).alias("ids_md5")))


SQL_VOCAB_ENCODE = rf"""
WITH tok AS (
  SELECT doc_id, u.pos AS pos, u.token AS token
  FROM (
    SELECT doc_id,
           unnest([{{'pos': i - 1, 'token': t[i]}}
                   for i in range(1, len(t) + 1)]) AS u
    FROM (SELECT doc_id, {_SQL_TOKS} AS t FROM documents) s) e
  WHERE u.token <> ''),
v AS (
  SELECT token, row_number() OVER (ORDER BY cnt DESC, token ASC) - 1 AS id
  FROM (SELECT token, count(*) AS cnt FROM tok GROUP BY token)
  QUALIFY id < {_VOCAB_K})
SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_unk,
       md5(string_agg(CAST(coalesce(v.id, {_VOCAB_K}) AS VARCHAR), ','
                      ORDER BY t.pos)) AS ids_md5
FROM tok t LEFT JOIN v USING (token)
GROUP BY t.doc_id
"""

# --- exact heavy hitters ------------------------------------------------------

def q_heavy_hitters(spark, sf):
    """Exact global top-_TOPK_TOKENS tokens; ties broken by token text
    so the result is a deterministic set."""
    # no _spread: the explode+partial-count kernel is cheap relative to
    # the shuffle a repartition would add (measured 0.74 s direct vs
    # 1.4 s spread at sf1.0 — the doc_fingerprint lesson)
    d = load(spark, sf, "documents").select("text")
    t = (d.select(F.explode(_toks()).alias("token"))
         .filter(F.col("token") != "")
         .groupBy("token").agg(F.count("*").alias("cnt")))
    return t.orderBy(F.desc("cnt"), F.asc("token")).limit(_TOPK_TOKENS)


SQL_HEAVY_HITTERS = rf"""
SELECT token, CAST(count(*) AS BIGINT) AS cnt
FROM (SELECT unnest({_SQL_TOKS}) AS token FROM documents) t
WHERE token <> ''
GROUP BY token
ORDER BY cnt DESC, token ASC
LIMIT {_TOPK_TOKENS}
"""

# --- PII redaction -------------------------------------------------------------

# Conservative ASCII patterns chosen to parse identically under Java
# regex (Spark) and RE2 (DuckDB): character classes, bounded repeats,
# \b and \d only — no backrefs/lookaround (RE2 has neither).
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\+1-555-\d{4}"


def _pii_planted(col="text"):
    """Deterministically plant one email + phone + IPv4 into 2/3 of the
    docs (doc_id % 3 != 2) so the redaction is exercised on every run —
    the synthetic corpus itself contains no PII-shaped spans. The SAME
    expression is mirrored in the oracle, so both engines redact
    identical inputs."""
    did = F.col("doc_id")
    s = lambda e: e.cast("string")
    return F.when(
        F.pmod(did, F.lit(3)) != 2,
        F.concat(
            F.col(col), F.lit(" contact u"), s(did),
            F.lit("@ex"), s(F.pmod(did, F.lit(7))), F.lit(".com tel +1-555-"),
            F.lpad(s(F.pmod(did, F.lit(10000))), 4, "0"),
            F.lit(" ip 10."), s(F.pmod(did, F.lit(256))),
            F.lit("."), s(F.pmod(did * 7, F.lit(256))), F.lit(".9"))
    ).otherwise(F.col(col))


def q_pii_redact(spark, sf):
    """PII scrub (C4/Dolma-style pre-release step): count then mask
    emails, IPv4s and NANP-style phone spans per document. Pure
    projection — three `regexp_replace` passes per row, zero exchanges
    beyond the bench-only _spread (six regex passes per row are the
    textbook CPU-bound kernel: a 1-2-split bench corpus would otherwise
    run them on 1-2 cores; at 100 TB the scan yields ≥ cores splits and
    _spread adds nothing, so the op stays a pure map stage). Counts are
    taken BEFORE masking; masking order (email → ip → phone) is part of
    the op's contract since masks could otherwise create/destroy later
    matches."""
    d = _spread(spark, load(spark, sf, "documents").select("doc_id", "text"))
    planted = _pii_planted()
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(planted, F.lit(_PII_EMAIL), F.lit("<EMAIL>")),
            F.lit(_PII_IPV4), F.lit("<IP>")),
        F.lit(_PII_PHONE), F.lit("<PHONE>"))
    return d.select(
        "doc_id",
        F.regexp_count(planted, F.lit(_PII_EMAIL)).cast("long")
         .alias("n_emails"),
        F.regexp_count(planted, F.lit(_PII_IPV4)).cast("long")
         .alias("n_ips"),
        F.regexp_count(planted, F.lit(_PII_PHONE)).cast("long")
         .alias("n_phones"),
        F.md5(red).alias("red_md5"))


_SQL_PII_PLANTED = """
CASE WHEN doc_id % 3 <> 2 THEN
  text || ' contact u' || CAST(doc_id AS VARCHAR)
       || '@ex' || CAST(doc_id % 7 AS VARCHAR) || '.com tel +1-555-'
       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR)
       || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) || '.9'
ELSE text END
"""

SQL_PII_REDACT = rf"""
SELECT doc_id,
       CAST(len(regexp_extract_all(planted, '{_PII_EMAIL}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(planted, '{_PII_IPV4}')) AS BIGINT)
         AS n_ips,
       CAST(len(regexp_extract_all(planted, '{_PII_PHONE}')) AS BIGINT)
         AS n_phones,
       md5(regexp_replace(
             regexp_replace(
               regexp_replace(planted, '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_IPV4}', '<IP>', 'g'),
             '{_PII_PHONE}', '<PHONE>', 'g')) AS red_md5
FROM (SELECT doc_id, {_SQL_PII_PLANTED} AS planted FROM documents) p
"""
