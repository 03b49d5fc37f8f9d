"""Corpus-construction ops (ops/corpus.py): plan-shape assertions plus
semantic invariants the oracle hash can't see on synthetic data.

Correctness vs DuckDB is covered by the parametrized
test_queries_oracle.py; here we pin the SCALE-relevant plan shapes:

- decontam: the eval-gram side broadcasts (no corpus-sized shuffle join);
- rep_stats: pure projection — zero exchanges;
- heavy_hitters: partial (map-side) aggregate + TakeOrdered, no global
  Sort node;
- seq_pack: exactly one exchange (the per-lang window partitioning);
- split_assign: every source maps to exactly one split, and packing
  never skips sequence slots.
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from skar_spark.ops import corpus

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_decontam_broadcasts_eval_grams(spark):
    plan = _plan(corpus.q_decontam(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_rep_stats_no_exchange(spark):
    plan = _plan(corpus.q_rep_stats(spark, SF))
    assert "Exchange" not in plan


def test_heavy_hitters_takeordered(spark):
    plan = _plan(corpus.q_heavy_hitters(spark, SF))
    assert "TakeOrderedAndProject" in plan
    # the count must partial-aggregate before its shuffle
    assert "partial_count" in plan


def test_seq_pack_two_phase_prefix_sum(spark):
    """r6 skew fix: the corpus-sized window must partition by (lang,
    doc_id-range bucket), never by lang alone — the hot language then
    spreads across tasks; the per-lang cascade runs over the tiny
    subtotal table only. ≤3 exchanges: corpus hash(lang, _b), subtotal
    agg, tiny cascade window (+ a broadcast for the offset join)."""
    plan = _plan(corpus.q_seq_pack(spark, SF))
    # formatted explain names each node twice (tree + detail); count the
    # detail headers, which ReusedExchange does not match
    assert plan.count(") Exchange") <= 3
    assert "Window" in plan
    # the corpus exchange key includes the bucket column next to lang
    import re
    corpus_keys = re.findall(r"hashpartitioning\(lang#\d+, (\w+)#", plan)
    assert "_b" in corpus_keys, corpus_keys


def test_split_assign_is_leakage_safe(spark):
    rows = corpus.q_split_assign(spark, SF).collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r["source"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_source.values())
    assert {r["split"] for r in rows} <= {"train", "val", "test"}


def test_seq_pack_offsets_are_contiguous(spark):
    """Concat semantics: within each lang, cum token position advances
    by exactly n_tokens per doc and seq_index*budget + tok_offset
    reconstructs it."""
    rows = corpus.q_seq_pack(spark, SF).collect()
    per_lang = {}
    for r in sorted(rows, key=lambda r: (r["lang"], r["doc_id"])):
        pos = per_lang.get(r["lang"], 0)
        assert r["seq_index"] * corpus._SEQ_BUDGET + r["tok_offset"] == pos
        per_lang[r["lang"]] = pos + r["n_tokens"]


def test_decontam_excludes_eval_docs(spark):
    rows = corpus.q_decontam(spark, SF).collect()
    assert rows, "expected some contamination on the synthetic corpus"
    assert all(r["doc_id"] % corpus._EVAL_MOD != 0 for r in rows)
    assert all(r["n_hit_grams"] >= 1 for r in rows)


def test_line_dedup_keeps_exactly_distinct_lines(spark):
    """Total kept lines across the corpus == number of distinct line
    texts (first-occurrence-wins keeps exactly one copy of each)."""
    res = corpus.q_line_dedup(spark, SF)
    total_kept = res.agg(F.sum("n_kept")).collect()[0][0]
    d = spark.read.parquet(f"{SF}/documents.parquet")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n = corpus._LINE_TOKS
    nlines = F.ceil(F.size(toks) / F.lit(n)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), nlines - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * n + 1, n)))
    n_distinct = (d.select(F.explode(lines).alias("line"))
                  .select("line").distinct().count())
    assert total_kept == n_distinct
    # and dedup actually fired on the synthetic corpus
    n_total = d.select(F.explode(lines).alias("line")).count()
    assert total_kept < n_total


def test_line_dedup_groupby_min_no_line_window(spark):
    """r6 skew fix: first-occurrence selection must be a map-side-
    combinable partial_min per line, never a row_number window
    partitioned by the line text (a billion-occurrence boilerplate line
    would be ONE window partition). ≤3 exchanges: the bench-only
    _spread round-robin, the line groupBy, the doc_id reassembly."""
    plan = _plan(corpus.q_line_dedup(spark, SF))
    assert plan.count(") Exchange") <= 3
    assert "Cartesian" not in plan
    assert "partial_min" in plan          # map-side combine on the line key
    assert "Window" not in plan           # no single-key sort window


def test_temp_sample_rebalances_head_language(spark):
    rows = {r["lang"]: r for r in corpus.q_temp_sample(spark, SF).collect()}
    n_min = min(r["n_docs"] for r in rows.values())
    for r in rows.values():
        assert r["n_kept"] <= r["n_docs"]
        if r["n_docs"] == n_min:
            # smallest stratum anchored at keep-rate 1
            assert r["keep_thresh"] == corpus._TS_SCALE
            assert r["n_kept"] == r["n_docs"]
        else:
            assert r["keep_thresh"] < corpus._TS_SCALE
    # the head language is actually downsampled on the skewed corpus
    head = max(rows.values(), key=lambda r: r["n_docs"])
    assert head["n_kept"] < head["n_docs"]


def test_temp_sample_broadcasts_rate_table(spark):
    plan = _plan(corpus.q_temp_sample(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_vocab_encode_broadcast_and_unk(spark):
    plan = _plan(corpus.q_vocab_encode(spark, SF))
    # the corpus-side token→id join must broadcast the K-row vocab
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    rows = corpus.q_vocab_encode(spark, SF).collect()
    assert rows
    # K below the corpus vocabulary → the UNK path actually fires
    assert any(r["n_unk"] > 0 for r in rows)
    assert all(0 <= r["n_unk"] <= r["n_tokens"] for r in rows)


def test_pii_redact_masks_everything_no_exchange(spark):
    df = corpus.q_pii_redact(spark, SF)
    # pure projection up to the bench-only _spread: the only permitted
    # exchange is its round-robin repartition (absent at production
    # split counts); no hash/range exchange anywhere
    plan = _plan(df)
    assert plan.count(") Exchange") <= 1
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan
    # planted docs (doc_id % 3 != 2) carry exactly one of each PII kind;
    # the rest carry none
    rows = df.collect()
    for r in rows:
        want = 1 if r.doc_id % 3 != 2 else 0
        assert (r.n_emails, r.n_ips, r.n_phones) == (want,) * 3, r
    # nothing PII-shaped survives masking
    from skar_spark.ops.corpus import (_PII_EMAIL, _PII_IPV4, _PII_PHONE,
                                       _pii_planted)
    red = corpus.load(spark, SF, "documents").select(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(_pii_planted(), F.lit(_PII_EMAIL),
                                 F.lit("<EMAIL>")),
                F.lit(_PII_IPV4), F.lit("<IP>")),
            F.lit(_PII_PHONE), F.lit("<PHONE>")).alias("red"))
    leftover = red.select(
        (F.regexp_count("red", F.lit(_PII_EMAIL))
         + F.regexp_count("red", F.lit(_PII_IPV4))
         + F.regexp_count("red", F.lit(_PII_PHONE))).alias("n"))
    assert leftover.agg(F.sum("n")).collect()[0][0] == 0
