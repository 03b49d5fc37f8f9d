"""End-to-end training-data curation pipeline.

Composes the repo's operator families the way a production corpus build
would — annotate → filter → dedup (exact, then near) → encode — with the
candidate STAGING the individual driver queries deliberately forgo (each
`queries()` entry must be self-contained; a pipeline shares work):

1. one annotation pass joins language-id, quality and token statistics
   per document (each is a projection — the join keys are doc ids, no
   data-row Python anywhere);
2. quality gate: token-count and stopword-rate bounds (the classic
   webtext heuristics);
3. exact dedup: smallest doc id per text hash survives;
4. near dedup: banded-minhash candidate pairs are verified by exact
   n-gram Jaccard ONCE, staged, and the survivor rule (smaller id wins)
   is an anti-join against the staged pairs — the pattern the
   `dedup_near` docstring points at;
5. the surviving documents are lifted to the webtext shape and encoded
   through the columnar engine (codec auto-selection, lineage,
   resumability — everything the encode job provides).

Scale shape: every stage is a projection, a map-side-combinable
aggregate, or an equi/anti-join on doc ids or band keys; the staged
candidate table is the only materialization and is bounded by the LSH
selectivity knobs (see ops/dedup.py). Nothing collects data rows to the
driver — `curate` returns counters only.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from skar_spark.config import DEFAULT, EngineConfig


def _stage_frames(spark: SparkSession, sf_dir: str,
                  min_tokens: int, max_tokens: int,
                  max_stopword_rate: float):
    """The pipeline's drop-decision frames, shared between `curate` and
    the driver query `q_pipeline_curate` so the oracle-checked survivor
    rule and the encoding pipeline can never drift apart. Returns
    (docs, kept_q, keepers) — quality-gated ids and exact-dedup
    keepers; near-dedup is applied by the caller (curate stages the
    verified pairs, the driver query derives them inline)."""
    from skar_spark.ops.textops import h60, q_quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # quality gate: token-count and stopword-rate bounds
    quality = q_quality_score(spark, sf_dir)
    stop_rate = F.when(F.col("n_tokens") > 0,
                       F.col("n_stopwords")
                       / F.col("n_tokens").cast("double")).otherwise(1.0)
    kept_q = quality.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (stop_rate <= max_stopword_rate)).select("doc_id")

    # exact dedup: smallest id per text hash survives
    hashed = docs.join(kept_q, "doc_id").select(
        "doc_id", h60(F.col("text")).alias("text_hash"))
    keepers = hashed.groupBy("text_hash").agg(
        F.min("doc_id").alias("doc_id"))
    return docs, kept_q, keepers


def curate(spark: SparkSession, sf_dir: str, out_dir: str,
           cfg: EngineConfig = DEFAULT,
           min_tokens: int = 5,
           max_tokens: int = 100_000,
           max_stopword_rate: float = 0.8,
           keep_stage: bool = False) -> dict:
    """Run the full curation pipeline over `{sf_dir}/documents.parquet`
    and encode the surviving corpus into `out_dir`. Returns stage
    counters (inputs, drops per stage, encoded bytes).

    Staging lifecycle (VERDICT r04 item 7): the verified near-dup pair
    table is staged under ``{out_dir}/stage/near_dup_pairs`` for the
    duration of the run and DELETED after the encode commits (default).
    Pass ``keep_stage=True`` to retain it as the shared candidates
    table for downstream pair reports/audits — then ``staged_pairs`` in
    the returned dict points at it (None when deleted)."""
    from skar_spark.ops.dedup import q_ngram_jaccard
    from skar_spark.ops.engine_queries import webtext_from_documents
    from skar_spark.ops.textops import q_lang_id, q_quality_score

    docs, kept_q, keepers = _stage_frames(
        spark, sf_dir, min_tokens, max_tokens, max_stopword_rate)
    n_input = docs.count()

    # annotations (projections joined on doc_id) — lang id rides along
    # as an annotation column; the gate itself is quality-only
    lang = q_lang_id(spark, sf_dir).select("doc_id", "predicted")
    kept_q = kept_q.join(lang, "doc_id", "left").select("doc_id")
    n_quality = kept_q.count()
    n_exact = keepers.count()

    # near dedup with STAGED verified candidates: the banded-minhash
    # + exact-Jaccard verification runs once; both the drop decision
    # here and any pair report read the same staging table
    stage_dir = os.path.join(out_dir, "stage", "near_dup_pairs")
    shutil.rmtree(stage_dir, ignore_errors=True)
    q_ngram_jaccard(spark, sf_dir).write.mode("overwrite").parquet(stage_dir)
    pairs = spark.read.parquet(stage_dir)
    dominated = pairs.select(F.col("b").alias("doc_id")).distinct()
    survivors = keepers.select("doc_id").join(dominated, "doc_id",
                                              "left_anti")
    n_near = survivors.count()

    # 5. encode the surviving corpus through the columnar engine
    lifted = webtext_from_documents(spark, sf_dir)
    surv_urls = survivors.select(
        F.concat(F.lit("https://docs-"),
                 F.pmod(F.col("doc_id"), F.lit(97)).cast("string"),
                 F.lit(".local/"), F.col("doc_id").cast("string"))
        .alias("url"))
    corpus = lifted.join(surv_urls, "url")
    from skar_spark.engine.encode import encode_documents
    enc_dir = os.path.join(out_dir, "table")
    shutil.rmtree(enc_dir, ignore_errors=True)
    lin = encode_documents(spark, corpus, enc_dir, cfg, n_rows=n_near)
    agg = lin.groupBy().agg(F.sum("bytes_in"), F.sum("bytes_out"),
                            F.sum("row_count")).collect()[0]

    if not keep_stage:
        # encode committed — the staged candidates are no longer needed
        # (see docstring); remove the whole stage root so a curate run
        # leaves only the encoded table behind
        shutil.rmtree(os.path.join(out_dir, "stage"), ignore_errors=True)
        stage_dir = None

    return {
        "input_docs": n_input,
        "after_quality": n_quality,
        "after_exact_dedup": n_exact,
        "after_near_dedup": n_near,
        "encoded_rows": int(agg[2]),
        "bytes_in": int(agg[0]),
        "bytes_out": int(agg[1]),
        "table": enc_dir,
        "staged_pairs": stage_dir,
    }


def q_pipeline_curate(spark, sf):
    """Driver query for the curation pipeline's survivor set (VERDICT
    r04 item 6): quality gate → exact-dedup min-id → near-dup survivor
    rule, emitting each survivor's lifted url + md5(text). Shares the
    stage frames with `curate` (no staging writes — self-contained
    driver-query semantics, like q_dedup_near)."""
    from skar_spark.ops.dedup import q_ngram_jaccard

    docs, _kept_q, keepers = _stage_frames(spark, sf, 5, 100_000, 0.8)
    dominated = (q_ngram_jaccard(spark, sf)
                 .select(F.col("b").alias("doc_id")).distinct())
    survivors = keepers.select("doc_id").join(dominated, "doc_id",
                                              "left_anti")
    url = F.concat(F.lit("https://docs-"),
                   F.pmod(F.col("doc_id"), F.lit(97)).cast("string"),
                   F.lit(".local/"), F.col("doc_id").cast("string"))
    return (docs.join(survivors, "doc_id")
            .select(url.alias("url"), F.md5("text").alias("text_md5")))


def sql_pipeline_curate(n: int | None = None) -> str:
    """DuckDB oracle for q_pipeline_curate: identical gate bounds, the
    portable 60-bit text hash, and the shared near-dup pair subquery."""
    from skar_spark.ops.dedup import sql_ngram_jaccard
    from skar_spark.ops.engine_queries import _SQL_URL
    from skar_spark.ops.textops import SQL_QUALITY_SCORE, sql_h60

    return f"""
WITH quality AS ({SQL_QUALITY_SCORE}),
kept AS (
  SELECT doc_id FROM quality
  WHERE n_tokens >= 5 AND n_tokens <= 100000
    AND (CASE WHEN n_tokens > 0
              THEN n_stopwords / CAST(n_tokens AS DOUBLE)
              ELSE 1.0 END) <= 0.8),
keepers AS (
  SELECT min(doc_id) AS doc_id
  FROM (SELECT d.doc_id, {sql_h60('d.text')} AS text_hash
        FROM documents d JOIN kept USING (doc_id)) h
  GROUP BY text_hash),
survivors AS (
  SELECT doc_id FROM keepers
  WHERE doc_id NOT IN (SELECT b FROM ({sql_ngram_jaccard(n)}) p))
SELECT {_SQL_URL} AS url, md5(text) AS text_md5
FROM documents JOIN survivors USING (doc_id)
"""
