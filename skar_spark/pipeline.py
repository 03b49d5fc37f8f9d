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


def curate(spark: SparkSession, sf_dir: str, out_dir: str,
           cfg: EngineConfig = DEFAULT,
           min_tokens: int = 5,
           max_tokens: int = 100_000,
           max_stopword_rate: float = 0.8) -> dict:
    """Run the full curation pipeline over `{sf_dir}/documents.parquet`
    and encode the surviving corpus into `out_dir`. Returns stage
    counters (inputs, drops per stage, encoded bytes)."""
    from skar_spark.ops.dedup import q_ngram_jaccard
    from skar_spark.ops.engine_queries import webtext_from_documents
    from skar_spark.ops.textops import q_lang_id, q_quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_input = docs.count()

    # 1. annotations (projections joined on doc_id)
    quality = q_quality_score(spark, sf_dir)
    lang = q_lang_id(spark, sf_dir).select("doc_id", "predicted")
    ann = quality.join(lang, "doc_id")

    # 2. quality gate
    stop_rate = F.when(F.col("n_tokens") > 0,
                       F.col("n_stopwords")
                       / F.col("n_tokens").cast("double")).otherwise(1.0)
    kept_q = ann.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (stop_rate <= max_stopword_rate)).select("doc_id")
    n_quality = kept_q.count()

    # 3. exact dedup: smallest id per text hash survives
    from skar_spark.ops.textops import h60
    hashed = docs.join(kept_q, "doc_id").select(
        "doc_id", h60(F.col("text")).alias("text_hash"))
    keepers = hashed.groupBy("text_hash").agg(
        F.min("doc_id").alias("doc_id"))
    n_exact = keepers.count()

    # 4. near dedup with STAGED verified candidates: the banded-minhash
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
