"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``skar_spark`` (see SURVEY.md §2 for the operator
inventory mapping).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full north-rule engine pass on sf0.001 — encode the
    webtext-shaped documents table with codec auto-selection, decode it
    back through the custom columnar format, and return (url, text_md5)
    per document computed from the DECODED bytes (hash-verifiable)."""
    from skar_spark.ops.engine_queries import q_encode_roundtrip
    return q_encode_roundtrip(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from skar_spark import pipeline
    from skar_spark.ops import (corpus, dedup, engine_queries, multimodal,
                                relational, sampling, textops)
    return {
        # relational operator surface (SURVEY §2.2-2.6)
        "range_filter": relational.q_range_filter,
        "inset_disjunction": relational.q_inset_disjunction,
        "pair_inset": relational.q_pair_inset,
        "semi_join": relational.q_semi_join,
        "anti_join": relational.q_anti_join,
        "inner_join": relational.q_inner_join,
        "zone_minmax": relational.q_zone_minmax,
        "distinct_sets": relational.q_distinct_sets,
        "tpch_q1": relational.q_tpch_q1,
        "tpch_q3": relational.q_tpch_q3,
        "lexsort_topn": relational.q_lexsort_topn,
        "union_all": relational.q_union_all,
        "hex_derive": relational.q_hex_derive,
        "gap_detect": relational.q_gap_detect,
        "window_topk": relational.q_window_topk,
        "rollup_agg": relational.q_rollup,
        "percentile_agg": relational.q_percentile_agg,
        "left_join": relational.q_left_join,
        "having": relational.q_having,
        "sessionize": relational.q_sessionize,
        "json_extract": relational.q_json_extract,
        # training-data text ops
        "dedup_exact": textops.q_dedup_exact,
        "token_count": textops.q_token_count,
        "quality_score": textops.q_quality_score,
        "lang_id": textops.q_lang_id,
        "doc_fingerprint": textops.q_doc_fingerprint,
        "multimodal_meta": textops.q_multimodal_meta,
        "bpe_token_count": textops.q_bpe_token_count,
        "asof_join": relational.q_asof_join,
        "range_join": relational.q_range_join,
        # near-dup + similarity
        "minhash": dedup.q_minhash,
        "lsh_pairs": dedup.q_lsh_pairs,
        "simhash": dedup.q_simhash,
        "ngram_jaccard": dedup.q_ngram_jaccard,
        "cosine_topk": dedup.q_cosine_topk,
        # the exact-same-answer SCALE path (broadcast query matrix +
        # per-batch BLAS + local top-k; no crossJoin) — shares the
        # brute baseline's oracle
        "cosine_topk_blocked": dedup.q_cosine_topk_blocked,
        "ann_lsh": dedup.q_ann_lsh,
        "ann_ivf": dedup.q_ann_ivf,
        "ann_pq": dedup.q_ann_pq,
        "ann_ivfpq": dedup.q_ann_ivfpq,
        # end-to-end dedup decisions (survivor sets, not just pairs)
        "dedup_near": dedup.q_dedup_near,
        "dedup_clusters": dedup.q_dedup_clusters,
        "embed_dedup": dedup.q_embed_dedup,
        # composed curation pipeline survivor set (quality gate →
        # exact-dedup min-id → near-dup survivor rule), r5
        "pipeline_curate": pipeline.q_pipeline_curate,
        # deterministic sampling + sketching (r5)
        "sample_hash": sampling.q_sample_hash,
        "sample_stratified": sampling.q_sample_stratified,
        "kmv_distinct": sampling.q_kmv_distinct,
        "kmv_overlap": sampling.q_kmv_overlap,
        # corpus-construction ops (r5): decontamination, packing,
        # domain stats, repetition stats, histogram quantiles,
        # leakage-safe split, exact heavy hitters
        "decontam": corpus.q_decontam,
        "seq_pack": corpus.q_seq_pack,
        "domain_stats": corpus.q_domain_stats,
        "rep_stats": corpus.q_rep_stats,
        "hist_quantile": corpus.q_hist_quantile,
        "split_assign": corpus.q_split_assign,
        "heavy_hitters": corpus.q_heavy_hitters,
        "line_dedup": corpus.q_line_dedup,
        "temp_sample": corpus.q_temp_sample,
        "vocab_encode": corpus.q_vocab_encode,
        "pii_redact": corpus.q_pii_redact,
        "multimodal_decode": multimodal.q_multimodal_decode,
        "multimodal_frames": multimodal.q_multimodal_frames,
        # engine path — encode → decode through the custom columnar
        # format; roundtrip + pruned scan are hash-verified vs DuckDB
        "encode_roundtrip": engine_queries.q_encode_roundtrip,
        "alp_roundtrip": engine_queries.q_alp_roundtrip,
        "engine_scan_pruned": engine_queries.q_engine_scan_pruned,
        "engine_query_handler": engine_queries.q_engine_query_handler,
        "engine_hot_tail": engine_queries.q_engine_hot_tail,
        "engine_changes": engine_queries.q_engine_changes,
        "engine_day_hash": engine_queries.q_engine_day_hash,
        "engine_day_counts": engine_queries.q_engine_day_counts,
        "engine_stats_prune": engine_queries.q_engine_stats_prune,
        "engine_merge": engine_queries.q_engine_merge,
        "engine_delete": engine_queries.q_engine_delete,
        "engine_rollback": engine_queries.q_engine_rollback,
        "engine_lineage": engine_queries.q_engine_lineage,
    }


def oracle_sql() -> dict[str, str]:
    from skar_spark import pipeline
    from skar_spark.ops import (corpus, dedup, engine_queries, multimodal,
                                relational, sampling, textops)
    return {
        "range_filter": relational.SQL_RANGE_FILTER,
        "inset_disjunction": relational.SQL_INSET_DISJUNCTION,
        "pair_inset": relational.SQL_PAIR_INSET,
        "semi_join": relational.SQL_SEMI_JOIN,
        "anti_join": relational.SQL_ANTI_JOIN,
        "inner_join": relational.SQL_INNER_JOIN,
        "zone_minmax": relational.SQL_ZONE_MINMAX,
        "distinct_sets": relational.SQL_DISTINCT_SETS,
        "tpch_q1": relational.SQL_TPCH_Q1,
        "tpch_q3": relational.SQL_TPCH_Q3,
        "lexsort_topn": relational.SQL_LEXSORT_TOPN,
        "union_all": relational.SQL_UNION_ALL,
        "hex_derive": relational.SQL_HEX_DERIVE,
        "gap_detect": relational.SQL_GAP_DETECT,
        "window_topk": relational.SQL_WINDOW_TOPK,
        "rollup_agg": relational.SQL_ROLLUP,
        "percentile_agg": relational.SQL_PERCENTILE_AGG,
        "left_join": relational.SQL_LEFT_JOIN,
        "having": relational.SQL_HAVING,
        "sessionize": relational.SQL_SESSIONIZE,
        "json_extract": relational.SQL_JSON_EXTRACT,
        "dedup_exact": textops.SQL_DEDUP_EXACT,
        "token_count": textops.SQL_TOKEN_COUNT,
        "quality_score": textops.SQL_QUALITY_SCORE,
        "lang_id": textops.SQL_LANG_ID,
        "doc_fingerprint": textops.SQL_DOC_FINGERPRINT,
        "multimodal_meta": textops.SQL_MULTIMODAL_META,
        # full multimodal oracles (VERDICT r03 item 4): fake header
        # parse via hex(blob) byte peeks; the mod-2^64 polynomial
        # fingerprint via a HUGEINT struct reduce; frame sampling via
        # length arithmetic + first-8-bytes-LE hex gather
        "multimodal_decode": multimodal.SQL_MULTIMODAL_DECODE,
        "multimodal_frames": multimodal.SQL_MULTIMODAL_FRAMES,
        "bpe_token_count": textops.SQL_BPE_TOKEN_COUNT,
        "asof_join": relational.SQL_ASOF_JOIN,
        "range_join": relational.SQL_RANGE_JOIN,
        "minhash": dedup.sql_minhash(),
        "lsh_pairs": dedup.sql_lsh_pairs(),
        "simhash": dedup.SQL_SIMHASH,
        "ngram_jaccard": dedup.sql_ngram_jaccard(),
        "cosine_topk": dedup.SQL_COSINE_TOPK,
        "cosine_topk_blocked": dedup.SQL_COSINE_TOPK,
        "ann_lsh": dedup.sql_ann_lsh(),
        "ann_ivf": dedup.sql_ann_ivf(),
        "ann_pq": dedup.sql_ann_pq(),
        # IVF-PQ composition: probes bound the lists, ADC reads codes
        "ann_ivfpq": dedup.sql_ann_ivfpq(),
        "dedup_near": dedup.sql_dedup_near(),
        "dedup_clusters": dedup.sql_dedup_clusters(),
        "embed_dedup": dedup.sql_embed_dedup(),
        "pipeline_curate": pipeline.sql_pipeline_curate(),
        "sample_hash": sampling.SQL_SAMPLE_HASH,
        "sample_stratified": sampling.SQL_SAMPLE_STRATIFIED,
        "kmv_distinct": sampling.SQL_KMV_DISTINCT,
        "kmv_overlap": sampling.sql_kmv_overlap(),
        "decontam": corpus.SQL_DECONTAM,
        "seq_pack": corpus.SQL_SEQ_PACK,
        "domain_stats": corpus.SQL_DOMAIN_STATS,
        "rep_stats": corpus.SQL_REP_STATS,
        "hist_quantile": corpus.SQL_HIST_QUANTILE,
        "split_assign": corpus.SQL_SPLIT_ASSIGN,
        "heavy_hitters": corpus.SQL_HEAVY_HITTERS,
        "line_dedup": corpus.SQL_LINE_DEDUP,
        "temp_sample": corpus.SQL_TEMP_SAMPLE,
        "vocab_encode": corpus.SQL_VOCAB_ENCODE,
        # PII scrub (counts before masking; email→ip→phone mask order)
        "pii_redact": corpus.SQL_PII_REDACT,
        # engine path: the decoded output is projected to SQL-expressible
        # columns so the north-rule invariant is hash-verified end-to-end
        "encode_roundtrip": engine_queries.SQL_ENCODE_ROUNDTRIP,
        # distributed ALP float-codec roundtrip: decoded doubles must
        # hash-match the raw lineitem columns bit-for-bit
        "alp_roundtrip": engine_queries.SQL_ALP_ROUNDTRIP,
        "engine_scan_pruned": engine_queries.SQL_ENGINE_SCAN_PRUNED,
        "engine_query_handler": engine_queries.SQL_ENGINE_QUERY_HANDLER,
        # hot-tier union hash-verified: committed ∪ uncommitted tail
        # must equal ALL documents exactly once (r4)
        "engine_hot_tail": engine_queries.SQL_ENGINE_HOT_TAIL,
        "engine_changes": engine_queries.SQL_ENGINE_CHANGES,
        # range×hash layout + partition-level ts pruning, hash-verified
        "engine_day_hash": engine_queries.SQL_ENGINE_DAY_HASH,
        # per-day counts served from lineage metadata alone
        "engine_day_counts": engine_queries.SQL_ENGINE_DAY_COUNTS,
        # numeric column-stats (col_stats zone maps) partition pruning
        "engine_stats_prune": engine_queries.SQL_ENGINE_STATS_PRUNE,
        # row-level MERGE (upsert+insert) and DELETE over the encoded
        # table — partition-granular copy-on-write, decoded result
        # hash-verified against the relationally-merged corpus (r5)
        "engine_merge": engine_queries.SQL_ENGINE_MERGE,
        "engine_delete": engine_queries.SQL_ENGINE_DELETE,
        # snapshot rollback: merge then roll back — decode must equal
        # the untouched corpus byte-for-byte
        "engine_rollback": engine_queries.SQL_ENGINE_ROLLBACK,
        # engine_lineage: engine-internal schema, rows-only by design
    }


if __name__ == "__main__":
    from skar_spark.session import get_spark
    s = get_spark(cpus=8)
    df = entry(s)
    df.show(truncate=False)
    s.stop()
