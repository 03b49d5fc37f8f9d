"""Training-data text operators over the `documents` table.

Large-scale pipeline ops (dedup/quality/langid/fingerprint) expressed as
pure Spark built-ins — JVM-side, whole-stage-codegen'd, no Python UDFs —
each with a DuckDB oracle.

Cross-engine 60-bit hash used throughout (identical in Spark and DuckDB):
    Spark : conv(substring(md5(x), 1, 15), 16, 10) :: long
    DuckDB: CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from skar_spark.ops.relational import load


def h60(col):
    """Portable 60-bit hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def sql_h60(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


# --- exact dedup (hash-groupBy) ----------------------------------------------

def q_dedup_exact(spark, sf):
    d = load(spark, sf, "documents")
    return (d.withColumn("text_hash", h60(F.col("text")))
            .groupBy("text_hash")
            .agg(F.min("doc_id").alias("keeper"),
                 F.count("*").alias("n_copies")))


SQL_DEDUP_EXACT = f"""
SELECT {sql_h60('text')} AS text_hash, min(doc_id) AS keeper,
       count(*) AS n_copies
FROM documents GROUP BY 1
"""

# --- token counting ----------------------------------------------------------

def _tokens(col):
    return F.split(F.trim(col), r"\s+")


def q_token_count(spark, sf):
    d = load(spark, sf, "documents")
    n = F.when(F.length(F.trim("text")) == 0, F.lit(0)) \
         .otherwise(F.size(_tokens(F.col("text")))).alias("n_tokens")
    return d.select("doc_id", n,
                    F.length("text").alias("n_chars_computed"))


SQL_TOKEN_COUNT = r"""
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE array_length(regexp_split_to_array(trim(text), '\s+')) END
           AS n_tokens,
       length(text) AS n_chars_computed
FROM documents
"""

# --- quality scoring -----------------------------------------------------------

def q_quality_score(spark, sf):
    d = load(spark, sf, "documents")
    n_chars = F.length("text")
    n_tokens = F.when(F.length(F.trim("text")) == 0, F.lit(0)) \
                .otherwise(F.size(_tokens(F.col("text"))))
    n_stop = (
        F.size(F.split(F.concat(F.lit(" "), F.col("text"), F.lit(" ")), " the ")) - 1
        + F.size(F.split(F.concat(F.lit(" "), F.col("text"), F.lit(" ")), " a ")) - 1)
    # raw division: IEEE-identical across engines (round() ties are not)
    avg_word = F.when(n_tokens > 0,
                      n_chars.cast("double") / n_tokens).otherwise(0.0)
    return d.select(
        "doc_id", n_chars.alias("n_chars_q"), n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"), avg_word.alias("avg_word_len"))


SQL_QUALITY_SCORE = r"""
SELECT doc_id, length(text) AS n_chars_q,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE array_length(regexp_split_to_array(trim(text), '\s+')) END
           AS n_tokens,
       (array_length(string_split(concat(' ', text, ' '), ' the ')) - 1)
       + (array_length(string_split(concat(' ', text, ' '), ' a ')) - 1)
           AS n_stopwords,
       CASE WHEN length(trim(text)) > 0
            THEN CAST(length(text) AS DOUBLE)
                 / array_length(regexp_split_to_array(trim(text), '\s+'))
            ELSE 0.0 END AS avg_word_len
FROM documents
"""

# --- language id (marker-word heuristic) --------------------------------------

_MARKERS = {"en": " the ", "es": " data ", "de": " table "}


def q_lang_id(spark, sf):
    d = load(spark, sf, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    scores = {k: (F.size(F.split(padded, m)) - 1).alias(f"score_{k}")
              for k, m in _MARKERS.items()}
    out = d.select("doc_id", "lang", *scores.values())
    pred = (F.when((F.col("score_en") >= F.col("score_es"))
                   & (F.col("score_en") >= F.col("score_de")), "en")
            .when(F.col("score_es") >= F.col("score_de"), "es")
            .otherwise("de"))
    return out.withColumn("predicted", pred)


SQL_LANG_ID = """
SELECT doc_id, lang, score_en, score_es, score_de,
       CASE WHEN score_en >= score_es AND score_en >= score_de THEN 'en'
            WHEN score_es >= score_de THEN 'es'
            ELSE 'de' END AS predicted
FROM (
  SELECT doc_id, lang,
         array_length(string_split(concat(' ', text, ' '), ' the ')) - 1 AS score_en,
         array_length(string_split(concat(' ', text, ' '), ' data ')) - 1 AS score_es,
         array_length(string_split(concat(' ', text, ' '), ' table ')) - 1 AS score_de
  FROM documents) t
"""

# --- document fingerprint (normalized-content hash) ----------------------------

def q_doc_fingerprint(spark, sf):
    # no _spread here: the md5 kernel is cheap relative to the shuffle a
    # repartition would add (measured 1.35s direct vs 1.57s spread)
    d = load(spark, sf, "documents")
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    return d.select("doc_id",
                    F.md5(norm).alias("fingerprint"),
                    h60(norm).alias("fingerprint60"))


_NORM_SQL = r"lower(regexp_replace(text, '\s+', ' ', 'g'))"
SQL_DOC_FINGERPRINT = rf"""
SELECT doc_id, md5({_NORM_SQL}) AS fingerprint,
       {sql_h60(_NORM_SQL)} AS fingerprint60
FROM documents
"""

# --- multimodal metadata (binary column plumbing) ------------------------------

def q_multimodal_meta(spark, sf):
    d = load(spark, sf, "documents")
    blob = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(blob).alias("n_bytes"),
        F.lower(F.substring(F.hex(blob), 1, 8)).alias("magic_hex"),
        (F.octet_length(blob) - F.length("text")).alias("multibyte_extra"))


SQL_MULTIMODAL_META = """
SELECT doc_id, octet_length(encode(text)) AS n_bytes,
       lower(substr(hex(encode(text)), 1, 8)) AS magic_hex,
       octet_length(encode(text)) - length(text) AS multibyte_extra
FROM documents
"""

# --- BPE-ish regex token counting (training-data op) ---------------------------
#
# The whitespace count (q_token_count) underestimates LLM token budgets;
# this pre-tokenizer-style regex counts words / digit runs / punctuation
# marks separately (the GPT-2 pre-tokenizer shape, simplified to a
# dialect both Java regex and DuckDB's RE2 interpret identically).

_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def q_bpe_token_count(spark, sf):
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_BPE_RE)).alias("n_bpe_tokens"))


SQL_BPE_TOKEN_COUNT = r"""
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
            AS INT) AS n_bpe_tokens
FROM documents
"""
