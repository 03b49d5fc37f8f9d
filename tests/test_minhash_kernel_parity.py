"""r6 kernel parity: the Arrow-batched Python kernels that replaced the
JVM expression trees in the minhash/jaccard hot paths must be
BIT-IDENTICAL to their JVM twins (which stay in the source as the
reference semantics: _minhash_col / _grams_col + array_intersect).

The corpora the driver hash-verifies are plain text, but the kernels
must agree on the nasty cases too — Java-\\s tokenization (ASCII-only,
\\x0b included), space-only trim, leading/trailing empty split fields,
empty/short/NULL text, multi-byte code points (substr counts code
points, not bytes).
"""

import pytest
from pyspark.sql import functions as F

from skar_spark.ops import dedup
from skar_spark.ops.textops import _tokens

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.01"

NASTY = [
    (0, "plain three word shingle text here"),
    (1, "two words"),
    (2, ""),
    (3, None),
    (4, "   leading and trailing spaces   "),
    (5, "tab\tseparated\ttokens\tfour"),
    (6, "newline\nand\x0bvertical\ftab\rseps"),
    (7, "double  space   runs connect tokens"),
    (8, "unicode café naïve résumé tokens"),
    (9, "nbsp is not a java ws separator"),
    (10, "a b c"),
    (11, "x" * 3),          # shorter than a 4-gram
    (12, "exactly4"),
    (13, " \t mixed ws at edges \t "),
]


def _nasty_df(spark):
    return spark.createDataFrame(NASTY, "doc_id long, text string")


def _minhash_with(df, k, col_fn):
    staged = (df.select("doc_id", _tokens(F.col("text")).alias("_toks"))
              .select("doc_id",
                      dedup._shingles(F.col("_toks")).alias("_sh")))
    return staged.select(
        "doc_id", *[col_fn(F.col("_sh"), j).alias(f"mh{j}")
                    for j in range(k)])


@pytest.mark.parametrize("source", ["nasty", "sf001"])
def test_minhash_conv_after_min_bit_identical_to_ref(spark, source):
    """The production conv-after-array_min formulation must equal the
    reference h60-per-shingle one: equal-length lowercase hex prefixes
    order lexicographically == numerically."""
    df = _nasty_df(spark) if source == "nasty" else \
        spark.read.parquet(f"{SF}/documents.parquet")
    k = 8
    ref = {r.doc_id: tuple(r)[1:]
           for r in _minhash_with(df, k, dedup._minhash_col_ref).collect()}
    opt = {r.doc_id: tuple(r)[1:]
           for r in _minhash_with(df, k, dedup._minhash_col).collect()}
    assert ref == opt


def test_jaccard_counts_kernel_bit_identical_to_jvm_twin(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text").limit(200)
    docs = [(r.doc_id, r.text) for r in base.collect()] + \
        [(10_000 + i, t) for i, (_i, t) in enumerate(NASTY)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # all consecutive pairs (covers real-real, real-nasty, nasty-nasty)
    ids = [i for i, _t in docs]
    pairs = [(ids[i], ids[i + 1]) for i in range(len(ids) - 1)]
    pdf = spark.createDataFrame(pairs, "a long, b long")
    ta = df.select(F.col("doc_id").alias("a"), F.col("text").alias("_ta"))
    tb = df.select(F.col("doc_id").alias("b"), F.col("text").alias("_tb"))
    joined = pdf.join(ta, "a").join(tb, "b")
    ker = {(r.a, r.b): (r.inter, r.na, r.nb)
           for r in joined.select("a", "b", "_ta", "_tb").mapInArrow(
               dedup._jaccard_counts_kernel,
               "a long, b long, inter int, na int, nb int").collect()}
    g = df.select("doc_id", dedup._grams_col().alias("grams"))
    ga = g.select(F.col("doc_id").alias("a"), F.col("grams").alias("ga"))
    gb = g.select(F.col("doc_id").alias("b"), F.col("grams").alias("gb"))
    jvm = {(r.a, r.b): (r.inter, r.na, r.nb)
           for r in pdf.join(ga, "a").join(gb, "b").select(
               "a", "b",
               F.size(F.array_intersect("ga", "gb")).alias("inter"),
               F.size("ga").alias("na"),
               F.size("gb").alias("nb")).collect()}
    assert ker == jvm
