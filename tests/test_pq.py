"""Product quantization: code compactness, exact-duplicate retrieval
through 32×-compressed codes, and the ADC-minimum invariant.

(The ann_pq ↔ DuckDB hash parity is covered by test_queries_oracle.)
"""

import math
import os

import numpy as np
import pytest

from skar_spark.ops.dedup import (
    _DIM,
    _PQ_K,
    _PQ_M,
    _PQ_N_QUERIES,
    pq_codebook,
    pq_encode,
    q_ann_pq,
)

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def planted_dups(tmp_path_factory):
    """240 deterministic vectors where each query q < _PQ_N_QUERIES has
    an EXACT duplicate at vec_id 100 + q; everything else is random."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(23)
    V = rng.standard_normal((240, _DIM)).astype(np.float32)
    for q in range(_PQ_N_QUERIES):
        V[100 + q] = V[q]
    sf_dir = str(tmp_path_factory.mktemp("pq"))
    pq.write_table(pa.table({
        "vec_id": pa.array(range(240), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in V],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * 240, pa.int32()),
    }), os.path.join(sf_dir, "embeddings.parquet"))
    return sf_dir


def test_code_compactness():
    """The whole point at 100 TB: _PQ_M codes of log2(_PQ_K) bits
    replace _DIM float32s — byte-aligned that is 8 B vs 256 B (32×)."""
    bits = _PQ_M * math.ceil(math.log2(_PQ_K))
    assert bits <= 32                      # 4 B packed
    assert _PQ_M <= _DIM * 4 / 32          # ≥32× byte-aligned
    assert _DIM % _PQ_M == 0


def test_codes_shape_and_determinism(spark, planted_dups):
    codes = pq_encode(spark, planted_dups).collect()
    assert len(codes) == 240
    by_id = {r.vec_id: r.codes for r in codes}
    for cs in by_id.values():
        assert len(cs) == _PQ_M
        assert all(0 <= c < _PQ_K for c in cs)
    # exact duplicates quantize to identical codes
    for q in range(_PQ_N_QUERIES):
        assert by_id[q] == by_id[100 + q], q
    # a second run is bit-identical (stride codebook is deterministic)
    again = {r.vec_id: r.codes for r in
             pq_encode(spark, planted_dups).collect()}
    assert again == by_id


def test_adc_retrieves_exact_duplicate_at_rank_one(spark, planted_dups):
    """ADC(q, x) = Σ_j table[j][code_j(x)] ≥ Σ_j min_c table[j][c], and
    q's duplicate attains that minimum (its codes ARE q's argmins), so
    it must rank first — any tie needs identical codes and then loses
    the vec_id tiebreak only to a smaller id, which the fixture
    excludes. This is retrieval THROUGH the compressed representation:
    the scorer never sees the duplicate's floats."""
    top = (q_ann_pq(spark, planted_dups)
           .filter("rk = 1").collect())
    got = {r.qid: r.vec_id for r in top}
    assert got == {q: 100 + q for q in range(_PQ_N_QUERIES)}


def test_codebook_is_metadata_sized(spark):
    base, CB = pq_codebook(spark, "/root/testdata/sf0.001")
    assert CB.shape == (_PQ_K, _DIM)
    assert CB.nbytes <= 16 * 1024  # broadcastable at any corpus size


def test_ivfpq_retrieves_exact_duplicate_at_rank_one(spark, planted_dups):
    """The IVF-PQ composition preserves the ADC-minimum retrieval
    invariant: an exact duplicate quantizes to the query's own inverted
    list (same vector → same argmax cid), the query's rank-1 probe IS
    that list, and within the probed candidates the duplicate attains
    the ADC minimum — so rank 1, end to end through 8-byte codes."""
    from skar_spark.ops.dedup import q_ann_ivfpq

    top = q_ann_ivfpq(spark, planted_dups).filter("rk = 1").collect()
    got = {r.qid: r.vec_id for r in top}
    assert got == {q: 100 + q for q in range(_PQ_N_QUERIES)}


def test_ivfpq_scores_only_probed_lists(spark, planted_dups):
    """The scored candidate set must be the probed lists only — the
    sub-linear-work contract that distinguishes IVF-PQ from flat ADC."""
    from pyspark.sql import functions as F
    from skar_spark.ops.dedup import (_IVF_NPROBE, ivf_assign, ivf_probes,
                                      q_ann_ivfpq)

    quant, assigned = ivf_assign(spark, planted_dups)
    n, k = quant["n"], quant["k"]
    q = (quant["base"].filter(F.col("vec_id") < _PQ_N_QUERIES)
         .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv")))
    probes = ivf_probes(spark, quant, q).select("qid", "cid")
    cand = probes.join(assigned.select("vec_id", "cid"), "cid").count()
    full = _PQ_N_QUERIES * n
    assert cand < 0.55 * full, (cand, full)  # nprobe/k of the corpus
    # and every scored row in the query output is from a probed list
    out = q_ann_ivfpq(spark, planted_dups)
    probed = {(r.qid, r.cid) for r in probes.collect()}
    by_cid = {r.vec_id: r.cid for r in assigned.select(
        "vec_id", "cid").collect()}
    for r in out.collect():
        assert (r.qid, by_cid[r.vec_id]) in probed


def test_pq_encode_passes_through_partition_columns(spark, planted_dups):
    """pq_encode must carry non-vector columns (the IVF cid) so codes
    stay co-located with their inverted list — no corpus shuffle."""
    from skar_spark.ops.dedup import ivf_assign

    _quant, assigned = ivf_assign(spark, planted_dups)
    _base, CB = pq_codebook(spark, planted_dups)
    codes = pq_encode(spark, planted_dups, assigned, CB)
    assert set(codes.columns) == {"vec_id", "cid", "codes"}
    rows = codes.select("vec_id", "cid", "codes").limit(5).collect()
    assert all(len(r.codes) == _PQ_M for r in rows)


def test_ivfpq_seeds_match_separate_collects(spark):
    """_ivfpq_seeds (one fused scan, r6) must reproduce the IVF
    quantizer and PQ codebook of the separate ivf_quantizer +
    pq_codebook jobs bit-for-bit at both test scales."""
    from skar_spark.ops.dedup import _ivfpq_seeds, ivf_quantizer

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        q1 = ivf_quantizer(spark, sf)
        _base, cb1 = pq_codebook(spark, sf)
        q2, _base2, cb2 = _ivfpq_seeds(spark, sf)
        assert np.array_equal(q1["C"], q2["C"])
        assert np.array_equal(q1["cids"], q2["cids"])
        assert np.array_equal(q1["cnorm"], q2["cnorm"])
        assert (q1["n"], q1["k"], q1["m"]) == (q2["n"], q2["k"], q2["m"])
        assert (q1["coarse"] is None) == (q2["coarse"] is None)
        assert np.array_equal(cb1, cb2)
