"""Round-5 pipeline ops: deterministic sampling, KMV sketch, and
near-dup connected-components clustering (beyond the single-hop
survivor rules)."""

import pytest
from pyspark.sql import functions as F

from skar_spark.ops.dedup import q_dedup_clusters, q_ngram_jaccard
from skar_spark.ops.sampling import (
    _KMV_K,
    _SAMPLE_DEN,
    _STRATA_QUOTA,
    q_kmv_distinct,
    q_sample_hash,
    q_sample_stratified,
)

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_sample_hash_deterministic_and_plausible(spark):
    a = {r.doc_id for r in q_sample_hash(spark, SF01).collect()}
    b = {r.doc_id for r in q_sample_hash(spark, SF01).collect()}
    assert a == b                      # reproducible, not random
    n = spark.read.parquet(f"{SF01}/documents.parquet").count()
    # binomial(n, 1/16): allow ±5 sigma
    import math
    mu, sd = n / _SAMPLE_DEN, math.sqrt(n * (1 / _SAMPLE_DEN) *
                                        (1 - 1 / _SAMPLE_DEN))
    assert mu - 5 * sd <= len(a) <= mu + 5 * sd


def test_sample_stratified_quota_and_order(spark):
    rows = q_sample_stratified(spark, SF01).collect()
    per = {}
    for r in rows:
        per.setdefault(r.lang, []).append(r.rn)
    for lang, rns in per.items():
        assert len(rns) <= _STRATA_QUOTA
        assert sorted(rns) == list(range(1, len(rns) + 1))  # dense ranks


def test_kmv_estimate_close_to_exact(spark):
    row = q_kmv_distinct(spark, SF01).collect()[0]
    exact = (spark.read.parquet(f"{SF01}/documents.parquet")
             .select("text").distinct().count())
    assert row.k == min(_KMV_K, exact)
    # stderr ≈ 1/sqrt(k-2) ≈ 6.3%; allow 4x
    assert abs(row.est - exact) / exact < 0.25, (row.est, exact)


def test_kmv_overlap_estimates_close_to_exact(spark):
    """The sketch-algebra estimates must track the true trigram-set
    union/intersection sizes (k=256 → stderr ≈ 6.3%; allow 4x)."""
    from skar_spark.ops.sampling import _gram_hashes, q_kmv_overlap
    row = q_kmv_overlap(spark, SF01).collect()[0]
    g = _gram_hashes(spark, SF01)
    exact_u = g.select("h").distinct().count()
    exact_i = (g.groupBy("h").agg(F.countDistinct("side").alias("ns"))
               .filter(F.col("ns") == 2).count())
    assert abs(row.est_union - exact_u) / exact_u < 0.25, (
        row.est_union, exact_u)
    assert 0.0 < row.jaccard <= 1.0
    assert exact_i > 0  # the parities genuinely share trigrams
    assert abs(row.est_intersect - exact_i) / exact_i < 0.5, (
        row.est_intersect, exact_i)


def test_dedup_clusters_match_union_find(spark):
    """The distributed label propagation must produce exactly the
    connected components a driver-side union-find computes from the
    same verified pair list — including transitive chains the
    single-hop survivor rule cannot see."""
    pairs = [(r.a, r.b) for r in q_ngram_jaccard(spark, SF).collect()]
    docs = [r.doc_id for r in spark.read.parquet(
        f"{SF}/documents.parquet").select("doc_id").collect()]

    parent = {d: d for d in docs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min doc_id in component
    comp = {}
    for d in docs:
        comp.setdefault(find(d), []).append(d)
    want = {d: min(members) for members in comp.values() for d in members}

    got = {r.doc_id: r.cluster
           for r in q_dedup_clusters(spark, SF).collect()}
    assert got == want
    # the graph actually has at least one multi-doc cluster (else the
    # test is vacuous)
    assert any(v != k for k, v in got.items())


def test_dedup_clusters_transitive_chain(spark, tmp_path):
    """A~B and B~C (but A,C not directly paired) must land in ONE
    cluster — the transitivity the survivor rules don't provide."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # three docs sharing shingles pairwise A-B and B-C only
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    w = base.split()
    a = " ".join(w[:14])
    b = " ".join(w[3:17])          # overlaps both a and c
    c = " ".join(w[6:20])
    texts = [a, b, c] + [f"unique doc number {i} with words {i*7}"
                         for i in range(3, 10)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 10),
        "source": pa.array(["t"] * 10),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(tmp_path / "documents.parquet"))

    pair_set = {(r.a, r.b)
                for r in q_ngram_jaccard(spark, str(tmp_path)).collect()}
    clusters = {r.doc_id: r.cluster
                for r in q_dedup_clusters(spark, str(tmp_path)).collect()}
    assert clusters[1] == 0 and clusters[2] == 0      # one cluster
    if (0, 2) not in pair_set:                        # truly transitive
        assert (0, 1) in pair_set and (1, 2) in pair_set
    assert all(clusters[i] == i for i in range(3, 10))  # singletons


def test_dedup_clusters_driver_vs_distributed_parity(spark, monkeypatch):
    """r6: the driver union-find fast path (small verified edge lists)
    and the distributed pointer-jumping loop must produce identical
    clusters."""
    from skar_spark.ops import dedup
    fast = {r.doc_id: r.cluster
            for r in q_dedup_clusters(spark, SF).collect()}
    monkeypatch.setattr(dedup, "_CC_DRIVER_MAX_EDGES", -1)
    stats = {}
    dist = {r.doc_id: r.cluster
            for r in q_dedup_clusters(spark, SF, _stats=stats).collect()}
    assert stats["mode"] == "distributed"
    assert fast == dist


def test_dedup_clusters_long_chain_pointer_jumping(spark, tmp_path,
                                                   monkeypatch):
    # force the distributed loop (the driver union-find fast path would
    # otherwise absorb this metadata-sized graph)
    from skar_spark.ops import dedup
    monkeypatch.setattr(dedup, "_CC_DRIVER_MAX_EDGES", -1)
    """A 60-doc drift-chain corpus: the component has a LONG diameter
    (links only between near neighbors), so plain neighbor propagation
    would need ~diameter rounds — the pointer-jumping step must
    converge in O(log diameter)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 60
    words = [f"w{i:03d}" for i in range(n + 14)]
    texts = [" ".join(words[i: i + 14]) for i in range(n)]  # shift-1
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["t"] * n),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(tmp_path / "documents.parquet"))

    pairs = [(r.a, r.b)
             for r in q_ngram_jaccard(spark, str(tmp_path)).collect()]
    # the graph is a BAND: only near neighbors link, so component
    # diameter >= (span of the largest component) / max link distance
    max_link = max(abs(a - b) for a, b in pairs)
    assert max_link <= 12

    parent = {d: d for d in range(n)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for d in range(n):
        comp.setdefault(find(d), []).append(d)
    want = {d: min(m) for m in comp.values() for d in m}
    big = max(comp.values(), key=len)
    diameter_lb = (max(big) - min(big)) // max_link
    assert len(big) >= 40 and diameter_lb >= 4

    stats = {}
    clusters = {r.doc_id: r.cluster for r in q_dedup_clusters(
        spark, str(tmp_path), _stats=stats).collect()}
    assert clusters == want
    # pointer jumping: rounds ~ log2(diameter) + settle, far below the
    # diameter plain propagation would need
    assert stats["rounds"] <= max(6, diameter_lb), (stats, diameter_lb)
