"""ANN scale parameterization + recall, and the no-per-row-Python guard.

VERDICT r01 items 5 and 7: planes must scale with n; recall must be
measured; no `for i in range(n)` over data rows anywhere in the package.
"""

import os
import re

import numpy as np
import pytest

from skar_spark.ops.dedup import (
    _ANN_TABLES,
    _ANN_TARGET_BUCKET,
    n_planes,
    q_ann_lsh,
    q_cosine_topk,
)

pytestmark = pytest.mark.spark


def test_planes_grow_with_n():
    assert n_planes(100) == 4
    assert n_planes(500) == 4
    assert n_planes(32_000) == 10
    assert n_planes(32_000_000) == 20
    assert n_planes(10**12) == 20  # clamped
    # bucket population stays ~TARGET as n grows (pre-clamp)
    for n in (10_000, 100_000, 1_000_000):
        assert n / (1 << n_planes(n)) <= 2 * _ANN_TARGET_BUCKET


@pytest.fixture(scope="module")
def planted(spark, tmp_path_factory):
    """Deterministic corpus with planted near-duplicates: 200 base
    vectors + 100 noisy copies (cos ≈ 0.99) — the embedding-cosine
    near-dup workload ANN exists for."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((200, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dup = base[:100] + 0.02 * rng.standard_normal((100, 64))
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    V = np.vstack([base, dup]).astype(np.float32)
    import pyarrow as pa
    import pyarrow.parquet as pq
    sf_dir = str(tmp_path_factory.mktemp("ann"))
    pq.write_table(pa.table({
        "vec_id": pa.array(range(300), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in V],
                              pa.list_(pa.float32())),
    }), os.path.join(sf_dir, "embeddings.parquet"))
    cos = (V[:100] * V[200:]).sum(axis=1)
    planted_pairs = {(i, 200 + i) for i in range(100)}
    return sf_dir, planted_pairs, float(cos.min())


def test_ann_recall_on_planted_neardups(spark, planted):
    sf_dir, pairs, min_cos = planted
    assert min_cos > 0.95  # the planted dups really are near-dups
    got = {(r.a, r.b) for r in q_ann_lsh(spark, sf_dir).collect()}
    recall = len(got & pairs) / len(pairs)
    assert recall >= 0.9, f"recall {recall} < 0.9"


def test_ann_is_subquadratic_candidates(spark, planted):
    """The pair output must be far below the n²/2 cross product — the
    buckets actually prune."""
    sf_dir, _pairs, _ = planted
    n = 300
    got = q_ann_lsh(spark, sf_dir).count()
    assert got < (n * (n - 1) / 2) * 0.25


_ROW_LOOP = re.compile(r"for\s+\w+\s+in\s+range\((n\b|len\()")
_ALLOWED_MARKERS = ("PARTITION", "metadata", "symbol table", "per-column",
                    "selections")


def test_no_per_row_python_loops():
    """Grep guard (SURVEY §5 promise): no `for i in range(n)`-style loop
    over data rows in any kernel module. Loops over metadata rows /
    constant-size tables must carry an explanatory marker comment."""
    pkg = os.path.join(os.path.dirname(__file__), "..", "skar_spark")
    offenders = []
    for root, _dirs, files in os.walk(pkg):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            with open(path) as f:
                for ln, line in enumerate(f, 1):
                    if _ROW_LOOP.search(line) and not any(
                            m in line for m in _ALLOWED_MARKERS):
                        offenders.append(f"{fn}:{ln}: {line.strip()}")
    # known metadata-scale loops (documented, bounded by #partitions /
    # #selections / table size, not data rows)
    allowed_files = {"fsst.py", "synth.py", "golden.py", "decode.py"}
    bad = [o for o in offenders if o.split(":")[0] not in allowed_files]
    assert not bad, f"per-row Python loops found: {bad}"
