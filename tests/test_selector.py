"""Auto-selector tests — FIXTURES.md §3 expected winners.

The selector's contract: (a) whatever it picks round-trips bit-identical,
(b) the encoded size is never worse than plain(+zstd) by more than the
sampling margin, (c) on clear-cut structured vectors it picks the
structurally right codec family.
"""

import numpy as np
import pyarrow as pa

from skar_spark.codecs import decode_array, encode_array, encode_auto
from skar_spark.codecs.selector import choose_codec

rng = np.random.default_rng(7)


def test_sorted_ts_picks_delta():
    arr = pa.array((np.arange(50_000) * 997 + 12).astype(np.int64),
                   pa.timestamp("us"))
    assert choose_codec(arr) == "for_delta"


def test_const_picks_rle_or_bitpack():
    arr = pa.array(np.full(50_000, 123456789, np.int64))
    assert choose_codec(arr) in ("rle", "bitpack", "for_delta")


def test_small_range_picks_bitpack_family():
    arr = pa.array(rng.integers(1000, 1128, 50_000).astype(np.int64))
    assert choose_codec(arr) in ("bitpack", "rle")


def test_zipf_lang_picks_dict_family():
    langs = [f"l{i:02d}" for i in range(40)]
    idx = np.minimum((rng.pareto(1.2, 100_000)).astype(int), 39)
    arr = pa.array([langs[i] for i in idx])
    # clustered runs: sort to emulate within-partition clustering
    arr = arr.take(pa.array(np.argsort(idx, kind="stable")))
    assert choose_codec(arr) in ("dict", "plain")


def test_random_bytes_falls_back_to_plain():
    arr = pa.array([rng.bytes(64) for _ in range(2_000)], pa.binary())
    assert choose_codec(arr) == "plain"


def test_auto_never_worse_than_plain_by_margin():
    vectors = [
        pa.array(np.full(20_000, 7, np.int64)),
        pa.array(rng.integers(0, 10, 20_000).astype(np.int64)),
        pa.array([f"path/{i % 50}/file" for i in range(20_000)]),
        pa.array([rng.bytes(32) for _ in range(1_000)], pa.binary()),
        pa.array(rng.random(20_000)),
    ]
    for arr in vectors:
        codec, blob = encode_auto(arr)
        plain = encode_array(arr, "plain")
        assert len(blob) <= len(plain) * 1.05, (codec, len(blob), len(plain))
        assert decode_array(blob).equals(arr)


def test_auto_roundtrips_everything():
    vectors = [
        pa.array([None, "a", None, "bb"] * 500),
        pa.array([], pa.int64()),
        pa.array([1], pa.int32()),
        pa.array([None] * 50, pa.float64()),
        pa.array(["日本語" * i for i in range(200)]),
    ]
    for arr in vectors:
        codec, blob = encode_auto(arr)
        out = decode_array(blob)
        assert out.equals(arr), codec
