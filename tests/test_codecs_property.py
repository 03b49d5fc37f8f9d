"""Property-based codec fuzzing (hypothesis): the bit-identity
invariant must hold for EVERY input, not just the curated vectors in
test_codecs.py — adversarial strings, nulls, NaN/Inf floats, extreme
ints, empty/constant arrays. SURVEY §5's test model (golden vectors)
plus randomized roundtrips; pure-python layer, no Spark session."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from skar_spark.codecs import canonicalize, decode_array, encode_auto

SET = settings(max_examples=60, deadline=None)


def _roundtrip_equal(arr: pa.Array):
    codec, blob = encode_auto(arr)
    out = decode_array(blob)
    want = canonicalize(arr)
    assert len(out) == len(want)
    return codec, out, want


@given(st.lists(st.integers(-(2 ** 62), 2 ** 62), max_size=800))
@SET
def test_int64_roundtrip(xs):
    _codec, out, want = _roundtrip_equal(pa.array(xs, pa.int64()))
    assert out.equals(want)


@given(st.lists(st.one_of(st.none(),
                          st.integers(0, 2 ** 40)), max_size=500))
@SET
def test_int_with_nulls_roundtrip(xs):
    # nulls canonicalize to 0 (the engine stores filled arrays; the
    # documents schema is non-null by contract)
    _codec, out, want = _roundtrip_equal(pa.array(xs, pa.int64()))
    assert out.equals(want)


@given(st.lists(st.floats(allow_nan=True, allow_infinity=True,
                          width=64), max_size=500))
@SET
def test_float64_roundtrip_bitwise(xs):
    arr = pa.array(xs, pa.float64())
    _codec, out, want = _roundtrip_equal(arr)
    # NaN-aware: compare the raw bit patterns, not float equality
    ob = np.asarray(out.to_numpy(zero_copy_only=False)).view(np.uint64)
    wb = np.asarray(want.to_numpy(zero_copy_only=False)).view(np.uint64)
    assert np.array_equal(ob, wb)


@given(st.lists(st.text(max_size=60), max_size=400))
@SET
def test_string_roundtrip(xs):
    _codec, out, want = _roundtrip_equal(pa.array(xs, pa.string()))
    assert out.equals(want)


@given(st.lists(st.binary(max_size=80), max_size=300))
@SET
def test_binary_roundtrip(xs):
    _codec, out, want = _roundtrip_equal(pa.array(xs, pa.binary()))
    assert out.equals(want)


@given(st.lists(st.booleans(), max_size=900))
@SET
def test_bool_roundtrip(xs):
    _codec, out, want = _roundtrip_equal(pa.array(xs, pa.bool_()))
    assert out.equals(want)


@given(st.integers(0, 2 ** 40), st.integers(1, 600))
@SET
def test_constant_runs_roundtrip(v, n):
    # RLE's best case must also be its correct case
    _codec, out, want = _roundtrip_equal(pa.array([v] * n, pa.int64()))
    assert out.equals(want)


@given(st.lists(st.integers(0, 2 ** 40), min_size=8, max_size=200),
       st.data())
@SET
def test_truncated_blob_never_returns_wrong_data(xs, data):
    """Safety: a truncated encoded blob must either raise or decode to
    EXACTLY what the full blob decodes to (a cut that only removes
    unconsumed trailing bytes is harmless) — it must never silently
    yield different, plausible-looking data. The part-level checksum is
    the second line of defense; this framing property is the first."""
    _codec, blob = encode_auto(pa.array(xs, pa.int64()))
    cut = data.draw(st.integers(1, max(1, len(blob) - 1)))
    try:
        out = decode_array(blob[:cut])
    except Exception:
        return  # raising is the expected behavior
    assert out.equals(decode_array(blob))


def test_timestamp_roundtrip_us():
    ts = pa.array([0, 1, 10 ** 15, None, 42], pa.timestamp("us"))
    _codec, out, want = _roundtrip_equal(ts)
    assert out.equals(want)


@pytest.mark.parametrize("typ", [pa.int64(), pa.string(), pa.float64()])
def test_empty_array_roundtrip(typ):
    _codec, out, want = _roundtrip_equal(pa.array([], typ))
    assert len(out) == 0


@given(st.lists(st.one_of(
    st.none(),
    st.lists(st.floats(allow_nan=False, allow_infinity=True, width=32),
             max_size=12)), max_size=120))
@SET
def test_list_float32_roundtrip(xs):
    arr = pa.array(xs, pa.list_(pa.float32()))
    codec, out, want = _roundtrip_equal(arr)
    # nulls canonicalize to empty-extent null slots; logical equality
    assert out.is_valid().to_pylist() == [x is not None for x in xs]
    assert out.to_pylist() == canonicalize(want).to_pylist()
