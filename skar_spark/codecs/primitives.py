"""Vectorized numpy primitives shared by the codecs.

These are the analog of the arrow2 compute kernels the reference leans on
(skar/src/query/execution/mod.rs uses arrow2's vectorized comparison /
filter kernels; the writer uses lexsort + slice — write_parquet.rs:83-153).
Everything here is O(n) numpy with no per-element Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

U64 = np.uint64


# ---------------------------------------------------------------------------
# exact bit packing
# ---------------------------------------------------------------------------

def bit_width(max_val: int) -> int:
    return int(max_val).bit_length()


def pack_bits(vals: np.ndarray, width: int) -> bytes:
    """Pack uint64 values into `width` bits each (LSB-first per value)."""
    n = len(vals)
    if n == 0 or width == 0:
        return b""
    if width % 8 == 0:
        # byte-aligned: the LSB-first stream is exactly each value's
        # low width/8 bytes concatenated — a pure slice, no bit math
        # (identical output bytes; the all-widths round-trip test pins
        # it against the general path)
        le = np.ascontiguousarray(vals, dtype="<u8").view(np.uint8)
        return np.ascontiguousarray(
            le.reshape(n, 8)[:, : width // 8]).tobytes()
    shifts = np.arange(width, dtype=U64)
    bits = ((vals[:, None] >> shifts) & U64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack_bits(buf: bytes, n: int, width: int) -> np.ndarray:
    if n == 0 or width == 0:
        return np.zeros(n, dtype=U64)
    need = -(-n * width // 8)
    if len(buf) < need:
        # fail loudly: np.unpackbits would silently zero-pad a short
        # buffer, decoding truncated input to plausible-looking zeros
        # (caught by the hypothesis truncation property)
        raise ValueError(
            f"bitpack buffer truncated: {len(buf)} bytes < {need} "
            f"needed for {n} values x {width} bits")
    if 5 <= width <= 57:
        # gather path: read the 8 bytes spanning each value as one
        # little-endian uint64, shift by the sub-byte offset, mask —
        # ~4 passes regardless of width vs O(width) shift-reduces
        # below (measured 2.5-14x for widths 5..57; the bit-matrix
        # path stays faster at 1-4 bits, and widths 58-64 can span
        # 9 bytes so they keep it too). Bit-identical by the shared
        # property fuzz.
        pad = np.zeros(need + 8, np.uint8)
        pad[:need] = np.frombuffer(buf, np.uint8, count=need)
        bit_off = np.arange(n, dtype=np.int64) * width
        shift = (bit_off & 7).astype(U64)
        chunk = pad[(bit_off >> 3)[:, None] + np.arange(8)]
        # explicit little-endian view: the packed stream is LE by
        # definition; a native-endian view would byte-swap on BE hosts
        vals = np.ascontiguousarray(chunk).view("<u8") \
            .astype(U64, copy=False).ravel()
        return (vals >> shift) & U64((1 << width) - 1)
    bits = np.unpackbits(np.frombuffer(buf, np.uint8), count=n * width,
                         bitorder="little").reshape(n, width).astype(U64)
    shifts = np.arange(width, dtype=U64)
    return np.bitwise_or.reduce(bits << shifts, axis=1)


# ---------------------------------------------------------------------------
# frame-of-reference / delta transforms (wraparound-safe via uint64 views)
# ---------------------------------------------------------------------------

def for_encode(vals_i64: np.ndarray) -> tuple[int, int, bytes]:
    """Frame-of-reference: subtract min, bitpack. Returns (ref, width, buf).

    Works on int64 (timestamps included) via two's-complement uint64
    arithmetic so any value range up to 2^64 is wraparound-safe.
    """
    n = len(vals_i64)
    if n == 0:
        return 0, 0, b""
    u = vals_i64.astype(np.int64, copy=False).view(U64)
    ref = int(vals_i64.min())
    diffs = u - np.int64(ref).astype(np.int64).view(U64)
    width = bit_width(int(diffs.max()))
    return ref, width, pack_bits(diffs, width)


def for_decode(ref: int, width: int, buf: bytes, n: int) -> np.ndarray:
    diffs = unpack_bits(buf, n, width)
    return (diffs + np.int64(ref).view(U64)).view(np.int64)


def delta_encode(vals_i64: np.ndarray) -> tuple[int, int, int, bytes]:
    """Delta + FOR + bitpack. Returns (first, ref, width, buf) over deltas."""
    n = len(vals_i64)
    if n == 0:
        return 0, 0, 0, b""
    first = int(vals_i64[0])
    u = vals_i64.view(U64)
    deltas = (u[1:] - u[:-1]).view(np.int64)  # wraparound two's-complement
    ref, width, buf = for_encode(deltas)
    return first, ref, width, buf


def delta_decode(first: int, ref: int, width: int, buf: bytes,
                 n: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    deltas = for_decode(ref, width, buf, n - 1).view(U64)
    out = np.empty(n, dtype=U64)
    out[0] = np.int64(first).view(U64)
    np.cumsum(deltas, out=out[1:])
    out[1:] += out[0]
    return out.view(np.int64)


# ---------------------------------------------------------------------------
# run-length detection
# ---------------------------------------------------------------------------

def rle_split(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Return (run_values, run_lengths) for a 1-d array."""
    n = len(vals)
    if n == 0:
        return vals[:0], np.zeros(0, dtype=np.int64)
    change = np.empty(n, dtype=bool)
    change[0] = True
    np.not_equal(vals[1:], vals[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    lengths = np.diff(np.append(starts, n)).astype(np.int64)
    return vals[starts], lengths


# ---------------------------------------------------------------------------
# arrow array <-> raw parts (zero/one-copy, offset-aware)
# ---------------------------------------------------------------------------

def numeric_values(arr: pa.Array, np_dtype: np.dtype) -> np.ndarray:
    """Raw fixed-width values of a (null-filled) numeric/timestamp array."""
    buf = arr.buffers()[1]
    return np.frombuffer(buf, dtype=np_dtype, count=len(arr),
                         offset=arr.offset * np_dtype.itemsize)


def string_parts(arr: pa.Array) -> tuple[np.ndarray, bytes]:
    """(normalized int64 offsets [n+1], data bytes) of a string/binary array.

    The array must have nulls filled (empty string) so offsets are monotone.
    Handles slice offsets; offsets are rebased to start at 0.
    """
    large = pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)
    odt = np.int64 if large else np.int32
    width = 8 if large else 4
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=odt, count=len(arr) + 1,
                         offset=arr.offset * width).astype(np.int64)
    start, end = int(offs[0]), int(offs[-1])
    if bufs[2] is None:
        data = b""
    else:
        data = np.frombuffer(bufs[2], np.uint8)[start:end].tobytes()
    return offs - start, data


def build_string(tcode: str, offs_i64: np.ndarray, data: bytes,
                 validity: pa.Buffer | None, null_count: int) -> pa.Array:
    from skar_spark.codecs.framing import type_from_code
    t = type_from_code(tcode)
    large = tcode in ("lstr", "lbin")
    offs = offs_i64 if large else offs_i64.astype(np.int32)
    n = len(offs_i64) - 1
    return pa.Array.from_buffers(
        t, n,
        [validity, pa.py_buffer(offs.tobytes()), pa.py_buffer(data)],
        null_count=null_count if validity is not None else 0)


def build_numeric(tcode: str, vals: np.ndarray,
                  validity: pa.Buffer | None, null_count: int) -> pa.Array:
    from skar_spark.codecs.framing import type_from_code
    t = type_from_code(tcode)
    return pa.Array.from_buffers(
        t, len(vals), [validity, pa.py_buffer(vals.tobytes())],
        null_count=null_count if validity is not None else 0)


def validity_to_bytes(arr: pa.Array) -> bytes:
    """Packed little-endian validity bits for an array with nulls."""
    mask = np.asarray(arr.is_valid())
    return np.packbits(mask, bitorder="little").tobytes()


def validity_from_bytes(buf: bytes, n: int) -> tuple[pa.Buffer, int]:
    if len(buf) < -(-n // 8):
        raise ValueError(
            f"validity buffer truncated: {len(buf)} bytes < {-(-n // 8)} "
            f"needed for {n} bits")
    bits = np.unpackbits(np.frombuffer(buf, np.uint8), count=n,
                         bitorder="little").astype(bool)
    null_count = int(n - bits.sum())
    return pa.py_buffer(np.packbits(bits, bitorder="little").tobytes()), null_count
