"""xxh64 + split-block bloom filter (sbbf).

Mirror of the reference's pruning index: skar builds wyhash-keyed
split-block bloom filters, 8 bits/key, per row group and per folder over
the distinct address/topic sets (skar/src/build_parquet_idx.rs:96-115,
181-189; sbbf-rs crate). We standardize on xxh64 as the key hash (public
domain algorithm; also matches Spark's built-in ``xxhash64`` family) and
implement the same split-block layout as Parquet's bloom filter spec:
32-byte blocks, 8 sub-words, one bit set per sub-word.

xxh64 here is a faithful pure-Python implementation of the XXH64
algorithm (Yann Collet, public domain spec) — used for small key sets
(distinct hosts per partition); bulk checksums use hashlib instead.
"""

from __future__ import annotations

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 of `data` (spec-faithful, for small inputs)."""
    n = len(data)
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        i = 0
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M
        i = 0
    h = (h + n) & _M
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# split-block bloom (parquet sbbf layout: 32-byte blocks, 8×u32 sub-words)
# ---------------------------------------------------------------------------

_SALT = np.array([0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
                  0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31],
                 dtype=np.uint32)


class SplitBlockBloom:
    def __init__(self, num_keys: int, bits_per_key: int = 8):
        nbytes = max(32, 1 << int(np.ceil(np.log2(
            max(32, num_keys * bits_per_key // 8)))))
        self.blocks = np.zeros((nbytes // 32, 8), dtype=np.uint32)

    @classmethod
    def from_bytes(cls, buf: bytes) -> "SplitBlockBloom":
        b = cls.__new__(cls)
        b.blocks = np.frombuffer(buf, dtype=np.uint32).reshape(-1, 8).copy()
        return b

    def to_bytes(self) -> bytes:
        return self.blocks.tobytes()

    def _mask(self, h: int) -> tuple[int, np.ndarray]:
        blk = (h >> 32) % self.blocks.shape[0]
        x = np.uint32(h & 0xFFFFFFFF)
        mult = (x * _SALT).astype(np.uint32)
        return int(blk), np.uint32(1) << (mult >> np.uint32(27))

    def add_hash(self, h: int) -> None:
        blk, mask = self._mask(h)
        self.blocks[blk] |= mask

    def check_hash(self, h: int) -> bool:
        blk, mask = self._mask(h)
        return bool(((self.blocks[blk] & mask) == mask).all())

    def add(self, key: bytes) -> None:
        self.add_hash(xxh64(key))

    def check(self, key: bytes) -> bool:
        return self.check_hash(xxh64(key))


def bloom_from_keys(keys, bits_per_key: int = 8) -> bytes:
    keys = list(keys)
    b = SplitBlockBloom(max(1, len(keys)), bits_per_key)
    for k in keys:
        b.add(k if isinstance(k, bytes) else str(k).encode())
    return b.to_bytes()


def bloom_might_contain(buf: bytes, key) -> bool:
    b = SplitBlockBloom.from_bytes(buf)
    return b.check(key if isinstance(key, bytes) else str(key).encode())
