"""Codec kernels: framing, primitives, and the per-chunk auto-selector."""

from skar_spark.codecs.core import (  # noqa: F401
    canonicalize,
    codecs_for,
    decode_array,
    encode_array,
)
from skar_spark.codecs.selector import choose_codec, encode_auto  # noqa: F401
