"""Shared test helpers."""

import numpy as np
import pyarrow as pa


def assert_arrays_equal(out: pa.Array, ref: pa.Array, ctx=""):
    """Bit-exact logical equality; NaN-aware for float types."""
    assert out.type == ref.type, (ctx, out.type, ref.type)
    assert len(out) == len(ref), ctx
    if pa.types.is_floating(ref.type):
        mo = np.asarray(out.is_valid())
        mr = np.asarray(ref.is_valid())
        np.testing.assert_array_equal(mo, mr, err_msg=str(ctx))
        iv = np.int32 if ref.type == pa.float32() else np.int64
        vo = np.asarray(out.fill_null(0.0)).view(iv)
        vr = np.asarray(ref.fill_null(0.0)).view(iv)
        np.testing.assert_array_equal(vo[mr], vr[mr], err_msg=str(ctx))
    else:
        assert out.equals(ref), ctx
        assert out.to_pylist() == ref.to_pylist(), ctx
