"""Device-format conversion must reproduce reference dequant bit-exactly."""

import numpy as np
import pytest

from tpu_engine.gguf.constants import GGML_BLOCK_INFO, GGMLType
from tpu_engine.quant import formats as F
from tpu_engine.quant.device_format import LAYOUTS, to_device_format

RNG = np.random.default_rng(2)


@pytest.mark.parametrize("ty", list(LAYOUTS))
def test_device_dequant_bit_exact(ty):
    blk, _ = GGML_BLOCK_INFO[ty]
    n, k = 4, 2 * blk
    x = RNG.normal(size=(n, k)).astype(np.float32) * 2.5
    raw = np.frombuffer(F.quantize(x, ty), np.uint8)
    ref = F.dequantize(raw, ty).reshape(n, k)
    dq = to_device_format(raw, ty, (n, k))
    got = dq.dequantize()
    # Exactness: scale/bias are f16 x <=6-bit-int products, exact in f32.
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("ty", list(LAYOUTS))
def test_device_layout_shapes(ty):
    blk, _ = GGML_BLOCK_INFO[ty]
    n, k = 2, 2 * blk
    x = RNG.normal(size=(n, k)).astype(np.float32)
    dq = to_device_format(np.frombuffer(F.quantize(x, ty), np.uint8), ty, (n, k))
    lay = LAYOUTS[ty]
    if lay.kind == "nib4":
        assert dq.qs.shape == (n, k // 2) and dq.qs.dtype == np.uint8
    else:
        assert dq.qs.shape == (n, k) and dq.qs.dtype == np.int8
    assert dq.scale.shape == (n, k // lay.group)
    if lay.has_bias:
        assert dq.bias.shape == (n, k // lay.group)
    else:
        assert dq.bias is None


@pytest.mark.parametrize("ty", list(LAYOUTS))
def test_group_transpose_roundtrip(ty):
    from tpu_engine.quant.device_format import (
        permute_group_transpose_i8, permute_group_transpose_nib4,
        unpermute_group_transpose_i8, unpermute_group_transpose_nib4,
    )

    blk, _ = GGML_BLOCK_INFO[ty]
    n, k = 4, 2 * blk
    x = RNG.normal(size=(n, k)).astype(np.float32)
    dq = to_device_format(np.frombuffer(F.quantize(x, ty), np.uint8), ty, (n, k))
    if dq.layout.kind == "nib4":
        p = permute_group_transpose_nib4(dq.qs, dq.layout.group)
        back = unpermute_group_transpose_nib4(p, dq.layout.group)
    else:
        p = permute_group_transpose_i8(dq.qs, dq.layout.group)
        back = unpermute_group_transpose_i8(p, dq.layout.group)
    np.testing.assert_array_equal(back, dq.qs)
    assert p.shape == dq.qs.shape
