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


@pytest.mark.parametrize("ty", [GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K,
                                GGMLType.Q5_K, GGMLType.Q6_K])
def test_packed_matches_flat(ty):
    """Two-level packed scales reconstruct the flat f32 scale/bias exactly
    and carry identical quantized values — modulo the stored j-major group
    order (group_perm maps stored position -> natural group)."""
    from tpu_engine.quant.device_format import to_device_format_packed

    blk, _ = GGML_BLOCK_INFO[ty]
    n, k = 4, 2 * blk
    x = RNG.normal(size=(n, k)).astype(np.float32) * 2.5
    raw = np.frombuffer(F.quantize(x, ty), np.uint8)
    flat = to_device_format(raw, ty, (n, k))
    packed = to_device_format_packed(raw, ty, (n, k))
    perm = packed.group_perm()
    G = packed.layout.group
    if packed.layout.kind == "nib4":
        byte_cols = (perm[:, None] * (G // 2) + np.arange(G // 2)).reshape(-1)
        np.testing.assert_array_equal(packed.qs, flat.qs[:, byte_cols])
    else:
        cols = (perm[:, None] * G + np.arange(G)).reshape(-1)
        np.testing.assert_array_equal(packed.qs, flat.qs[:, cols])
    scale, bias = packed.scale_bias()
    np.testing.assert_array_equal(scale, flat.scale[:, perm])
    if flat.bias is None:
        assert bias is None
    else:
        np.testing.assert_array_equal(bias, flat.bias[:, perm])
    # HBM economy: the packed scale payload is under half the flat one
    flat_bytes = flat.scale.nbytes + (flat.bias.nbytes if flat.bias is not None else 0)
    packed_bytes = packed.d_dmin.nbytes + packed.sub.nbytes
    assert packed_bytes < flat_bytes / 2


@pytest.mark.parametrize("ty", [GGMLType.Q2_K, GGMLType.Q4_K, GGMLType.Q6_K])
def test_packed_qtensor_dequant(ty):
    """A packed QTensor dequantizes bit-identically to the flat QTensor."""
    import jax.numpy as jnp

    from tpu_engine.model.weights import QTensor, dequant
    from tpu_engine.quant.device_format import (
        permute_group_transpose_i8, permute_group_transpose_nib4,
        to_device_format_packed,
    )

    blk, _ = GGML_BLOCK_INFO[ty]
    n, k = 4, 2 * blk
    x = RNG.normal(size=(n, k)).astype(np.float32)
    raw = np.frombuffer(F.quantize(x, ty), np.uint8)
    flat = to_device_format(raw, ty, (n, k))
    dq = to_device_format_packed(raw, ty, (n, k))
    if dq.layout.kind == "nib4":
        qs = permute_group_transpose_nib4(dq.qs, dq.layout.group)
    else:
        qs = permute_group_transpose_i8(dq.qs, dq.layout.group)
    S = dq.d_dmin.shape[1]
    qt = QTensor(
        qs=jnp.asarray(qs),
        scale=jnp.asarray(np.concatenate([dq.d_dmin[:, i] for i in range(S)], axis=1).astype(np.float32)),
        bias=jnp.asarray(np.concatenate([dq.sub[:, i] for i in range(S)], axis=1).astype(np.int8)),
        kind=dq.layout.kind, group=dq.layout.group, shape=(n, k),
        perm=True, packed=True,
    )
    got = np.asarray(dequant(qt))
    np.testing.assert_array_equal(got, np.asarray(flat.dequantize(), np.float32))
