"""Pallas kernel tests (interpret mode on CPU): fused dequant+matmul must
match the reference dequant->matmul path for every quant format."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_engine.gguf.constants import GGMLType
from tpu_engine.kernels import dequant_matmul as DM
from tpu_engine.model.weights import QTensor, dequant
from tpu_engine.quant import formats as F
from tpu_engine.quant.device_format import LAYOUTS, to_device_format

RNG = np.random.default_rng(11)


def make_qtensor(ty: GGMLType, n: int, k: int) -> tuple[QTensor, np.ndarray]:
    from tpu_engine.quant.device_format import (
        permute_group_transpose_i8, permute_group_transpose_nib4,
    )

    x = RNG.normal(size=(n, k)).astype(np.float32)
    raw = np.frombuffer(F.quantize(x, ty), np.uint8)
    dq = to_device_format(raw, ty, (n, k))
    if dq.layout.kind == "nib4":
        qs = permute_group_transpose_nib4(dq.qs, dq.layout.group)
    else:
        qs = permute_group_transpose_i8(dq.qs, dq.layout.group)
    qt = QTensor(
        qs=jnp.asarray(qs),
        scale=jnp.asarray(dq.scale),
        bias=jnp.asarray(dq.bias) if dq.bias is not None else None,
        kind=dq.layout.kind,
        group=dq.layout.group,
        shape=(n, k),
        perm=True,
    )
    return qt, np.asarray(dq.dequantize())


@pytest.mark.parametrize("ty", [GGMLType.Q4_K, GGMLType.Q8_0, GGMLType.Q6_K,
                                GGMLType.Q4_0, GGMLType.Q5_K, GGMLType.Q2_K,
                                GGMLType.Q3_K])
@pytest.mark.parametrize("m", [1, 8])
def test_pallas_qmm_matches_reference(ty, m):
    n, k = 256, 512
    qt, w = make_qtensor(ty, n, k)
    x = RNG.normal(size=(m, k)).astype(np.float32)

    def bf16(a):
        return np.asarray(jnp.asarray(a, jnp.bfloat16), np.float32)

    # the kernel computes with bf16 operands + f32 accumulation
    ref = bf16(x) @ bf16(w).T

    out = DM._qmm_2d(jnp.asarray(x), qt.qs, qt.scale, qt.bias,
                     kind=qt.kind, group=qt.group, n=n, k=k, interpret=True)
    assert out is not None, "kernel refused supported shape"
    got = np.asarray(out)
    denom = np.maximum(np.abs(ref), 1.0)
    assert np.max(np.abs(got - ref) / denom) < 5e-3
    # and stays in the ballpark of the exact f32 product (catches wrong
    # scale/permutation bugs, which produce O(1) relative errors)
    full = x @ w.T
    assert np.max(np.abs(got - full) / np.maximum(np.abs(full), 1.0)) < 0.25


def test_pallas_hook_in_forward(tmp_path):
    """Enable the Pallas path (interpret) and check model logits agree with
    the reference path on a quantized model."""
    from tests.models import build_test_gguf
    from tpu_engine.kvcache.cache import new_cache
    from tpu_engine.model.llama import forward_step
    from tpu_engine.model.loader import load_model

    path = str(tmp_path / "m.gguf")
    build_test_gguf(path, "q8_0", seed=5)
    lm = load_model(path)
    args = (
        jnp.asarray([[1, 270, 272, 274]], jnp.int32),
        jnp.asarray([0], jnp.int32),
        jnp.asarray([True]),
    )

    def run():
        cache = new_cache(lm.cfg.n_layer, 1, 16, lm.cfg.n_kv_head, lm.cfg.head_dim)
        logits, _, _ = forward_step(lm.weights, cache, *args, lm.cfg)
        return np.asarray(logits)

    ref = run()
    DM.enable(interpret=True)
    try:
        forward_step._clear_cache()  # type: ignore[attr-defined]
        got = run()
    finally:
        DM.disable()
        forward_step._clear_cache()  # type: ignore[attr-defined]
    denom = np.maximum(np.abs(ref), 1.0)
    assert np.max(np.abs(got - ref) / denom) < 2e-2


def test_fallback_on_odd_shapes():
    """Shapes that don't tile must silently fall back, not crash."""
    ty = GGMLType.Q8_0
    n, k = 96, 160  # not tileable to 128
    qt, w = make_qtensor(ty, n, k)
    x = RNG.normal(size=(2, k)).astype(np.float32)
    out = DM.pallas_qmatmul(jnp.asarray(x), qt)
    ref = x @ w.T
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


def make_qtensor_packed(ty: GGMLType, n: int, k: int) -> tuple[QTensor, np.ndarray]:
    from tpu_engine.quant.device_format import (
        permute_group_transpose_i8, permute_group_transpose_nib4,
        to_device_format, to_device_format_packed,
    )

    x = RNG.normal(size=(n, k)).astype(np.float32)
    raw = np.frombuffer(F.quantize(x, ty), np.uint8)
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
    ref = np.asarray(to_device_format(raw, ty, (n, k)).dequantize())
    return qt, ref


@pytest.mark.parametrize("ty", [GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K,
                                GGMLType.Q5_K, GGMLType.Q6_K])
@pytest.mark.parametrize("m", [1, 8])
def test_pallas_qmm_packed_matches_flat(ty, m):
    """The packed two-level scale kernel path computes the same product as
    the flat-scale path (both dequantize to identical bf16 weights)."""
    from tpu_engine.kernels.dequant_matmul import pallas_qmatmul

    n, k = 256, 512
    qt, w = make_qtensor_packed(ty, n, k)
    assert qt.packed
    x = RNG.normal(size=(m, k)).astype(np.float32)

    def bf16(a):
        return np.asarray(jnp.asarray(a, jnp.bfloat16), np.float32)

    ref = bf16(x) @ bf16(w).T
    old = DM._INTERPRET
    DM._INTERPRET = True
    try:
        out = pallas_qmatmul(jnp.asarray(x), qt)
    finally:
        DM._INTERPRET = old
    got = np.asarray(out)
    denom = np.maximum(np.abs(ref), 1.0)
    assert np.max(np.abs(got - ref) / denom) < 5e-3
    full = x @ w.T
    assert np.max(np.abs(got - full) / np.maximum(np.abs(full), 1.0)) < 0.25
