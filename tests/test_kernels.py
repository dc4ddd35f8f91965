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


def make_qtensor(ty: GGMLType, n: int, k: int):
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
    return qt, np.asarray(dq.dequantize()), dq


def bf16(a):
    return np.asarray(jnp.asarray(a, jnp.bfloat16), np.float32)


def kernel_reference(x: np.ndarray, dq) -> np.ndarray:
    """Numerics-matched reference for the fused kernel: scaled values are
    bf16(q * scale) (f32 multiply) fed to a f32-accumulating dot, and the
    per-group bias folds in as an xsum dot (see _bias_dot; in-kernel it
    is a manual bf16x3 split, ~2^-16 relative). Tight: catches structural
    bugs (wrong scale order/permutation) the loose checks cannot."""
    n, k = dq.shape
    G = dq.layout.group
    if dq.layout.kind == "nib4":
        q = np.empty((n, k), np.float32)
        q[:, 0::2] = (dq.qs & 0x0F).astype(np.float32)
        q[:, 1::2] = (dq.qs >> 4).astype(np.float32)
    else:
        q = dq.qs.astype(np.float32)
    sc = np.repeat(dq.scale, G, axis=1)
    wq = bf16(q * sc)
    y = bf16(x) @ wq.T
    if dq.bias is not None:
        xs = bf16(x).reshape(x.shape[0], k // G, G).sum(axis=2)
        y = y + xs @ dq.bias.T
    return y


@pytest.mark.parametrize("ty", [GGMLType.Q4_K, GGMLType.Q8_0, GGMLType.Q6_K,
                                GGMLType.Q4_0, GGMLType.Q5_K, GGMLType.Q2_K,
                                GGMLType.Q3_K])
@pytest.mark.parametrize("m", [1, 8])
def test_pallas_qmm_matches_reference(ty, m):
    n, k = 256, 512
    qt, w, dq = make_qtensor(ty, n, k)
    x = RNG.normal(size=(m, k)).astype(np.float32)

    # the real entry point pads rows to a multiple of 8 — calling _qmm_2d
    # with m=1 directly hits an interpret-only XLA fusion that skips the
    # intermediate bf16 rounding (real Mosaic matches the reference at
    # every m; verified on TPU)
    old = DM._INTERPRET
    DM._INTERPRET = True
    try:
        out = DM.pallas_qmatmul(jnp.asarray(x), qt)
    finally:
        DM._INTERPRET = old
    got = np.asarray(out)
    # tight structural check vs the numerics-matched reference
    ref = kernel_reference(x, dq)
    denom = np.maximum(np.abs(ref), 1.0)
    # 1e-3: the in-kernel bias dot is a manual bf16x3 split (error ~2^-16
    # of the bias magnitude); structural bugs produce >=0.1
    assert np.max(np.abs(got - ref) / denom) < 1e-3
    # quantization-level sanity vs the f32-dequant product. Loose by
    # design (structural bugs produce >=O(1) errors, caught above):
    # the kernel rounds q*sc to bf16 BEFORE the separately-exact
    # bias dot, so for offset formats the rounding no longer cancels
    # against b the way bf16(q*sc+b) does — worst-case ~2x bf16 noise,
    # still ~6x under the Q4 quantization error itself.
    full = x @ w.T
    assert np.max(np.abs(got - full) / np.maximum(np.abs(full), 1.0)) < 0.75


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
    qt, w, _ = make_qtensor(ty, n, k)
    x = RNG.normal(size=(2, k)).astype(np.float32)
    out = DM.pallas_qmatmul(jnp.asarray(x), qt)
    ref = x @ w.T
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("ty", [GGMLType.Q4_K, GGMLType.Q6_K])
@pytest.mark.parametrize("m", [1, 8])
def test_pallas_qmm_lane_padded_matches_unpadded(ty, m):
    """Lane-aligned group-cycle padding (QTensor.k_pad): a tensor whose
    ng = K/group is not a multiple of 128 (llama-7B w_down has ng=344)
    gets zero groups appended; the kernel result must equal the unpadded
    layout bit-for-bit, and dequant() must strip the pad columns."""
    from tpu_engine.model.weights import lane_pad_group_cycle

    n, k = 256, 1024  # Q4_K: ng = 32 -> pads to 128; Q6_K: ng = 64 -> 128
    qt, w, dq = make_qtensor(ty, n, k)
    qs_p, sc_p, b_p, k_pad = lane_pad_group_cycle(
        np.asarray(qt.qs), np.asarray(qt.scale),
        None if qt.bias is None else np.asarray(qt.bias), qt.group, k)
    assert k_pad > k
    qt_pad = QTensor(qs=jnp.asarray(qs_p), scale=jnp.asarray(sc_p),
                     bias=None if b_p is None else jnp.asarray(b_p),
                     kind=qt.kind, group=qt.group, shape=(n, k), perm=True,
                     k_pad=k_pad)
    np.testing.assert_allclose(np.asarray(dequant(qt_pad)),
                               np.asarray(dequant(qt)), rtol=0, atol=0)
    x = RNG.normal(size=(m, k)).astype(np.float32)
    old = DM._INTERPRET
    DM._INTERPRET = True
    try:
        out_pad = np.asarray(DM.pallas_qmatmul(jnp.asarray(x), qt_pad))
        out = np.asarray(DM.pallas_qmatmul(jnp.asarray(x), qt))
    finally:
        DM._INTERPRET = old
    denom = np.maximum(np.abs(out), 1.0)
    assert np.max(np.abs(out_pad - out) / denom) < 2e-3


def make_qtensor_packed(ty: GGMLType, n: int, k: int):
    """(packed QTensor, flat-dequant w, flat QTensor from the same
    raw bytes — the numerics-matched comparison target)."""
    from tpu_engine.quant.device_format import (
        permute_group_transpose_i8, permute_group_transpose_nib4,
        to_device_format, to_device_format_packed,
    )

    x = RNG.normal(size=(n, k)).astype(np.float32)
    raw = np.frombuffer(F.quantize(x, ty), np.uint8)
    flat = to_device_format(raw, ty, (n, k))
    if flat.layout.kind == "nib4":
        fqs = permute_group_transpose_nib4(flat.qs, flat.layout.group)
    else:
        fqs = permute_group_transpose_i8(flat.qs, flat.layout.group)
    qt_flat = QTensor(
        qs=jnp.asarray(fqs),
        scale=jnp.asarray(flat.scale),
        bias=jnp.asarray(flat.bias) if flat.bias is not None else None,
        kind=flat.layout.kind, group=flat.layout.group, shape=(n, k),
        perm=True,
    )
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
    return qt, np.asarray(flat.dequantize()), qt_flat


@pytest.mark.parametrize("ty", [GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K,
                                GGMLType.Q5_K, GGMLType.Q6_K])
@pytest.mark.parametrize("m", [1, 8])
def test_pallas_qmm_packed_matches_flat(ty, m):
    """The packed two-level scale kernel path computes the same product as
    the flat-scale path (both dequantize to identical bf16 weights)."""
    from tpu_engine.kernels.dequant_matmul import pallas_qmatmul

    n, k = 256, 512
    qt, w, qt_flat = make_qtensor_packed(ty, n, k)
    assert qt.packed
    x = RNG.normal(size=(m, k)).astype(np.float32)

    old = DM._INTERPRET
    DM._INTERPRET = True
    try:
        out = pallas_qmatmul(jnp.asarray(x), qt)
        out_flat = pallas_qmatmul(jnp.asarray(x), qt_flat)
    finally:
        DM._INTERPRET = old
    got = np.asarray(out)
    # the packed path reconstructs the exact same f32 scales in-kernel, so
    # both paths feed identical bf16 weights to the dot: tight match
    ref = np.asarray(out_flat)
    denom = np.maximum(np.abs(ref), 1.0)
    assert np.max(np.abs(got - ref) / denom) < 1e-3
    full = x @ w.T
    assert np.max(np.abs(got - full) / np.maximum(np.abs(full), 1.0)) < 0.75
