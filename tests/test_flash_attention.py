"""Pallas flash attention vs the XLA reference attention (interpret mode on
CPU), across KV kinds, decode/prefill shapes, self-extend, and mixed slot
lengths."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_engine.kernels.flash_attention import flash_attention
from tpu_engine.kvcache.cache import KVCache, quantize_kv_rows
from tpu_engine.model.config import ModelConfig
from tpu_engine.model.llama import apply_rope, attention_reference, self_extend_pos

RNG = np.random.default_rng(5)


def mk_cfg(H=4, KH=2, D=64, softcap=0.0):
    return ModelConfig(
        arch="llama", n_layer=1, n_embd=H * D, n_head=H, n_kv_head=KH,
        head_dim=D, n_ff=16, n_vocab=32, rms_eps=1e-5, rope_dim=D,
        rope_type="neox", rope_theta=10000.0, n_ctx_train=2048,
        attn_logit_softcap=softcap,
    )


def mk_case(cfg, B, Tc, T, kind="f32", starts=None, layout="td",
            rotated=False):
    """Build a 1-layer cache (history only, slot b holds starts[b] cells)
    plus this step's in-flight K/V rows (deferred-append design).
    rotated: store K pre-rotated by cell position (the rot_cache design —
    callers then pass rot_cache=True)."""
    H, KH, D = cfg.n_head, cfg.n_kv_head, cfg.head_dim
    q = jnp.asarray(RNG.normal(size=(B, Tc, H, D)), jnp.float32)
    k = jnp.asarray(RNG.normal(size=(1, B, KH, T, D)), jnp.float32)
    v = jnp.asarray(RNG.normal(size=(1, B, KH, T, D)), jnp.float32)
    if rotated:
        cell = jnp.arange(T, dtype=jnp.int32)[None, :].repeat(B, 0)
        k = jnp.swapaxes(apply_rope(
            jnp.swapaxes(k[0], 1, 2), cell, cfg), 1, 2)[None]
    if starts is None:
        starts = [max(0, T - Tc - 3 * i) for i in range(B)]
    q_pos = jnp.asarray([[s + t for t in range(Tc)] for s in starts], jnp.int32)
    lengths = jnp.asarray(starts, jnp.int32)
    if kind in ("q8_0", "q4_0"):
        kc, ks = quantize_kv_rows(k, kind)
        vc, vs = quantize_kv_rows(v, kind)
        if layout == "dt":
            kc, vc = jnp.swapaxes(kc, -1, -2), jnp.swapaxes(vc, -1, -2)
        cache = KVCache(kc, vc, lengths, ks, vs, kind, layout)
    else:
        kc, vc = k, v
        if layout == "dt":
            kc, vc = jnp.swapaxes(kc, -1, -2), jnp.swapaxes(vc, -1, -2)
        cache = KVCache(kc, vc, lengths, kind=kind, layout=layout)
    # in-flight rows: rotate K by the step positions (model/llama.py does
    # this before calling the hook)
    kn = jnp.asarray(RNG.normal(size=(B, Tc, KH, D)), jnp.float32)
    vn = jnp.asarray(RNG.normal(size=(B, Tc, KH, D)), jnp.float32)
    kn_rot = jnp.swapaxes(
        apply_rope(kn, self_extend_pos(q_pos, jnp.int32(1), jnp.int32(0)), cfg),
        1, 2)  # [B, KH, Tc, D]
    return q, (cache, kn_rot, jnp.swapaxes(vn, 1, 2)), q_pos


def run_both(cfg, q, case, q_pos, ga_n=1, ga_w=0, slot_ids=None, n_valid=None,
             rot_cache=False):
    cache, kn, vn = case
    B, Tc = q.shape[0], q.shape[1]
    if slot_ids is None:
        slot_ids = jnp.arange(B, dtype=jnp.int32)
    if n_valid is None:
        n_valid = jnp.full((B,), Tc, jnp.int32)
    ga_n, ga_w = jnp.int32(ga_n), jnp.int32(ga_w)
    ref = attention_reference(q, cache, 0, slot_ids, q_pos, n_valid, kn, vn,
                              cfg, ga_n, ga_w, rot_cache=rot_cache)
    got = flash_attention(q, cache, 0, slot_ids, q_pos, n_valid, kn, vn,
                          cfg, ga_n, ga_w, rot_cache=rot_cache)
    return np.asarray(ref), np.asarray(got)


@pytest.fixture(autouse=True)
def interpret_mode():
    import tpu_engine.kernels.flash_attention as FA

    FA._INTERPRET = True
    yield
    FA._INTERPRET = False


@pytest.mark.parametrize("kind", ["f32", "q8_0", "q4_0"])
def test_decode_matches_reference(kind):
    cfg = mk_cfg()
    q, case, q_pos = mk_case(cfg, B=4, Tc=1, T=160, kind=kind)
    ref, got = run_both(cfg, q, case, q_pos)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("kind", ["f32", "q8_0"])
def test_prefill_matches_reference(kind):
    cfg = mk_cfg()
    q, case, q_pos = mk_case(cfg, B=2, Tc=96, T=160, kind=kind, starts=[0, 0])
    ref, got = run_both(cfg, q, case, q_pos)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_continuation_prefill():
    """Prefill appended after an existing prefix (start > 0)."""
    cfg = mk_cfg()
    q, case, q_pos = mk_case(cfg, B=2, Tc=32, T=256, kind="f32", starts=[40, 7])
    ref, got = run_both(cfg, q, case, q_pos)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_mixed_lengths_decode():
    """Slots at very different context lengths in one batched step."""
    cfg = mk_cfg()
    q, case, q_pos = mk_case(cfg, B=4, Tc=1, T=640, kind="f32",
                              starts=[5, 130, 333, 639])
    ref, got = run_both(cfg, q, case, q_pos)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_slot_indirection():
    """slot_ids out of order: row b reads cache slot slot_ids[b]."""
    cfg = mk_cfg()
    q, case, q_pos = mk_case(cfg, B=3, Tc=1, T=128, kind="f32",
                             starts=[10, 40, 90])
    perm = jnp.asarray([2, 0, 1], jnp.int32)
    ref, got = run_both(cfg, q, case, q_pos[np.asarray(perm)],
                        slot_ids=perm)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_self_extend():
    cfg = mk_cfg()
    q, case, q_pos = mk_case(cfg, B=2, Tc=1, T=160, kind="f32")
    ref, got = run_both(cfg, q, case, q_pos, ga_n=4, ga_w=32)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_softcap_gqa1():
    cfg = mk_cfg(H=2, KH=2, D=64, softcap=50.0)
    q, case, q_pos = mk_case(cfg, B=2, Tc=8, T=64, kind="f32", starts=[3, 11])
    ref, got = run_both(cfg, q, case, q_pos)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_norm_rope_model_end_to_end(tmp_path):
    """A "norm"-rope GGUF runs through the flash kernel after the load-time
    de-interleave and matches the reference-attention logits."""
    from tests.models import build_test_gguf
    from tpu_engine.kernels import flash_attention as FA
    from tpu_engine.kvcache.cache import new_cache
    from tpu_engine.model.llama import forward_step
    from tpu_engine.model.loader import load_model

    path = str(tmp_path / "tiny.gguf")
    build_test_gguf(path, "f32", seed=3)
    lm = load_model(path)
    assert lm.cfg.rope_type == "neox"  # converted at load

    toks = jnp.asarray([[1, 270, 272, 274, 280]], jnp.int32)

    def run():
        cache = new_cache(lm.cfg.n_layer, 1, 64, lm.cfg.n_kv_head,
                          lm.cfg.head_dim)
        logits, _, _ = forward_step(
            lm.weights, cache, toks, jnp.asarray([0], jnp.int32),
            jnp.asarray([True]), lm.cfg,
        )
        return np.asarray(logits)

    ref = run()
    FA.enable(interpret=True)
    try:
        got = run()
    finally:
        FA.disable()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_sliding_window():
    """gemma2-style local attention: window mask in both kernels."""
    import dataclasses

    cfg0 = mk_cfg()
    cfg = dataclasses.replace(cfg0, sliding_window=24, swa_alternate=False)
    cfg.__class__ = cfg0.__class__
    # decode
    q, case, q_pos = mk_case(cfg, B=3, Tc=1, T=160, kind="f32",
                             starts=[10, 60, 159])
    ref, got = run_both(cfg, q, case, q_pos)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    # prefill
    q, case, q_pos = mk_case(cfg, B=2, Tc=32, T=256, kind="f32",
                             starts=[40, 100])
    ref, got = run_both(cfg, q, case, q_pos)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# transposed ("dt") cache layout (kvcache KVCache.layout): cells [KH, D, T]
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kind", ["f32", "f16", "q8_0", "q4_0"])
@pytest.mark.parametrize("rot", [False, True])
def test_dt_decode_matches_reference(kind, rot):
    cfg = mk_cfg()
    q, case, q_pos = mk_case(cfg, B=4, Tc=1, T=160, kind=kind,
                             layout="dt", rotated=rot)
    ref, got = run_both(cfg, q, case, q_pos, rot_cache=rot)
    # the rotated path feeds K/V to the MXU in stored form with q cast to
    # bf16 (the production fast path, same as the "td" bh kernel): ~2^-8
    # relative rounding vs the f32 reference
    tol = 3e-3 if (kind == "f16" or rot) else 2e-5
    np.testing.assert_allclose(got, ref, rtol=tol, atol=tol)


@pytest.mark.parametrize("kind", ["f32", "q8_0", "q4_0"])
@pytest.mark.parametrize("rot", [False, True])
def test_dt_prefill_matches_reference(kind, rot):
    cfg = mk_cfg()
    q, case, q_pos = mk_case(cfg, B=2, Tc=32, T=256, kind=kind,
                             starts=[40, 7], layout="dt", rotated=rot)
    ref, got = run_both(cfg, q, case, q_pos, rot_cache=rot)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_dt_mixed_lengths_decode():
    cfg = mk_cfg()
    q, case, q_pos = mk_case(cfg, B=4, Tc=1, T=640, kind="f32",
                             starts=[5, 130, 333, 639], layout="dt")
    ref, got = run_both(cfg, q, case, q_pos)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_dt_self_extend():
    cfg = mk_cfg()
    q, case, q_pos = mk_case(cfg, B=2, Tc=1, T=160, kind="f32", layout="dt")
    ref, got = run_both(cfg, q, case, q_pos, ga_n=4, ga_w=32)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_dt_sliding_window():
    import dataclasses

    cfg0 = mk_cfg()
    cfg = dataclasses.replace(cfg0, sliding_window=24, swa_alternate=False)
    cfg.__class__ = cfg0.__class__
    q, case, q_pos = mk_case(cfg, B=3, Tc=1, T=160, kind="f32",
                             starts=[10, 60, 159], layout="dt")
    ref, got = run_both(cfg, q, case, q_pos)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    q, case, q_pos = mk_case(cfg, B=2, Tc=32, T=256, kind="f32",
                             starts=[40, 100], layout="dt")
    ref, got = run_both(cfg, q, case, q_pos)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_dt_rope_dim_partial():
    """rope_dim < head_dim: the untouched tail must pass through both the
    rotation concat and the q4_0 sublane unpack."""
    cfg0 = mk_cfg()
    import dataclasses

    cfg = dataclasses.replace(cfg0, rope_dim=32)
    cfg.__class__ = cfg0.__class__
    q, case, q_pos = mk_case(cfg, B=2, Tc=1, T=128, kind="q8_0", layout="dt")
    ref, got = run_both(cfg, q, case, q_pos)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("kind", ["f32", "f16", "q8_0", "q4_0"])
def test_dt_dma_decode_matches_reference(kind):
    """The manual-DMA dynamic-block decode kernel (serving fast path:
    layout=dt + rot_cache + divisible T) vs the XLA reference."""
    cfg = mk_cfg()
    q, case, q_pos = mk_case(cfg, B=4, Tc=1, T=256, kind=kind,
                             starts=[0, 5, 130, 255], layout="dt",
                             rotated=True)
    ref, got = run_both(cfg, q, case, q_pos, rot_cache=True)
    # bf16 MXU inputs (cells + q) vs the all-f32 reference: ~2^-8 relative
    tol = 8e-3 if kind != "f32" else 2e-5
    np.testing.assert_allclose(got, ref, rtol=tol, atol=tol)


def test_dt_dma_decode_sliding_window():
    import dataclasses

    cfg0 = mk_cfg()
    cfg = dataclasses.replace(cfg0, sliding_window=24, swa_alternate=False)
    cfg.__class__ = cfg0.__class__
    q, case, q_pos = mk_case(cfg, B=3, Tc=1, T=256, kind="f32",
                             starts=[10, 60, 200], layout="dt", rotated=True)
    ref, got = run_both(cfg, q, case, q_pos, rot_cache=True)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
