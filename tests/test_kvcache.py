"""Quantized KV cache (reference cache_type_k/v ∈ {f16,q8_0,q4_0},
llama_engine.cc:628-637): roundtrip bounds, forward-pass quality, seq ops
on quantized storage, engine integration."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.models import build_test_gguf
from tpu_engine.kvcache.cache import (
    dequant_kv,
    new_cache,
    quantize_kv_rows,
    seq_cp,
    shift_compact,
    trim,
)
from tpu_engine.model.llama import forward_step
from tpu_engine.model.loader import load_model

PROMPT = [1, 270, 272, 274, 280, 300, 310, 320, 9, 77, 123]


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    d = tmp_path_factory.mktemp("models")
    path = str(d / "tiny_f32.gguf")
    build_test_gguf(path, "f32", seed=3)
    return load_model(path)


@pytest.mark.parametrize("kind,rtol", [("q8_0", 0.01), ("q4_0", 0.08)])
def test_roundtrip_bounds(kind, rtol):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 7, 4, 64)).astype(np.float32)
    cells, scale = quantize_kv_rows(jnp.asarray(x), kind)
    back = np.asarray(dequant_kv(cells, scale, kind))
    amax = np.abs(x).max(-1, keepdims=True)
    assert np.abs(back - x).max() <= rtol * amax.max()
    # worst-case per element is half a quantization step of that row
    step = amax / (127.0 if kind == "q8_0" else 7.0)
    assert (np.abs(back - x) <= 0.5001 * step).all()


def test_q4_packing_shape():
    x = jnp.ones((2, 3, 8), jnp.float32)
    cells, scale = quantize_kv_rows(x, "q4_0")
    assert cells.shape == (2, 3, 4) and cells.dtype == jnp.uint8
    assert scale.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(dequant_kv(cells, scale, "q4_0")),
                               np.asarray(x), atol=1e-6)


def cache_for(lm, kind, n_slots=2, max_len=64):
    c = lm.cfg
    return new_cache(c.n_layer, n_slots, max_len, c.n_kv_head, c.head_dim,
                     kind=kind)


@pytest.mark.parametrize("kind,min_cos", [("f16", 0.9999), ("q8_0", 0.999),
                                          ("q4_0", 0.98)])
def test_forward_quality(tiny, kind, min_cos):
    """Quantized-KV logits stay close to the f32-KV logits."""
    lm = tiny

    def run(kind):
        logits, cache, _ = forward_step(
            lm.weights, cache_for(lm, kind),
            jnp.asarray([PROMPT], jnp.int32), jnp.asarray([0], jnp.int32),
            jnp.asarray([True]), lm.cfg,
        )
        return np.asarray(logits)[0], cache

    ref, _ = run("f32")
    got, cache = run(kind)
    assert np.isfinite(got).all()
    cos = float(np.dot(ref, got) / (np.linalg.norm(ref) * np.linalg.norm(got)))
    assert cos > min_cos, cos
    assert cache.kind == kind and int(cache.lengths[0]) == len(PROMPT)


@pytest.mark.parametrize("kind,min_cos", [("q8_0", 0.999), ("q4_0", 0.99)])
def test_decode_steps_quantized(tiny, kind, min_cos):
    """Greedy decode over a quantized cache runs and matches its own
    full-prefill logits. Exact equality is not expected: attention reads
    the step's own tokens in-flight at full precision (deferred append),
    so full prefill sees more unquantized history than stepwise decode."""
    lm = tiny
    full = PROMPT + [290, 291]
    logits_full, _, _ = forward_step(
        lm.weights, cache_for(lm, kind), jnp.asarray([full], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
    )
    _, cache, _ = forward_step(
        lm.weights, cache_for(lm, kind), jnp.asarray([PROMPT], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
    )
    for i, t in enumerate([290, 291]):
        logits_step, cache, _ = forward_step(
            lm.weights, cache, jnp.asarray([[t]], jnp.int32),
            jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
        )
    a, b = np.asarray(logits_step)[0], np.asarray(logits_full)[0]
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > min_cos, cos


@pytest.mark.parametrize("kind", ["q8_0", "q4_0"])
def test_seq_ops_preserve_quantized(tiny, kind):
    lm = tiny
    _, cache, _ = forward_step(
        lm.weights, cache_for(lm, kind), jnp.asarray([PROMPT], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
    )
    c2 = seq_cp(cache, jnp.int32(0), jnp.int32(1))
    assert c2.kind == kind and int(c2.lengths[1]) == len(PROMPT)
    for a in c2.k:
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(a[0]))
    for a in c2.k_scale:
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(a[0]))

    c3 = trim(c2, jnp.int32(0), jnp.int32(4))
    assert c3.kind == kind and int(c3.lengths[0]) == 4

    # shift: evict 2 cells after n_keep=1 -> cells [3..] slide to [1..]
    before = np.asarray(dequant_kv(cache.k[0][0], cache.k_scale[0][0], kind))
    c4 = shift_compact(cache, jnp.int32(0), jnp.int32(1), jnp.int32(2))
    after = np.asarray(dequant_kv(c4.k[0][0], c4.k_scale[0][0], kind))
    assert int(c4.lengths[0]) == len(PROMPT) - 2
    np.testing.assert_allclose(after[:, 2: len(PROMPT) - 2],
                               before[:, 4: len(PROMPT)], atol=1e-6)


@pytest.mark.parametrize("kind", ["f16", "q8_0", "q4_0"])
def test_engine_cache_type(tmp_path, kind):
    """cache_type wired through the serving engine (reference
    LoadModelImpl llama_engine.cc:628-647)."""
    from tpu_engine.serve.engine import InferenceEngine
    from tpu_engine.serve.types import CompletionParams, SamplingParams

    path = str(tmp_path / "tiny.gguf")
    build_test_gguf(path, "f32", seed=3)
    lm = load_model(path)
    eng = InferenceEngine(lm, n_ctx=128, n_parallel=2, cache_type=kind)
    assert eng.cache.kind == kind
    try:
        tid = eng.request_completion(CompletionParams(
            prompt="hello world", n_predict=6,
            sampling=SamplingParams(temperature=0.0)))
        final = None
        while final is None:
            r = eng.next_result(tid, timeout=120.0)
            assert not r.error, r.error_message
            if r.stop:
                final = r
        assert final.tokens_predicted > 0
        assert isinstance(final.text, str)
    finally:
        eng.shutdown()


@pytest.mark.parametrize("kind", ["f32", "f16", "q8_0", "q4_0"])
def test_dt_layout_matches_td(tiny, kind):
    """Transposed ("dt", [L,S,KH,D,T]) storage must produce the same
    logits and the same dequantized cell contents as the row-major
    layout: prefill -> two decode steps -> context shift."""
    lm = tiny
    c = lm.cfg

    def run(layout):
        cache = new_cache(c.n_layer, 2, 64, c.n_kv_head, c.head_dim,
                          kind=kind, layout=layout)
        logits, cache, _ = forward_step(
            lm.weights, cache, jnp.asarray([PROMPT], jnp.int32),
            jnp.asarray([0], jnp.int32), jnp.asarray([True]), c,
        )
        outs = [np.asarray(logits)]
        for t in (290, 291):
            logits, cache, _ = forward_step(
                lm.weights, cache, jnp.asarray([[t]], jnp.int32),
                jnp.asarray([0], jnp.int32), jnp.asarray([True]), c,
            )
            outs.append(np.asarray(logits))
        cache = shift_compact(cache, jnp.int32(0), jnp.int32(1), jnp.int32(2))
        logits, cache, _ = forward_step(
            lm.weights, cache, jnp.asarray([[292]], jnp.int32),
            jnp.asarray([0], jnp.int32), jnp.asarray([True]), c,
        )
        outs.append(np.asarray(logits))
        kcells = cache.k[0, 0]
        if layout == "dt":
            kcells = jnp.swapaxes(kcells, -1, -2)
        kd = np.asarray(dequant_kv(
            kcells, cache.k_scale[0, 0] if cache.k_scale is not None else None,
            kind))
        return outs, kd, int(cache.lengths[0])

    ref_outs, ref_k, ref_len = run("td")
    got_outs, got_k, got_len = run("dt")
    assert got_len == ref_len
    for a, b in zip(ref_outs, got_outs):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(ref_k, got_k, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kind", ["q8_0", "f16"])
def test_dt_seq_cp_and_trim(tiny, kind):
    lm = tiny
    c = lm.cfg
    cache = new_cache(c.n_layer, 2, 64, c.n_kv_head, c.head_dim,
                      kind=kind, layout="dt")
    _, cache, _ = forward_step(
        lm.weights, cache, jnp.asarray([PROMPT], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), c,
    )
    c2 = seq_cp(cache, jnp.int32(0), jnp.int32(1))
    assert c2.layout == "dt" and int(c2.lengths[1]) == len(PROMPT)
    np.testing.assert_array_equal(np.asarray(c2.k[0, 1]),
                                  np.asarray(c2.k[0, 0]))
    c3 = trim(c2, jnp.int32(0), jnp.int32(4))
    assert c3.layout == "dt" and int(c3.lengths[0]) == 4
