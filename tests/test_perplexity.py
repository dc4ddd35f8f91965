"""Perplexity gate: quantized ppl must stay close to the f32 reference
(BASELINE.md quality gate; methodology in tools/perplexity.py)."""

import os

import pytest

from tests.models import build_test_gguf
from tpu_engine.model.loader import load_model
from tpu_engine.tools.convert import requantize_gguf
from tpu_engine.tools.perplexity import compute_ppl

TEXT = " ".join(
    f"the quick brown fox {i} jumps over the lazy dog and runs far away"
    for i in range(40)
)


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    d = tmp_path_factory.mktemp("ppl")
    f32 = os.path.join(d, "m_f32.gguf")
    q4 = os.path.join(d, "m_q4.gguf")
    build_test_gguf(f32, "f32", seed=7)
    requantize_gguf(f32, q4, "q4_k_m")
    return f32, q4


def test_ppl_f32_vs_q4(models):
    f32_path, q4_path = models
    lm32 = load_model(f32_path)
    ppl32, n32, _ = compute_ppl(lm32, TEXT, n_ctx=64)
    lmq4 = load_model(q4_path)
    pplq4, nq4, _ = compute_ppl(lmq4, TEXT, n_ctx=64)
    assert n32 == nq4 > 0
    assert ppl32 > 0 and pplq4 > 0
    # quality gate: the tiny random model is noise-sensitive, but Q4_K_M of
    # the same weights must stay within 25% relative ppl of the f32 run
    assert abs(pplq4 - ppl32) / ppl32 < 0.25


def test_ppl_deeper_model_tight_gate(tmp_path):
    """A deeper (4-layer 'mini') model tightens the gate to a few percent
    (llama.cpp's published Q4_K_M WikiText-2 band is <1% on trained
    weights; random weights are more quantization-sensitive). Also gates
    the q8_0-KV path: near-lossless KV must stay within a fraction of the
    weight-quant delta. Scale evidence (1.1B) lives in PPL_r03.json via
    scripts/ppl_gate.py."""
    from tpu_engine.tools.synthetic import build_synthetic_gguf

    f32 = str(tmp_path / "mini_f32.gguf")
    q4 = str(tmp_path / "mini_q4.gguf")
    build_synthetic_gguf(f32, "mini", "f32", seed=3)
    requantize_gguf(f32, q4, "q4_k_m")

    lm32 = load_model(f32)
    ppl32, n32, _ = compute_ppl(lm32, TEXT, n_ctx=64)
    lmq4 = load_model(q4)
    pplq4, nq4, _ = compute_ppl(lmq4, TEXT, n_ctx=64)
    assert n32 == nq4 > 0
    assert abs(pplq4 - ppl32) / ppl32 < 0.05, (ppl32, pplq4)

    # quantized KV on the same q4 weights: q8_0 is near-lossless
    pplq4_kv8, _, _ = compute_ppl(lmq4, TEXT, n_ctx=64, kv_kind="q8_0")
    assert abs(pplq4_kv8 - pplq4) / pplq4 < 0.02, (pplq4, pplq4_kv8)


def test_ppl_deterministic(models):
    f32_path, _ = models
    lm = load_model(f32_path)
    a = compute_ppl(lm, TEXT, n_ctx=64)
    b = compute_ppl(lm, TEXT, n_ctx=64)
    assert a == b


def test_ppl_bf16_scales_matches_f32_scales(tmp_path, monkeypatch):
    """bf16 flat-scale storage (TPU_ENGINE_BF16_SCALES=1) perturbs each
    group scale by <= 2^-9 relative — its ppl must sit on top of the
    f32-scale run (well inside the weight-quant delta)."""
    from tpu_engine.tools.synthetic import build_synthetic_gguf

    f32 = str(tmp_path / "mini_f32.gguf")
    q4 = str(tmp_path / "mini_q4.gguf")
    build_synthetic_gguf(f32, "mini", "f32", seed=3)
    requantize_gguf(f32, q4, "q4_k_m")

    monkeypatch.setenv("TPU_ENGINE_BF16_SCALES", "0")
    ppl_f32sc, n0, _ = compute_ppl(load_model(q4), TEXT, n_ctx=64)
    monkeypatch.setenv("TPU_ENGINE_BF16_SCALES", "1")
    ppl_bf16sc, n1, _ = compute_ppl(load_model(q4), TEXT, n_ctx=64)
    assert n0 == n1 > 0
    assert abs(ppl_bf16sc - ppl_f32sc) / ppl_f32sc < 0.01, (
        ppl_f32sc, ppl_bf16sc)
