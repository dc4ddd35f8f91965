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


def test_ppl_deterministic(models):
    f32_path, _ = models
    lm = load_model(f32_path)
    a = compute_ppl(lm, TEXT, n_ctx=64)
    b = compute_ppl(lm, TEXT, n_ctx=64)
    assert a == b
