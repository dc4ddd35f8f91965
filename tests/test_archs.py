"""Model-family parity vs HF transformers (the reference's weekend matrix,
SURVEY.md section 4: llama3, gemma, gemma2, phi3, mistral, qwen2): tiny HF
model -> GGUF (llama.cpp per-arch conventions) -> our forward graph ->
logits match."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from tests.models import tokenizer_metadata
from tpu_engine.kvcache.cache import new_cache
from tpu_engine.model.llama import forward_step
from tpu_engine.model.loader import load_model
from tpu_engine.tools.convert import hf_llama_to_gguf

PROMPT = [1, 270, 272, 274, 280, 300, 310, 9]
VOCAB = 384


def tiny_gemma(seed=11):
    import torch
    from transformers import GemmaConfig, GemmaForCausalLM

    torch.manual_seed(seed)
    cfg = GemmaConfig(
        vocab_size=VOCAB, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=32,
        intermediate_size=128, max_position_embeddings=2048,
        rms_norm_eps=1e-6, rope_theta=10000.0,
        hidden_act="gelu_pytorch_tanh", attn_implementation="eager",
    )
    return GemmaForCausalLM(cfg).eval()


def tiny_gemma2(seed=12):
    import torch
    from transformers import Gemma2Config, Gemma2ForCausalLM

    torch.manual_seed(seed)
    cfg = Gemma2Config(
        vocab_size=VOCAB, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=32,
        intermediate_size=128, max_position_embeddings=2048,
        rms_norm_eps=1e-6, rope_theta=10000.0,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        query_pre_attn_scalar=16,  # != head_dim (32): exercises attn_scale
        sliding_window=4096,  # larger than any test sequence
        attn_implementation="eager",
    )
    return Gemma2ForCausalLM(cfg).eval()


def tiny_phi3(seed=13):
    import torch
    from transformers import Phi3Config, Phi3ForCausalLM

    torch.manual_seed(seed)
    cfg = Phi3Config(
        vocab_size=VOCAB, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, max_position_embeddings=2048,
        rms_norm_eps=1e-5, rope_theta=10000.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        attn_implementation="eager",
    )
    return Phi3ForCausalLM(cfg).eval()


def tiny_qwen2(seed=11):
    """Qwen2: attention bias (bq/bk/bv) + neox rope — the bias path the
    other families don't exercise."""
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(seed)
    cfg = Qwen2Config(
        vocab_size=VOCAB, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, max_position_embeddings=2048,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        attn_implementation="eager",
    )
    return Qwen2ForCausalLM(cfg).eval()


def hf_logits(hf, ids):
    import torch

    with torch.no_grad():
        out = hf(torch.tensor([ids], dtype=torch.long))
    return out.logits[0].float().numpy()


def tiny_llama_scaled(rope_scaling, seed=17):
    """Tiny HF llama with a rope_scaling config — the llama-3.1 / yarn /
    linear long-context families of the reference's weekend matrix
    (/root/reference/.github/scripts/e2e-test-server-weekend.py:30-35)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(seed)
    cfg = LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, max_position_embeddings=256,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        rope_scaling=rope_scaling, attn_implementation="eager",
    )
    return LlamaForCausalLM(cfg).eval()


@pytest.mark.parametrize("rs,expect", [
    ({"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
      "high_freq_factor": 4.0, "original_max_position_embeddings": 32},
     "freqs"),
    ({"rope_type": "yarn", "factor": 4.0,
      "original_max_position_embeddings": 32}, "yarn"),
    ({"rope_type": "linear", "factor": 4.0}, "linear"),
])
def test_rope_scaling_matches_hf(tmp_path, rs, expect):
    """llama-3.1-style factor curves (rope_freqs.weight), yarn, and linear
    rope scaling all reproduce HF logits — short positions AND positions
    beyond the original context (where unscaled rope would silently
    diverge)."""
    hf = tiny_llama_scaled(rs)
    path = str(tmp_path / "scaled.gguf")
    hf_llama_to_gguf(hf, path, "f32", tokenizer_metadata(VOCAB), name="l31")
    lm = load_model(path)
    if expect == "freqs":
        assert len(lm.cfg.rope_freqs) == lm.cfg.rope_dim // 2
        assert max(lm.cfg.rope_freqs) > 1.0  # low-freq dims carry the factor
    else:
        assert lm.cfg.rope_scaling_type == expect
        assert lm.cfg.rope_scaling == 4.0

    rng = np.random.RandomState(3)
    prompt = [1] + rng.randint(4, VOCAB, size=63).tolist()  # 64 > orig ctx 32
    ref = hf_logits(hf, prompt)

    # short position (within the original context)
    logits, _, _ = forward_step(
        lm.weights, new_cache(lm.cfg.n_layer, 1, 128, lm.cfg.n_kv_head,
                              lm.cfg.head_dim),
        jnp.asarray([prompt[:6]], jnp.int32), jnp.asarray([0], jnp.int32),
        jnp.asarray([True]), lm.cfg,
    )
    np.testing.assert_allclose(np.asarray(logits)[0], ref[5],
                               rtol=2e-3, atol=2e-3)

    # long position (beyond the original context)
    logits, _, _ = forward_step(
        lm.weights, new_cache(lm.cfg.n_layer, 1, 128, lm.cfg.n_kv_head,
                              lm.cfg.head_dim),
        jnp.asarray([prompt], jnp.int32), jnp.asarray([0], jnp.int32),
        jnp.asarray([True]), lm.cfg,
    )
    np.testing.assert_allclose(np.asarray(logits)[0], ref[-1],
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("builder,arch", [
    (tiny_gemma, "gemma"),
    (tiny_gemma2, "gemma2"),
    (tiny_phi3, "phi3"),
    (tiny_qwen2, "qwen2"),
])
def test_arch_logits_match_hf(tmp_path, builder, arch):
    hf = builder()
    path = str(tmp_path / f"{arch}.gguf")
    hf_llama_to_gguf(hf, path, "f32", tokenizer_metadata(VOCAB), name=arch)
    lm = load_model(path)
    assert lm.cfg.arch == arch

    cache = new_cache(lm.cfg.n_layer, 1, 64, lm.cfg.n_kv_head, lm.cfg.head_dim)
    logits, cache, _ = forward_step(
        lm.weights, cache, jnp.asarray([PROMPT], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
    )
    ref = hf_logits(hf, PROMPT)[-1]
    got = np.asarray(logits)[0]
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("builder,arch", [
    (tiny_gemma2, "gemma2"),
    (tiny_phi3, "phi3"),
])
def test_arch_decode_matches_prefill(tmp_path, builder, arch):
    """Stepwise decode through the cache equals full prefill."""
    hf = builder()
    path = str(tmp_path / f"{arch}.gguf")
    hf_llama_to_gguf(hf, path, "f32", tokenizer_metadata(VOCAB), name=arch)
    lm = load_model(path)

    full = PROMPT + [33, 77]
    logits_full, _, _ = forward_step(
        lm.weights, new_cache(lm.cfg.n_layer, 1, 64, lm.cfg.n_kv_head,
                              lm.cfg.head_dim),
        jnp.asarray([full], jnp.int32), jnp.asarray([0], jnp.int32),
        jnp.asarray([True]), lm.cfg,
    )
    _, cache, _ = forward_step(
        lm.weights, new_cache(lm.cfg.n_layer, 1, 64, lm.cfg.n_kv_head,
                              lm.cfg.head_dim),
        jnp.asarray([PROMPT], jnp.int32), jnp.asarray([0], jnp.int32),
        jnp.asarray([True]), lm.cfg,
    )
    for t in (33, 77):
        logits_step, cache, _ = forward_step(
            lm.weights, cache, jnp.asarray([[t]], jnp.int32),
            jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
        )
    np.testing.assert_allclose(np.asarray(logits_step), np.asarray(logits_full),
                               rtol=1e-4, atol=1e-4)


def test_phi3_fused_tensors_on_disk(tmp_path):
    """The phi3 GGUF keeps llama.cpp's fused attn_qkv / ffn_up layout and
    the loader consumes it directly as the fused fast path."""
    from tpu_engine.gguf.reader import read_gguf

    hf = tiny_phi3()
    path = str(tmp_path / "phi3.gguf")
    hf_llama_to_gguf(hf, path, "f32", tokenizer_metadata(VOCAB), name="phi3")
    g = read_gguf(path)
    try:
        assert "blk.0.attn_qkv.weight" in g.tensors
        assert "blk.0.ffn_gate.weight" not in g.tensors
        assert g.tensors["blk.0.ffn_up.weight"].shape[0] == 256  # 2 * n_ff
    finally:
        g.close()
    lm = load_model(path)
    assert "wqkv" in lm.weights["layers"]  # stacked (scanned) layer dict
    assert "w_gateup" in lm.weights["layers"]


def test_gemma2_sliding_window_matches_hf(tmp_path):
    """Small sliding window on a prompt longer than the window: our
    alternating local/global mask matches HF Gemma2's."""
    import torch
    from transformers import Gemma2Config, Gemma2ForCausalLM

    torch.manual_seed(21)
    cfg = Gemma2Config(
        vocab_size=VOCAB, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=32,
        intermediate_size=128, max_position_embeddings=2048,
        rms_norm_eps=1e-6, rope_theta=10000.0,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        query_pre_attn_scalar=32, sliding_window=6,
        attn_implementation="eager",
    )
    hf = Gemma2ForCausalLM(cfg).eval()
    path = str(tmp_path / "g2sw.gguf")
    hf_llama_to_gguf(hf, path, "f32", tokenizer_metadata(VOCAB), name="g2sw")
    lm = load_model(path)
    assert lm.cfg.sliding_window == 6 and lm.cfg.swa_alternate

    prompt = PROMPT + [33, 44, 55, 66]  # 12 tokens > window 6
    logits, _, _ = forward_step(
        lm.weights, new_cache(lm.cfg.n_layer, 1, 64, lm.cfg.n_kv_head,
                              lm.cfg.head_dim),
        jnp.asarray([prompt], jnp.int32), jnp.asarray([0], jnp.int32),
        jnp.asarray([True]), lm.cfg,
    )
    ref = hf_logits(hf, prompt)[-1]
    np.testing.assert_allclose(np.asarray(logits)[0], ref, rtol=2e-3, atol=2e-3)


def test_gemma2_sliding_window_decode(tmp_path):
    """Stepwise decode (cache path + in-flight) honors the window."""
    hf = tiny_gemma2()
    path = str(tmp_path / "g2.gguf")
    hf_llama_to_gguf(hf, path, "f32", tokenizer_metadata(VOCAB), name="g2")
    lm = load_model(path)
    lm.cfg.sliding_window, lm.cfg.swa_alternate = 5, True

    full = PROMPT + [33, 77]
    logits_full, _, _ = forward_step(
        lm.weights, new_cache(lm.cfg.n_layer, 1, 64, lm.cfg.n_kv_head,
                              lm.cfg.head_dim),
        jnp.asarray([full], jnp.int32), jnp.asarray([0], jnp.int32),
        jnp.asarray([True]), lm.cfg,
    )
    _, cache, _ = forward_step(
        lm.weights, new_cache(lm.cfg.n_layer, 1, 64, lm.cfg.n_kv_head,
                              lm.cfg.head_dim),
        jnp.asarray([PROMPT], jnp.int32), jnp.asarray([0], jnp.int32),
        jnp.asarray([True]), lm.cfg,
    )
    for t in (33, 77):
        logits_step, cache, _ = forward_step(
            lm.weights, cache, jnp.asarray([[t]], jnp.int32),
            jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
        )
    np.testing.assert_allclose(np.asarray(logits_step), np.asarray(logits_full),
                               rtol=1e-4, atol=1e-4)
