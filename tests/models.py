"""Shared synthetic-model factory for tests.

No model files exist in the environment (zero egress), so every test builds
tiny random models: an HF transformers llama (the independent reference
implementation) converted to GGUF through our own converter.
"""

from __future__ import annotations

import numpy as np

from tpu_engine.tokenizer import TokenType

_WORDS = [
    "hello", "world", "the", "quick", "brown", "fox", "jumps", "over", "lazy",
    "dog", "a", "is", "of", "to", "and", "in", "it", "you", "that", "was",
    "for", "on", "are", "with", "as", "his", "they", "at", "be", "this",
    "have", "from", "or", "one", "had", "by", "word", "but", "not", "what",
]


def tokenizer_metadata(vocab_size: int) -> dict:
    """SPM-style tokenizer metadata with byte fallback + word pieces."""
    tokens = ["<unk>", "<s>", "</s>"]
    types = [int(TokenType.UNKNOWN), int(TokenType.CONTROL), int(TokenType.CONTROL)]
    scores = [0.0, 0.0, 0.0]
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        types.append(int(TokenType.BYTE))
        scores.append(0.0)
    specials = ["<|im_start|>", "<|im_end|>"]
    for s in specials:
        tokens.append(s)
        types.append(int(TokenType.CONTROL))
        scores.append(0.0)
    pieces = ["▁"]
    for w in _WORDS:
        pieces.append("▁" + w)
        pieces.append(w)
    # single characters for fallback merging
    for c in "abcdefghijklmnopqrstuvwxyz0123456789.,!?'\"":
        pieces.append(c)
    seen = set(tokens)
    for i, p in enumerate(pieces):
        if len(tokens) >= vocab_size:
            break
        if p in seen:
            continue
        seen.add(p)
        tokens.append(p)
        types.append(int(TokenType.NORMAL))
        scores.append(-float(i))
    i = 0
    while len(tokens) < vocab_size:
        tokens.append(f"<extra_{i}>")
        types.append(int(TokenType.UNUSED))
        scores.append(-1e9)
        i += 1
    return {
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.scores": scores,
        "tokenizer.ggml.token_type": types,
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
        "tokenizer.ggml.unknown_token_id": 0,
        "tokenizer.ggml.add_bos_token": True,
        "tokenizer.ggml.add_space_prefix": True,
    }


def tiny_hf_llama(
    vocab_size=384,
    hidden_size=256,
    n_layers=2,
    n_heads=4,
    n_kv_heads=2,
    intermediate_size=256,
    seed=0,
    tie=False,
):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(seed)
    cfg = LlamaConfig(
        vocab_size=vocab_size,
        hidden_size=hidden_size,
        num_hidden_layers=n_layers,
        num_attention_heads=n_heads,
        num_key_value_heads=n_kv_heads,
        intermediate_size=intermediate_size,
        max_position_embeddings=2048,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=tie,
        attn_implementation="eager",
    )
    model = LlamaForCausalLM(cfg)
    model.eval()
    return model


def build_test_gguf(path: str, quant="f32", **kw) -> str:
    from tpu_engine.tools.convert import hf_llama_to_gguf

    model = tiny_hf_llama(**kw)
    vocab = model.config.vocab_size
    hf_llama_to_gguf(model, path, quant, tokenizer_metadata(vocab), name="tiny-test")
    return path
