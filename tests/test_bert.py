"""BERT-family embedding models: WordPiece tokenizer, bidirectional encoder
parity vs HF, pooling types, and the EncoderEngine serving surface — the
reference's dedicated embedding-model flow (nomic-embed loaded with
model_type: embedding, /root/reference/Makefile:6 +
.github/scripts/e2e-test-server.py phase 2)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from tpu_engine.model.loader import load_model
from tpu_engine.tokenizer.tokenizer import Tokenizer
from tpu_engine.tools.convert import hf_bert_to_gguf

WP_VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "the", "quick", "brown", "fox", "jump", "##s", "##ed", "##ing",
    "over", "lazy", "dog", "un", "##break", "##able", "hello", "world",
    "!", ",", ".", "ca", "##fe",
] + [f"tok{i}" for i in range(38)]  # pad vocab to 64


def wp_tokenizer_metadata():
    tt = [3 if t.startswith("[") and t.endswith("]") else 1 for t in WP_VOCAB]
    return {
        "tokenizer.ggml.model": "bert",
        "tokenizer.ggml.tokens": list(WP_VOCAB),
        "tokenizer.ggml.token_type": tt,
        "tokenizer.ggml.unknown_token_id": 1,
        "tokenizer.ggml.cls_token_id": 2,
        "tokenizer.ggml.seperator_token_id": 3,
        "tokenizer.ggml.padding_token_id": 0,
    }


def make_wp_tokenizer():
    return Tokenizer.from_gguf_metadata(wp_tokenizer_metadata())


def test_wordpiece_matches_hf():
    from transformers import BertTokenizer

    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        vocab_path = os.path.join(d, "vocab.txt")
        with open(vocab_path, "w") as f:
            f.write("\n".join(WP_VOCAB))
        hf_tok = BertTokenizer(vocab_path, do_lower_case=True)
        ours = make_wp_tokenizer()
        for text in (
            "the quick brown fox jumps over the lazy dog",
            "Unbreakable!",
            "hello, world.",
            "café hello",  # accent stripping
            "zzz unknown zzz",  # [UNK] fallback
            "  spaced   out  ",
        ):
            ref = hf_tok.encode(text)  # includes [CLS]/[SEP]
            got = ours.encode(text, add_special=True)
            assert got == ref, (text, got, ref)


def tiny_bert(seed=23, vocab=64):
    import torch
    from transformers import BertConfig, BertModel

    torch.manual_seed(seed)
    cfg = BertConfig(
        vocab_size=vocab, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=64, type_vocab_size=2,
        layer_norm_eps=1e-12, attn_implementation="eager",
    )
    return BertModel(cfg).eval()


def hf_bert_hidden(hf, ids_batch, mask):
    import torch

    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids_batch, dtype=torch.long),
                 attention_mask=torch.tensor(mask, dtype=torch.long))
    return out.last_hidden_state.float().numpy()


@pytest.mark.parametrize("pooling,ptype", [("mean", 1), ("cls", 2), ("last", 3)])
def test_bert_encode_matches_hf(tmp_path, pooling, ptype):
    hf = tiny_bert()
    path = str(tmp_path / "bert.gguf")
    hf_bert_to_gguf(hf, path, "f32", wp_tokenizer_metadata(),
                    pooling_type=ptype)
    lm = load_model(path)
    assert lm.cfg.arch == "bert" and not lm.cfg.causal
    assert lm.cfg.pooling_type == pooling

    from tpu_engine.model.bert import encode

    ids = [2, 5, 6, 7, 8, 3]  # [CLS] the quick brown fox [SEP]
    T = 8  # right-padded
    toks = np.zeros((1, T), np.int32)
    toks[0, : len(ids)] = ids
    got = np.asarray(encode(lm.weights, jnp.asarray(toks),
                            jnp.asarray([len(ids)], jnp.int32), lm.cfg))[0]

    hid = hf_bert_hidden(hf, [ids], [[1] * len(ids)])[0]  # [T, E]
    if pooling == "mean":
        ref = hid.mean(axis=0)
    elif pooling == "cls":
        ref = hid[0]
    else:
        ref = hid[-1]
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_encoder_engine_e2e(tmp_path):
    """registry /loadmodel with a bert GGUF -> EncoderEngine -> embeddings
    cosine-match HF mean pooling + L2; chat on it errors out."""
    from tpu_engine.serve.registry import EngineRegistry
    from tpu_engine.serve.types import CompletionParams

    hf = tiny_bert()
    path = str(tmp_path / "nomic.gguf")
    hf_bert_to_gguf(hf, path, "f32", wp_tokenizer_metadata(), pooling_type=1)

    reg = EngineRegistry()
    ok, msg = reg.load_model({
        "llama_model_path": path, "model": "embed", "ctx_len": 64,
        "model_type": "embedding",
    })
    assert ok, msg
    entry = reg.get("embed")
    engine = entry.engine

    text = "the quick brown fox"
    tid = engine.request_completion(
        CompletionParams(prompt=text, embedding=True, n_predict=0))
    r = engine.next_result(tid)
    assert not r.error and r.embedding

    ids = entry.model.tokenizer.encode(text, add_special=True)
    hid = hf_bert_hidden(hf, [ids], [[1] * len(ids)])[0]
    ref = hid.mean(axis=0)
    ref = ref / np.linalg.norm(ref)
    got = np.asarray(r.embedding)
    assert abs(float(got @ ref)) > 0.9999
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)

    # token-id input form works too
    tid = engine.request_completion(
        CompletionParams(prompt=ids, embedding=True, n_predict=0))
    r2 = engine.next_result(tid)
    np.testing.assert_allclose(np.asarray(r2.embedding), got,
                               rtol=1e-5, atol=1e-6)

    # chat on an embedding model is a clean per-request error
    tid = engine.request_completion(CompletionParams(prompt="hi", n_predict=4))
    r3 = engine.next_result(tid)
    assert r3.error and "embedding" in r3.error_message

    ok, _ = reg.unload_model("embed")
    assert ok


def test_causal_pooling_last(tmp_path):
    """Causal LLM embeddings use last-token pooling (the reference's
    pooling-NONE -> llama_get_embeddings_ith fallback,
    llama_server_context.cc:1042-1045)."""
    from tests.models import build_test_gguf
    from tpu_engine.model.llama import forward_step
    from tpu_engine.kvcache.cache import new_cache
    from tpu_engine.serve.engine import InferenceEngine
    from tpu_engine.serve.types import CompletionParams

    path = str(tmp_path / "m.gguf")
    build_test_gguf(path, "f32", seed=5)
    lm = load_model(path)
    assert lm.cfg.pooling_type == "last"

    eng = InferenceEngine(lm, n_ctx=128, n_parallel=1)
    try:
        prompt = "hello world test"
        tid = eng.request_completion(
            CompletionParams(prompt=prompt, embedding=True, n_predict=0))
        r = eng.next_result(tid)
        assert not r.error

        ids = lm.tokenizer.encode(prompt)
        _, _, pooled = forward_step(
            lm.weights,
            new_cache(lm.cfg.n_layer, 1, 32, lm.cfg.n_kv_head, lm.cfg.head_dim),
            jnp.asarray([ids], jnp.int32), jnp.asarray([0], jnp.int32),
            jnp.asarray([True]), lm.cfg, collect_hidden="last")
        ref = np.asarray(pooled)[0]
        ref = ref / np.linalg.norm(ref)
        np.testing.assert_allclose(np.asarray(r.embedding), ref,
                                   rtol=1e-4, atol=1e-5)
    finally:
        eng.shutdown()
