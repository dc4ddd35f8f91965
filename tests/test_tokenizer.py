"""Tokenizer tests: SPM merge behavior, BPE merges, byte fallback,
special-token parsing, streaming UTF-8 hold-back."""

import numpy as np

from tpu_engine.tokenizer import StreamDetokenizer, Tokenizer, TokenType


def make_spm_vocab():
    """Small SPM-style vocab with scores, byte tokens, and specials."""
    tokens = ["<unk>", "<s>", "</s>"]
    types = [TokenType.UNKNOWN, TokenType.CONTROL, TokenType.CONTROL]
    scores = [0.0, 0.0, 0.0]
    for b in range(256):  # byte fallback tokens
        tokens.append(f"<0x{b:02X}>")
        types.append(TokenType.BYTE)
        scores.append(0.0)
    vocab_words = [
        ("▁", -1.0), ("h", -10.0), ("e", -10.1), ("l", -10.2), ("o", -10.3),
        ("he", -5.0), ("ll", -5.5), ("hell", -3.0), ("hello", -2.0),
        ("▁hello", -1.5), ("▁world", -1.8), ("w", -10.4), ("r", -10.5), ("d", -10.6),
        ("wo", -7.0), ("wor", -6.0), ("worl", -5.8), ("world", -2.5),
        ("<|im_end|>", 0.0),
    ]
    for w, s in vocab_words:
        tokens.append(w)
        types.append(TokenType.CONTROL if w == "<|im_end|>" else TokenType.NORMAL)
        scores.append(s)
    md = {
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.scores": np.array(scores, np.float32),
        "tokenizer.ggml.token_type": np.array(types, np.int32),
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
        "tokenizer.ggml.unknown_token_id": 0,
        "tokenizer.ggml.add_bos_token": True,
    }
    return Tokenizer.from_gguf_metadata(md)


def test_spm_merge_and_roundtrip():
    tok = make_spm_vocab()
    ids = tok.encode("hello world")
    assert ids[0] == tok.bos_id
    pieces = [tok.tokens[i] for i in ids[1:]]
    assert pieces == ["▁hello", "▁world"]
    assert tok.decode(ids) == "hello world"


def test_spm_byte_fallback():
    tok = make_spm_vocab()
    ids = tok.encode("h\x01", add_special=False)
    # "▁h" not in vocab; symbols after merge: '▁','h','\x01' -> byte tokens
    assert all(0 <= i < tok.n_tokens for i in ids)
    assert tok.decode(ids) == "h\x01"


def test_special_token_parsing():
    tok = make_spm_vocab()
    imend = tok._piece_to_id["<|im_end|>"]
    ids = tok.encode("hello<|im_end|>", add_special=False, parse_special=True)
    assert imend in ids
    # without parse_special, the literal text gets tokenized char-by-char
    ids2 = tok.encode("hello<|im_end|>", add_special=False, parse_special=False)
    assert imend not in ids2


def test_is_eog():
    tok = make_spm_vocab()
    assert tok.is_eog(tok.eos_id)
    assert tok.is_eog(tok._piece_to_id["<|im_end|>"])
    assert not tok.is_eog(tok._piece_to_id["▁hello"])


def make_bpe_vocab():
    base = [chr(c) for c in range(33, 127)]  # printable ascii maps to itself
    tokens = ["<unk>", "<|endoftext|>"] + base + ["he", "ll", "hell", "hello", "Ġhello", "Ġ"]
    types = [TokenType.UNKNOWN, TokenType.CONTROL] + [TokenType.NORMAL] * (len(tokens) - 2)
    merges = ["h e", "l l", "he ll", "hell o", "Ġ hello"]
    md = {
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.token_type": np.array(types, np.int32),
        "tokenizer.ggml.merges": merges,
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 1,
        "tokenizer.ggml.unknown_token_id": 0,
        "tokenizer.ggml.add_bos_token": False,
    }
    return Tokenizer.from_gguf_metadata(md)


def test_bpe_merges():
    tok = make_bpe_vocab()
    ids = tok.encode("hello hello", add_special=False)
    pieces = [tok.tokens[i] for i in ids]
    assert pieces == ["hello", "Ġhello"]
    assert tok.decode(ids) == "hello hello"


def test_stream_detokenizer_utf8_holdback():
    tok = make_spm_vocab()
    # "é" = 0xC3 0xA9 : feed the two byte tokens separately
    d = StreamDetokenizer(tok)
    t1 = d.push(tok._byte_tokens[0xC3])
    assert t1 == ""  # held back
    t2 = d.push(tok._byte_tokens[0xA9])
    assert t2 == "é"
    # 4-byte emoji split across 4 byte tokens
    emoji = "🦙".encode("utf-8")
    out = ""
    for b in emoji[:-1]:
        out += d.push(tok._byte_tokens[b])
        assert out == ""
    out += d.push(tok._byte_tokens[emoji[-1]])
    assert out == "🦙"
    assert d.flush() == ""


def test_stream_detokenizer_strips_leading_space():
    tok = make_spm_vocab()
    d = StreamDetokenizer(tok)
    text = d.push(tok._piece_to_id["▁hello"])
    assert text == "hello"
    text += d.push(tok._piece_to_id["▁world"])
    assert text == "hello world"
