"""Pre-tokenizer variant parity (tokenizer.ggml.pre).

Trains a small byte-level BPE with HF `tokenizers` (local, no downloads)
configured with the llama3 / qwen2 split regexes, then asserts our
Tokenizer produces identical ids end-to-end. This pins the behavior the
reference reaches through common_tokenize
(/root/reference/src/llama_server_context.cc:395-410) for GGUFs whose
`pre` is not the gpt2 default.
"""

import numpy as np
import pytest

from tpu_engine.tokenizer import Tokenizer, TokenType
from tpu_engine.tokenizer.pretokenizers import LLAMA3, QWEN2, PreTokenizer

CORPUS = [
    "The quick brown fox jumps over the lazy dog.",
    "In 2024, 12345 items cost $6789.01 — that's 99.5% more!",
    "def f(x):\n    return x**2  # comment\n\n\nprint(f(10))",
    "Mixtures of    spaces\tand\ttabs and\r\nwindows newlines",
    "HE'S, he's, HE'LL, we've, I'd, I'M, you're",
    "naïve café résumé Ünïcödé 北京 東京 서울 🦙🚀",
    "a1b2c3 x86_64 IPv6: ::1 2001:db8::ff00:42:8329",
]

TEST_TEXTS = CORPUS + [
    "hello world",
    "  leading and trailing  ",
    "1234567890",
    "żółć, Москва, الرياض, תל אביב",
    "e=mc^2; πr²",
    "'s's's 'T'LL",
]


def _train_hf(regex_str: str, ignore_merges: bool):
    from tokenizers import Regex, Tokenizer as HFTokenizer, models, pre_tokenizers, trainers

    hf = HFTokenizer(models.BPE(unk_token=None, ignore_merges=ignore_merges))
    hf.pre_tokenizer = pre_tokenizers.Sequence([
        pre_tokenizers.Split(Regex(regex_str), behavior="isolated"),
        pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
    ])
    trainer = trainers.BpeTrainer(
        vocab_size=700, show_progress=False, special_tokens=[],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    hf.train_from_iterator(CORPUS * 4, trainer)
    return hf


def _ours_from_hf(hf, pre: str) -> Tokenizer:
    vocab = hf.get_vocab()
    tokens = [None] * len(vocab)
    for piece, tid in vocab.items():
        tokens[tid] = piece
    merges = [f"{a} {b}" for a, b in hf.model.get_merges()] \
        if hasattr(hf.model, "get_merges") else None
    if merges is None:
        # serialize through the json form (tokenizers>=0.20 keeps merges there)
        import json

        state = json.loads(hf.to_str())
        merges = [m if isinstance(m, str) else f"{m[0]} {m[1]}"
                  for m in state["model"]["merges"]]
    md = {
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.pre": pre,
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.token_type": np.full(len(tokens), TokenType.NORMAL, np.int32),
        "tokenizer.ggml.merges": merges,
        "tokenizer.ggml.add_bos_token": False,
    }
    return Tokenizer.from_gguf_metadata(md)


@pytest.mark.parametrize("pre,regex_str,ignore_merges", [
    ("llama3", LLAMA3[0], True),
    ("qwen2", QWEN2[0], False),
])
def test_bpe_pre_variant_matches_hf(pre, regex_str, ignore_merges):
    hf = _train_hf(regex_str, ignore_merges)
    ours = _ours_from_hf(hf, pre)
    for text in TEST_TEXTS:
        got = ours.encode(text, add_special=False, parse_special=False)
        want = hf.encode(text).ids
        assert got == want, (
            f"pre={pre} text={text!r}\n ours: "
            f"{[ours.tokens[i] for i in got]}\n hf:   "
            f"{[ours.tokens[i] for i in want]}")


def test_llama3_digit_grouping():
    """The llama3 regex groups digits 1-3 at a time; qwen2 one at a time."""
    l3 = PreTokenizer("llama3")
    assert l3.split("12345") == ["123", "45"]
    q2 = PreTokenizer("qwen2")
    assert q2.split("12345") == ["1", "2", "3", "4", "5"]


def test_unknown_pre_falls_back_to_gpt2():
    p = PreTokenizer("some-future-model")
    assert not p.known
    assert p.split("hello world") == ["hello", " world"]


def test_sequential_split_deepseek_coder():
    p = PreTokenizer("deepseek-coder")
    frags = p.split("abc\r\ndef 123")
    assert "".join(frags) == "abc\r\ndef 123"
    assert "\r" in frags and "\n" in frags  # [\r\n] splits first
    # digits split one at a time (\p{N})
    assert [f for f in frags if f.isdigit()] == ["1", "2", "3"]
