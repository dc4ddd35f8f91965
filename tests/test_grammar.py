"""GBNF parser/matcher + JSON-schema compiler tests."""

import json

import numpy as np
import pytest

from tests.test_tokenizer import make_spm_vocab
from tpu_engine.grammar import build_matcher, json_schema_to_grammar, parse_gbnf
from tpu_engine.grammar.gbnf import GrammarMatcher
from tpu_engine.tokenizer import TokenType, Tokenizer


def make_char_vocab():
    """ASCII char-level vocab for precise grammar assertions."""
    tokens = ["<unk>", "<s>", "</s>"]
    types = [TokenType.UNKNOWN, TokenType.CONTROL, TokenType.CONTROL]
    chars = [chr(c) for c in range(32, 127)]
    tokens += chars + ["yes", "no", "true", "false"]
    types += [TokenType.NORMAL] * (len(chars) + 4)
    md = {
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.token_type": np.array([int(t) for t in types], np.int32),
        "tokenizer.ggml.merges": [],
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
        "tokenizer.ggml.add_bos_token": False,
    }
    return Tokenizer.from_gguf_metadata(md)


TOK = make_char_vocab()


def tid(piece: str) -> int:
    return TOK._piece_to_id[piece]


def allowed_pieces(m: GrammarMatcher) -> set:
    mask = m.allowed_mask()
    return {TOK.tokens[i] for i in np.nonzero(mask)[0]}


def test_literal_alternation():
    m = build_matcher('root ::= "yes" | "no"\n', TOK)
    a = allowed_pieces(m)
    assert "y" in a and "n" in a and "yes" in a and "no" in a
    assert "x" not in a and "e" not in a
    m.accept(tid("y"))
    a = allowed_pieces(m)
    assert a == {"e"}
    m.accept(tid("e"))
    m.accept(tid("s"))
    assert m.can_stop() and m.done()
    assert "</s>" in allowed_pieces(m)


def test_multitoken_word():
    m = build_matcher('root ::= "yes"\n', TOK)
    m.accept(tid("yes"))
    assert m.done()


def test_char_class_and_star():
    m = build_matcher("root ::= [a-c]*\n", TOK)
    a = allowed_pieces(m)
    assert {"a", "b", "c"} <= a and "d" not in a
    assert m.can_stop()  # star allows empty
    m.accept(tid("a"))
    m.accept(tid("b"))
    assert m.can_stop()


def test_plus_requires_one():
    m = build_matcher("root ::= [0-9]+\n", TOK)
    assert not m.can_stop()
    m.accept(tid("7"))
    assert m.can_stop()


def test_negated_class():
    m = build_matcher('root ::= [^ab] "x"\n', TOK)
    a = allowed_pieces(m)
    assert "a" not in a and "b" not in a and "c" in a


def test_rule_refs_and_recursion():
    g = """
root ::= expr
expr ::= term ("+" term)*
term ::= [0-9]+
"""
    m = build_matcher(g, TOK)
    for ch in "1+23+4":
        m.accept(tid(ch))
    assert m.can_stop()
    a = allowed_pieces(m)
    assert "+" in a and "5" in a


def test_bounded_repetition():
    m = build_matcher("root ::= [a]{2,3}\n", TOK)
    assert not m.can_stop()
    m.accept(tid("a"))
    assert not m.can_stop()
    m.accept(tid("a"))
    assert m.can_stop()
    m.accept(tid("a"))
    assert m.can_stop()
    assert allowed_pieces(m) <= {"</s>"}


def test_json_schema_object():
    schema = {
        "type": "object",
        "properties": {"name": {"type": "string"}, "age": {"type": "integer"}},
        "required": ["name", "age"],
    }
    g = json_schema_to_grammar(schema)
    m = build_matcher(g, TOK)
    target = '{ "name": "bob", "age": 41}'
    for ch in target:
        mask = m.allowed_mask()
        assert mask[tid(ch)], f"char {ch!r} blocked in {target!r}; grammar:\n{g}"
        m.accept(tid(ch))
    assert m.can_stop()


def test_json_schema_rejects_wrong_key():
    schema = {"type": "object", "properties": {"ok": {"type": "boolean"}},
              "required": ["ok"]}
    g = json_schema_to_grammar(schema)
    m = build_matcher(g, TOK)
    m.accept(tid("{"))
    m.accept(tid('"'))
    mask = m.allowed_mask()
    assert mask[tid("o")]
    assert not mask[tid("x")]


def test_json_schema_enum_and_array():
    schema = {
        "type": "object",
        "properties": {
            "color": {"enum": ["red", "green"]},
            "nums": {"type": "array", "items": {"type": "integer"}, "minItems": 1},
        },
        "required": ["color", "nums"],
    }
    g = json_schema_to_grammar(schema)
    m = build_matcher(g, TOK)
    for ch in '{ "color": "red", "nums": [1, 2]}':
        assert m.allowed_mask()[tid(ch)], f"blocked at {ch!r}\n{g}"
        m.accept(tid(ch))
    assert m.can_stop()


def test_json_schema_any_value():
    g = json_schema_to_grammar({})
    m = build_matcher(g, TOK)
    for ch in '[1, {"a": null}, "s", true]':
        assert m.allowed_mask()[tid(ch)], f"blocked at {ch!r}"
        m.accept(tid(ch))
    assert m.can_stop()


def test_spm_vocab_masking():
    """Grammar masking with a word-piece vocab (multi-char tokens)."""
    tok = make_spm_vocab()
    m = build_matcher('root ::= "hello" | "world"\n', tok)
    mask = m.allowed_mask()
    hid = tok._piece_to_id["hello"]
    assert mask[hid]
    assert not mask[tok._piece_to_id["▁hello"]]  # leading space not in grammar


def test_byte_fallback_multibyte_grammar():
    """Byte-fallback tokens must match true code points across token
    boundaries (llama.cpp partial-UTF-8 semantics), not latin-1 U+00XX."""
    tok = make_spm_vocab()

    def btid(b: int) -> int:
        return 3 + b  # <0xNN> byte-fallback token ids

    # Greek lowercase alpha..omega = U+03B1..U+03C9 (UTF-8: CE B1 .. CF 89)
    m = build_matcher("root ::= [\\u03b1-\\u03c9]\n", tok)
    mask = m.allowed_mask()
    assert mask[btid(0xCE)] and mask[btid(0xCF)]  # lead bytes of the range
    assert not mask[btid(0xC3)]  # U+00C0.. lead: no Greek completion
    assert not mask[tok._piece_to_id["h"]]  # plain ascii not allowed
    m.accept(btid(0xCE))
    mask = m.allowed_mask()
    assert mask[btid(0xB1)]  # completes U+03B1 (alpha)
    assert not mask[btid(0x80)]  # would complete U+0380, outside class
    assert not mask[tok.eos_id]  # cannot stop mid-character
    assert not m.can_stop()
    m.accept(btid(0xB1))
    assert m.done()


def test_byte_fallback_negated_class():
    tok = make_spm_vocab()

    def btid(b: int) -> int:
        return 3 + b

    # anything but 'x': multibyte characters are fine and must be allowed
    m = build_matcher('root ::= [^x]\n', tok)
    mask = m.allowed_mask()
    assert mask[btid(0xCE)]  # lead byte of a 2-byte char can complete
    assert not mask[tok._piece_to_id["x"]] if "x" in tok._piece_to_id else True
    m.accept(btid(0xCE))
    m.accept(btid(0xB1))  # U+03B1 != 'x'
    assert m.done()
