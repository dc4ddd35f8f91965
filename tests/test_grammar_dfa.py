"""Byte-DFA grammar compilation (grammar/dfa.py) must be bit-identical to
the pushdown matcher on every reachable state, and the device token-table
expansion must match the numpy oracle."""

import numpy as np
import pytest

from tests.test_grammar import make_char_vocab
from tpu_engine.grammar import build_matcher
from tpu_engine.grammar.dfa import (
    ByteDFA,
    compile_byte_dfa,
    eog_token_ids,
    expand_token_tables_np,
)

TOK = make_char_vocab()

GRAMMARS = [
    'root ::= ("yes" | "no" | " ")*\n',
    'root ::= "yes" | "no"\n',
    'root ::= [a-z]{2,5}\n',
    'root ::= ("a" | "b")+ "!"?\n',
    'root ::= w (" " w)*\nw ::= [a-y]+\n',
]


def _walk_states(dfa: ByteDFA, grammar: str, n_walks: int = 40, seed: int = 0):
    """Random legal token walks; yields (matcher, dfa_state) pairs at every
    step so masks can be compared in lockstep."""
    rng = np.random.default_rng(seed)
    mask0, trans0 = expand_token_tables_np(dfa, TOK)
    eog = set(eog_token_ids(TOK))
    for _ in range(n_walks):
        m = build_matcher(grammar, TOK)
        s = dfa.start
        for _step in range(12):
            ref_mask = m.allowed_mask()
            np.testing.assert_array_equal(
                mask0[s], ref_mask,
                err_msg=f"mask mismatch at state {s} ({grammar!r})")
            legal = np.nonzero(ref_mask)[0]
            legal = [t for t in legal if t not in eog]
            if not legal:
                break
            t = int(rng.choice(legal))
            m.accept(t)
            s = int(trans0[s, t])
            assert s != dfa.dead


@pytest.mark.parametrize("grammar", GRAMMARS)
def test_dfa_matches_matcher(grammar):
    dfa = compile_byte_dfa(grammar)
    assert dfa is not None, f"expected {grammar!r} to compile"
    _walk_states(dfa, grammar)


def test_recursive_grammar_bails():
    # balanced parens: genuinely context-free, must NOT determinize
    g = 'root ::= "(" root ")" | ""\n'
    assert compile_byte_dfa(g, max_states=126) is None


def test_accept_marks_eog():
    g = 'root ::= "ab"\n'
    dfa = compile_byte_dfa(g)
    mask, trans = expand_token_tables_np(dfa, TOK)
    s = dfa.start
    eog = eog_token_ids(TOK)
    assert not mask[s, eog].any()  # incomplete parse: no EOG
    a, b = TOK._piece_to_id["a"], TOK._piece_to_id["b"]
    s = int(trans[s, a])
    s = int(trans[s, b])
    assert mask[s, eog].all()  # complete: EOG allowed
    assert not mask[s, a]      # nothing else allowed


def test_utf8_multibyte_grammar():
    # non-ASCII literal exercises the UTF-8 partial states in the DFA
    g = 'root ::= "é"+\n'  # é = 0xC3 0xA9
    dfa = compile_byte_dfa(g)
    assert dfa is not None
    m = build_matcher(g, TOK)
    mask, _ = expand_token_tables_np(dfa, TOK)
    np.testing.assert_array_equal(mask[dfa.start], m.allowed_mask())


def test_device_expansion_matches_numpy():
    from tpu_engine.sampling.device import expand_token_tables

    g = GRAMMARS[0]
    dfa = compile_byte_dfa(g)
    ref_mask, ref_trans = expand_token_tables_np(dfa, TOK)
    dev_mask, dev_trans = expand_token_tables(dfa, TOK)
    np.testing.assert_array_equal(np.asarray(dev_mask), ref_mask)
    np.testing.assert_array_equal(np.asarray(dev_trans), ref_trans)
