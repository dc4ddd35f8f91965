"""GBNF -> byte-level DFA for ON-DEVICE grammar-constrained decoding.

The reference applies its grammar per token on the HOST
(/root/reference/src/llama_server_context.cc:1680-1698), which costs a
device->host round-trip per generated token. The TPU-native design removes
the round-trip entirely for the common case: grammars whose pushdown
matcher (grammar/gbnf.py) only ever reaches finitely many states — every
non-recursive GBNF, all star/plus/optional repetition, the typical
"enum-ish" response formats — determinize into a byte-level DFA here, the
engine expands it ONCE into token-level mask/transition tables on the
device (kernels stay XLA gathers), and grammar slots then ride the fully
on-device chunked decode loop (sampling/device.py) at the same rate as
unconstrained slots. Recursive grammars (nested JSON etc.) exceed the
state cap and fall back to the host lane unchanged.

State = the matcher's own configuration (frozenset of parse stacks +
UTF-8 partial accumulator); subset construction advances a cloned
configuration one byte at a time, so DFA semantics are bit-identical to
GrammarMatcher by construction (tested against allowed_mask on every
reachable state, tests/test_grammar_dfa.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .gbnf import (
    _NO_PARTIAL,
    GrammarMatcher,
    _utf8_step,
    parse_gbnf,
)


@dataclass
class ByteDFA:
    """trans[s, b] = next state for byte b (dead state = n_states - 1,
    self-looping); accept[s] = a completed parse is among state s's
    configurations (EOG is legal exactly there)."""

    trans: np.ndarray  # [n_states, 256] int32
    accept: np.ndarray  # [n_states] bool
    start: int
    n_states: int

    @property
    def dead(self) -> int:
        return self.n_states - 1


class _Config:
    """A cloneable matcher configuration (stacks + UTF-8 partial)."""

    __slots__ = ("stacks", "partial")

    def __init__(self, stacks: frozenset, partial: tuple):
        self.stacks = stacks
        self.partial = partial

    def key(self):
        return (self.stacks, self.partial)


def compile_byte_dfa(grammar_text: str, max_states: int = 126) -> ByteDFA | None:
    """Determinize the grammar's pushdown matcher over BYTES.

    Returns None when the reachable configuration count exceeds
    max_states (recursive grammars) — callers fall back to the host
    matcher. max_states defaults to leaving room for the engine's shared
    bank (sampling/device.py GrammarBank: pass-through row + dead row).
    """
    try:
        bodies, root_id = parse_gbnf(grammar_text)
    except Exception:
        return None

    # a throwaway matcher gives us _expand/_advance/_can_partial without a
    # tokenizer (they only touch bodies)
    m = GrammarMatcher.__new__(GrammarMatcher)
    m.bodies = bodies
    m.root_id = root_id

    start_stacks = frozenset(m._expand((("ref", root_id),)))
    start = _Config(start_stacks, _NO_PARTIAL)

    states: dict[tuple, int] = {start.key(): 0}
    configs: list[_Config] = [start]
    rows: list[np.ndarray] = []
    i = 0
    while i < len(configs):
        cfg = configs[i]
        row = np.full((256,), -1, np.int64)  # -1 = dead (patched below)
        for b in range(256):
            try:
                cp, npart = _utf8_step(cfg.partial, b)
            except ValueError:
                continue  # malformed byte: dead
            if cp is None:
                if not m._can_partial(cfg.stacks, npart):
                    continue
                nxt = _Config(cfg.stacks, npart)
            else:
                adv = m._advance(set(cfg.stacks), cp)
                if not adv:
                    continue
                nxt = _Config(frozenset(adv), _NO_PARTIAL)
            k = nxt.key()
            sid = states.get(k)
            if sid is None:
                if len(configs) >= max_states:
                    return None  # state blow-up: not DFA-compilable
                sid = len(configs)
                states[k] = sid
                configs.append(nxt)
            row[b] = sid
        rows.append(row)
        i += 1

    n = len(configs) + 1  # + dead state (last row, self-looping)
    trans = np.full((n, 256), n - 1, np.int32)
    for s, row in enumerate(rows):
        live = row >= 0
        trans[s, live] = row[live]
    accept = np.zeros((n,), bool)
    for s, cfg in enumerate(configs):
        accept[s] = cfg.partial[1] == 0 and any(not st for st in cfg.stacks)
    return ByteDFA(trans=trans, accept=accept, start=0, n_states=n)


# ----------------------------------------------------------- piece tables
# Per-tokenizer byte tables for the on-device token-level expansion:
# pieces[v, :lens[v]] = token v's piece bytes. Cached weakly like the
# grammar trie (gbnf.py _TRIE_CACHE).
import weakref

_PIECES_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def piece_tables(tok) -> tuple[np.ndarray, np.ndarray]:
    try:
        hit = _PIECES_CACHE.get(tok)
    except TypeError:
        hit = None
    if hit is not None:
        return hit
    n = tok.n_tokens
    raw = [tok.piece_bytes(t, special=False) for t in range(n)]
    lmax = max((len(p) for p in raw), default=1) or 1
    pieces = np.zeros((n, lmax), np.uint8)
    lens = np.zeros((n,), np.int32)
    for t, p in enumerate(raw):
        lens[t] = len(p)
        if p:
            pieces[t, : len(p)] = np.frombuffer(bytes(p), np.uint8)
    out = (pieces, lens)
    try:
        _PIECES_CACHE[tok] = out
    except TypeError:
        pass
    return out


def eog_token_ids(tok) -> list[int]:
    ids = [t for t in (tok.eos_id, tok.eot_id, tok.eom_id)
           if t is not None and t >= 0]
    ids += [t for t in getattr(tok, "_eog_extra", ())]
    return sorted(set(ids))


def expand_token_tables_np(dfa: ByteDFA, tok, n_cols: int | None = None):
    """NumPy reference expansion (the device path lives in
    sampling/device.py::expand_token_tables; this is its test oracle and
    the CPU fallback): token-level (mask [ns, V], trans [ns, V])."""
    pieces, lens = piece_tables(dfa_tok := tok)
    del dfa_tok
    V = n_cols if n_cols is not None else tok.n_tokens
    ns = dfa.n_states
    cur = np.tile(np.arange(ns, dtype=np.int32)[:, None], (1, pieces.shape[0]))
    for j in range(pieces.shape[1]):
        step = dfa.trans[cur, np.broadcast_to(pieces[None, :, j], cur.shape)]
        cur = np.where(j < lens[None, :], step, cur)
    mask = (cur != dfa.dead) & (lens[None, :] > 0)
    trans = np.where(mask, cur, dfa.dead).astype(np.int32)
    if V > pieces.shape[0]:  # logits padded beyond the vocab
        pad = V - pieces.shape[0]
        mask = np.concatenate([mask, np.zeros((ns, pad), bool)], axis=1)
        trans = np.concatenate(
            [trans, np.full((ns, pad), dfa.dead, np.int32)], axis=1)
    for t in eog_token_ids(tok):
        if t < V:
            mask[:, t] = dfa.accept
            trans[:, t] = np.arange(ns)  # generation stops; state unused
    return mask, trans
