"""Device-side (jit) sampling chain for multi-token decode loops.

The host sampler (chain.py) runs the full reference chain on one logits row
per step; that costs a device->host round-trip per token — ruinous when the
host link has latency (SURVEY.md section 7 "Host<->device per-token
round-trip"). This module implements the common subset of the chain in
vectorized jnp so the engine can sample N tokens on-device per round-trip:

    grammar mask (byte-DFA bank, see GrammarBank)
    -> penalties (repeat/freq/presence over a last-n ring)
    -> top_k -> top_p -> min_p -> temperature -> gumbel sample (or greedy)

Per-slot parameters are arrays [S]; per-slot PRNG keys keep slots
independent. Requests needing mirostat, typical_p, dynatemp, logit_bias,
n_probs or a fixed seed fall back to the host chain. GBNF grammars that
determinize (grammar/dfa.py) run HERE at full device speed — per-slot DFA
state rides DeviceSamplerState and the mask is one row-gather from a
fixed-shape GrammarBank, so grammar requests never force the per-token
host round-trip the reference pays (llama_server_context.cc:1680-1698).
Recursive grammars still fall back to the host lane.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .chain import SamplingParams

DEVICE_TOP_K = 64  # top-k capture width on device
RING_LEN = 64  # penalty window (reference default repeat_last_n=64)


def device_compatible(p: SamplingParams, eog_ok: bool = True) -> bool:
    """Can this request's sampling run fully on-device? (Grammar is
    decided separately: a DFA-compilable grammar runs on device via
    GrammarBank; the serving layer checks that — serve/engine.py.)

    eog_ok: the engine knows its tokenizer's EOG token ids, so the
    device chain can honor ignore_eos by banning those columns
    (sample_step); a tokenizer with no EOG ids keeps the host lane."""
    return (
        p.n_probs == 0
        and p.mirostat == 0
        and p.typical_p >= 1.0
        and p.dynatemp_range == 0.0
        and not p.logit_bias
        and (not p.ignore_eos or eog_ok)
        and (p.seed is None or p.temperature <= 0)
        and (p.top_k <= DEVICE_TOP_K or p.temperature <= 0)
        and p.repeat_last_n <= RING_LEN
    )


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceSamplerState:
    """Per-slot sampler state living on device across inner steps."""

    ring: jax.Array  # [S, RING_LEN] int32, -1 = empty (penalty window)
    keys: jax.Array  # [S, 2] uint32 PRNG keys
    gstate: jax.Array  # [S] int32 grammar-DFA bank row (0 = unconstrained)

    def tree_flatten(self):
        return (self.ring, self.keys, self.gstate), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclass
class GrammarBank:
    """Token-level grammar tables shared by all slots, FIXED shape so the
    decode executables never re-specialize when grammars come and go.

    Row 0 is the pass-through state (mask all-True, trans -> 0) —
    unconstrained slots just sit there. Each active DFA grammar occupies a
    contiguous row range; a slot's DeviceSamplerState.gstate indexes
    absolute rows. mask[s, v]: token v legal from state s; trans[s, v]:
    next state. The per-step cost is one [S]-row gather from each table —
    independent of the bank's row count."""

    mask: jax.Array  # [NS, V] bool
    trans: jax.Array  # [NS, V] int32

    def tree_flatten(self):
        return (self.mask, self.trans), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n_states(self) -> int:
        return self.mask.shape[0]


def passthrough_bank(n_vocab: int, n_states: int = 1) -> GrammarBank:
    """All-rows-pass bank of the engine's fixed size (rows beyond 0 are
    overwritten when grammars install, serve/engine.py)."""
    return GrammarBank(
        mask=jnp.ones((n_states, n_vocab), bool),
        trans=jnp.zeros((n_states, n_vocab), jnp.int32),
    )


@jax.jit
def _expand_tables_jit(byte_trans, accept, pieces, lens, eog_cols):
    """Token-level tables from a byte DFA — the fold of every token's
    piece bytes through trans, vmapped over states, runs ON DEVICE (a
    [ns, V, Lmax]-gather problem XLA handles in microseconds; the numpy
    oracle is grammar/dfa.py::expand_token_tables_np)."""
    ns = byte_trans.shape[0]
    V = pieces.shape[0]
    dead = ns - 1

    def fold(cur, j):
        b = pieces[:, j].astype(jnp.int32)  # [V]
        step = byte_trans[cur, b]
        cur = jnp.where(j < lens, step, cur)
        return cur, None

    def per_state(s0):
        cur0 = jnp.full((V,), s0, jnp.int32)
        cur, _ = jax.lax.scan(fold, cur0, jnp.arange(pieces.shape[1]))
        return cur

    cur = jax.vmap(per_state)(jnp.arange(ns, dtype=jnp.int32))  # [ns, V]
    mask = (cur != dead) & (lens[None, :] > 0)
    trans = jnp.where(mask, cur, dead).astype(jnp.int32)
    if eog_cols.size:
        rows = jnp.arange(ns, dtype=jnp.int32)
        mask = mask.at[:, eog_cols].set(accept[:, None])
        trans = trans.at[:, eog_cols].set(rows[:, None])
    return mask, trans


def expand_token_tables(dfa, tok, n_cols: int | None = None):
    """Device expansion of a ByteDFA into (mask [ns, V], trans [ns, V])."""
    from ..grammar.dfa import eog_token_ids, piece_tables

    pieces, lens = piece_tables(tok)
    eog = np.asarray([t for t in eog_token_ids(tok)
                      if t < pieces.shape[0]], np.int32)
    mask, trans = _expand_tables_jit(
        jnp.asarray(dfa.trans), jnp.asarray(dfa.accept),
        jnp.asarray(pieces), jnp.asarray(lens), eog)
    V = n_cols if n_cols is not None else pieces.shape[0]
    if V > pieces.shape[0]:  # logits padded beyond the vocab
        pad = V - pieces.shape[0]
        mask = jnp.concatenate(
            [mask, jnp.zeros((dfa.n_states, pad), bool)], axis=1)
        trans = jnp.concatenate(
            [trans, jnp.full((dfa.n_states, pad), dfa.dead, jnp.int32)],
            axis=1)
    return mask, trans


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceSamplerParams:
    """Per-slot sampling knobs as device arrays [S]."""

    temp: jax.Array
    top_k: jax.Array
    top_p: jax.Array
    min_p: jax.Array
    repeat_penalty: jax.Array
    freq_penalty: jax.Array
    presence_penalty: jax.Array
    penalty_last_n: jax.Array
    # [S] bool: ban the EOG columns for this slot (reference ignore_eos,
    # llama_server_context.cc "ignore_eos" -> logit_bias[eos] = -inf)
    ignore_eos: jax.Array | None = None
    # STATIC fast-path flag (pytree aux, so flipping it retraces): every
    # slot greedy -> sample_step skips the vocab-wide top_k sort, the
    # softmax filters and the gumbel draw — a penalized argmax remains.
    all_greedy: bool = False
    # STATIC tokenizer EOG token ids the ignore_eos ban targets (tuple so
    # the jit cache keys on it; same for every request of one engine)
    eog_cols: tuple = ()

    def tree_flatten(self):
        return (
            self.temp, self.top_k, self.top_p, self.min_p,
            self.repeat_penalty, self.freq_penalty, self.presence_penalty,
            self.penalty_last_n, self.ignore_eos,
        ), (self.all_greedy, self.eog_cols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, all_greedy=aux[0] if aux else False,
                   eog_cols=aux[1] if len(aux) > 1 else ())


def new_state(n_slots: int, seed: int = 0,
              gstate=None) -> DeviceSamplerState:
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i))(
        jnp.arange(n_slots)
    )
    return DeviceSamplerState(
        ring=jnp.full((n_slots, RING_LEN), -1, jnp.int32),
        keys=keys,
        gstate=(jnp.zeros((n_slots,), jnp.int32) if gstate is None
                else jnp.asarray(gstate, jnp.int32)),
    )


def params_from_host(slot_params: list[SamplingParams | None],
                     eog_ids: tuple = ()) -> DeviceSamplerParams:
    """Pack per-slot SamplingParams into device arrays (idle slots get
    defaults). eog_ids: the tokenizer's EOG token ids (static per engine)
    — the columns the per-slot ignore_eos ban masks in sample_step."""
    def arr(get, default, dtype=np.float32):
        return jnp.asarray(
            [get(p) if p is not None else default for p in slot_params], dtype
        )

    return DeviceSamplerParams(
        temp=arr(lambda p: p.temperature, 0.0),
        top_k=arr(lambda p: p.top_k if p.top_k > 0 else DEVICE_TOP_K, DEVICE_TOP_K,
                  np.int32),
        top_p=arr(lambda p: p.top_p, 1.0),
        min_p=arr(lambda p: p.min_p, 0.0),
        repeat_penalty=arr(lambda p: p.repeat_penalty, 1.0),
        freq_penalty=arr(lambda p: p.frequency_penalty, 0.0),
        presence_penalty=arr(lambda p: p.presence_penalty, 0.0),
        penalty_last_n=arr(lambda p: p.repeat_last_n, 0, np.int32),
        ignore_eos=arr(lambda p: p.ignore_eos, False, np.bool_),
        all_greedy=all(p is None or p.temperature <= 0 for p in slot_params),
        eog_cols=tuple(eog_ids),
    )


def ring_from_tokens(tokens: list[list[int]], n_slots: int) -> jax.Array:
    ring = np.full((n_slots, RING_LEN), -1, np.int32)
    for s, toks in enumerate(tokens[:n_slots]):
        tail = toks[-RING_LEN:]
        if tail:
            ring[s, -len(tail):] = tail
    return jnp.asarray(ring)


def sample_step(
    logits: jax.Array,  # [S, V] f32
    params: DeviceSamplerParams,
    state: DeviceSamplerState,
    gbank: GrammarBank | None = None,
) -> tuple[jax.Array, DeviceSamplerState]:
    """One sampling step for all slots; returns tokens [S] + new state."""
    S, V = logits.shape
    ring = state.ring
    allow = None
    if gbank is not None:
        # grammar mask FIRST (reference order: the grammar constrains the
        # candidate set before the samplers, llama.cpp common_sampler);
        # unconstrained slots sit on the all-pass row 0
        allow = gbank.mask[state.gstate]  # [S, V]
        logits = jnp.where(allow, logits, -jnp.inf)
    if params.eog_cols and params.ignore_eos is not None:
        # per-slot ignore_eos: ban the EOG columns (the reference does
        # this as logit_bias[eos] = -inf before the chain)
        cols = jnp.asarray(params.eog_cols, jnp.int32)
        ban = params.ignore_eos[:, None]
        if allow is not None:
            # a FINITE grammar at an accept state with no continuation
            # leaves only EOG legal; banning it would zero the whole row
            # and emit a grammar-illegal argmax-0 token. The host lane
            # resolves this by letting the grammar terminate — exempt the
            # EOG columns for slots with no other legal token.
            eogm = jnp.zeros((V,), bool).at[cols].set(True)
            has_other = jnp.any(allow & ~eogm[None, :], axis=-1)  # [S]
            ban = ban & has_other[:, None]
        cur = logits[:, cols]
        logits = logits.at[:, cols].set(jnp.where(ban, -jnp.inf, cur))

    def advance_gstate(tokens):
        if gbank is None:
            return state.gstate
        return gbank.trans[state.gstate, tokens]

    # --- penalties over the ring window (reference chain order) ----------
    # Ring-local: only the <= RING_LEN distinct penalized tokens can change,
    # so gather their logits, penalize, and scatter back — no [S, V] counts
    # array (a vocab-wide scatter fusion measured 29 us/step on v5e).
    # Duplicate ring entries scatter the SAME penalized value (counts are
    # computed per entry over the whole window), so last-wins is exact.
    pos = jnp.arange(RING_LEN, dtype=jnp.int32)[None, :]
    in_window = (ring >= 0) & (pos >= (RING_LEN - params.penalty_last_n[:, None]))
    safe = jnp.maximum(ring, 0)  # [S, R]
    # counts[s, i] = occurrences of ring[s, i] within the window
    same = (safe[:, :, None] == safe[:, None, :]) & in_window[:, None, :]
    counts = jnp.sum(same.astype(jnp.float32), axis=-1)  # [S, R]
    g = jnp.take_along_axis(logits, safe, axis=-1)  # [S, R]
    rp = params.repeat_penalty[:, None]
    pen = jnp.where(g <= 0, g * rp, g / rp)
    pen = pen - counts * params.freq_penalty[:, None]
    pen = pen - params.presence_penalty[:, None]
    # every entry holding the same token computes the same value (counts
    # depend on the token, not the entry), so duplicate scatters agree
    pen = jnp.where(counts > 0, pen, g)
    logits = logits.at[jnp.arange(S)[:, None], safe].set(pen)

    if params.all_greedy:
        # greedy fast path: the chain below is order-preserving ahead of
        # the temperature stage, so argmax of the penalized logits IS the
        # sampled token (skips the vocab-wide sort; static flag => traced
        # only when every slot is greedy)
        tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        new_ring = jnp.concatenate([ring[:, 1:], tokens[:, None]], axis=1)
        return tokens, DeviceSamplerState(ring=new_ring, keys=state.keys,
                                          gstate=advance_gstate(tokens))

    # --- top-k capture ----------------------------------------------------
    v, idx = jax.lax.top_k(logits, DEVICE_TOP_K)  # [S, DK] sorted desc
    dk_pos = jnp.arange(DEVICE_TOP_K)[None, :]
    k_eff = jnp.clip(params.top_k, 1, DEVICE_TOP_K)[:, None]
    v = jnp.where(dk_pos < k_eff, v, -jnp.inf)

    # --- top_p / min_p over the sorted candidates -------------------------
    pr = jax.nn.softmax(v, axis=-1)
    cum = jnp.cumsum(pr, axis=-1)
    keep_tp = (cum - pr) < params.top_p[:, None]
    keep_mp = pr >= pr[:, :1] * params.min_p[:, None]
    keep = keep_tp & keep_mp
    keep = keep.at[:, 0].set(True)  # min_keep = 1
    v = jnp.where(keep, v, -jnp.inf)

    # --- temperature + gumbel (or greedy) ---------------------------------
    greedy = params.temp <= 0.0
    scaled = v / jnp.maximum(params.temp, 1e-6)[:, None]
    split = jax.vmap(jax.random.split)(state.keys)  # [S, 2, 2]
    new_keys = split[:, 0]
    sub = split[:, 1]
    g = jax.vmap(lambda k: jax.random.gumbel(k, (DEVICE_TOP_K,)))(sub)
    score = jnp.where(greedy[:, None], v, scaled + g)
    choice = jnp.argmax(score, axis=-1)
    tokens = idx[jnp.arange(S), choice].astype(jnp.int32)

    new_ring = jnp.concatenate([ring[:, 1:], tokens[:, None]], axis=1)
    return tokens, DeviceSamplerState(ring=new_ring, keys=new_keys,
                                      gstate=advance_gstate(tokens))
