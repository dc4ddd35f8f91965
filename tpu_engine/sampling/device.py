"""Device-side (jit) sampling chain for multi-token decode loops.

The host sampler (chain.py) runs the full reference chain on one logits row
per step; that costs a device->host round-trip per token — ruinous when the
host link has latency (SURVEY.md section 7 "Host<->device per-token
round-trip"). This module implements the common subset of the chain in
vectorized jnp so the engine can sample N tokens on-device per round-trip:

    penalties (repeat/freq/presence over a last-n ring)
    -> top_k -> top_p -> min_p -> temperature -> gumbel sample (or greedy)

Per-slot parameters are arrays [S]; per-slot PRNG keys keep slots
independent. Requests needing grammar, mirostat, typical_p, dynatemp,
logit_bias, n_probs or a fixed seed fall back to the host chain.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .chain import SamplingParams

DEVICE_TOP_K = 64  # top-k capture width on device
RING_LEN = 64  # penalty window (reference default repeat_last_n=64)


def device_compatible(p: SamplingParams) -> bool:
    """Can this request's sampling run fully on-device?"""
    return (
        not p.grammar
        and p.n_probs == 0
        and p.mirostat == 0
        and p.typical_p >= 1.0
        and p.dynatemp_range == 0.0
        and not p.logit_bias
        and not p.ignore_eos
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

    def tree_flatten(self):
        return (self.ring, self.keys), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


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
    # STATIC fast-path flag (pytree aux, so flipping it retraces): every
    # slot greedy -> sample_step skips the vocab-wide top_k sort, the
    # softmax filters and the gumbel draw — a penalized argmax remains.
    all_greedy: bool = False

    def tree_flatten(self):
        return (
            self.temp, self.top_k, self.top_p, self.min_p,
            self.repeat_penalty, self.freq_penalty, self.presence_penalty,
            self.penalty_last_n,
        ), (self.all_greedy,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, all_greedy=aux[0] if aux else False)


def new_state(n_slots: int, seed: int = 0) -> DeviceSamplerState:
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i))(
        jnp.arange(n_slots)
    )
    return DeviceSamplerState(
        ring=jnp.full((n_slots, RING_LEN), -1, jnp.int32),
        keys=keys,
    )


def params_from_host(slot_params: list[SamplingParams | None]) -> DeviceSamplerParams:
    """Pack per-slot SamplingParams into device arrays (idle slots get
    defaults)."""
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
        all_greedy=all(p is None or p.temperature <= 0 for p in slot_params),
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
) -> tuple[jax.Array, DeviceSamplerState]:
    """One sampling step for all slots; returns tokens [S] + new state."""
    S, V = logits.shape
    ring = state.ring

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
        return tokens, DeviceSamplerState(ring=new_ring, keys=state.keys)

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
    return tokens, DeviceSamplerState(ring=new_ring, keys=new_keys)
