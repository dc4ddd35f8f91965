"""Slot-paged KV cache with seq ops as index arithmetic.

TPU-native redesign of llama.cpp's unified KV cache (SURVEY.md section 2b
"KV cache"; reference call sites llama_kv_cache_clear/seq_rm/seq_add/seq_cp
at /root/reference/src/llama_server_context.cc:287,1288-1290,1540-1547,661).

Design invariant: slot s occupies cells [0, lengths[s]) contiguously and
cell i always holds the token at *position* i. K is stored UNROTATED and
RoPE is applied inside attention using the cell index, so that:

  - seq_rm(slot, n, -1)  == trim:   lengths[s] = n            (metadata only)
  - seq_cp               == row copy of a prefix
  - context shift        == compact: roll the tail down over the evicted
    middle; positions renumber automatically (no K re-rotation pass, unlike
    upstream llama.cpp's K-shift graph)
  - self-extend          == position remap at attention time (no cache op)

Storage is a TUPLE of per-layer arrays [S, KH, T, D] (not one [L, ...]
array): appends are per-layer in the forward loop, and XLA only elides the
copy of a functional update when the operand is the layer being written —
a single stacked array made every layer's append copy the WHOLE cache
(measured 100+ ms/step at 4k ctx). Appends use lax.dynamic_update_slice
(cells are always the contiguous range [lengths[s], lengths[s]+Tc)), the
pattern XLA reliably updates in place.

Quantized KV storage mirrors the reference's cache_type_k/v ∈ {f16, q8_0,
q4_0} (llama_engine.cc:628-637, validated at :25-47). The TPU-native
layouts (bit-level ggml block parity is not needed — KV bytes never leave
the engine; what matters is the compression ratio and quality):

  f16  -> bfloat16 cells (the TPU-native 16-bit float)
  q8_0 -> int8 cells + one f32 scale per (token, kv-head) row of head_dim
          elements (ggml scales per 32-elt block; per-head-row is the
          vectorizable TPU analog at similar granularity)
  q4_0 -> two 4-bit cells packed per uint8 along head_dim split-half
          (D//2 bytes) + one f32 scale per (token, kv-head) row
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

KV_KINDS = ("f32", "f16", "q8_0", "q4_0")


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    k: tuple  # per layer: [S, KH, T, D] (compute dtype; int8/uint8-packed when quantized)
    v: tuple  # per layer: [S, KH, T, D]  (q4_0: [..., D//2])
    lengths: jax.Array  # [S] int32: occupied cells per slot
    k_scale: tuple | None = None  # per layer: [S, KH, T] f32 when quantized
    v_scale: tuple | None = None
    kind: str = "f32"  # static: one of KV_KINDS

    def tree_flatten(self):
        return (self.k, self.v, self.lengths, self.k_scale, self.v_scale), self.kind

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, kind=aux)

    @property
    def n_layer(self) -> int:
        return len(self.k)

    @property
    def n_slots(self) -> int:
        return self.k[0].shape[0]

    @property
    def max_len(self) -> int:
        return self.k[0].shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def new_cache(
    n_layer: int,
    n_slots: int,
    max_len: int,
    n_kv_head: int,
    head_dim: int,
    dtype=jnp.float32,
    quantized: bool = False,
    kind: str | None = None,
) -> KVCache:
    if kind is None:
        kind = "q8_0" if quantized else ("f32" if dtype == jnp.float32 else "f16")
    if kind not in KV_KINDS:
        raise ValueError(f"kv cache kind {kind!r} not in {KV_KINDS}")
    shape = (n_slots, n_kv_head, max_len, head_dim)
    lengths = jnp.zeros((n_slots,), jnp.int32)
    if kind in ("q8_0", "q4_0"):
        if kind == "q4_0":
            if head_dim % 2:
                raise ValueError("q4_0 KV needs even head_dim")
            cells = lambda: jnp.zeros(shape[:-1] + (head_dim // 2,), jnp.uint8)
        else:
            cells = lambda: jnp.zeros(shape, jnp.int8)
        sc = lambda: jnp.zeros(shape[:-1], jnp.float32)
        return KVCache(
            k=tuple(cells() for _ in range(n_layer)),
            v=tuple(cells() for _ in range(n_layer)),
            lengths=lengths,
            k_scale=tuple(sc() for _ in range(n_layer)),
            v_scale=tuple(sc() for _ in range(n_layer)),
            kind=kind,
        )
    cdtype = jnp.bfloat16 if kind == "f16" else dtype
    return KVCache(
        k=tuple(jnp.zeros(shape, cdtype) for _ in range(n_layer)),
        v=tuple(jnp.zeros(shape, cdtype) for _ in range(n_layer)),
        lengths=lengths,
        kind=kind,
    )


# -- KV row quantization (append path) and dequantization (attention) --------

def quantize_kv_rows(x: jax.Array, kind: str):
    """Quantize new KV rows x [..., D] -> (cells, scale[...]).

    q8_0: symmetric absmax int8; q4_0: symmetric absmax 4-bit, two values
    packed per byte along D split-half (lo nibble = element d, hi nibble =
    element d + D/2) so the flash kernel unpacks with a lane-dim concat
    instead of an interleave. Reference capability: cache_type_k/v
    quantized storage (llama_engine.cc:628-637)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    if kind == "q8_0":
        scale = amax / 127.0
        q = jnp.round(xf / jnp.maximum(scale[..., None], 1e-12))
        return jnp.clip(q, -127, 127).astype(jnp.int8), scale
    if kind == "q4_0":
        half = x.shape[-1] // 2
        scale = amax / 7.0
        q = jnp.round(xf / jnp.maximum(scale[..., None], 1e-12))
        q = jnp.clip(q, -8, 7).astype(jnp.int32) + 8  # [0, 15]
        lo, hi = q[..., :half], q[..., half:]
        return (lo | (hi << 4)).astype(jnp.uint8), scale
    raise ValueError(kind)


def dequant_kv(cells: jax.Array, scale: jax.Array | None, kind: str,
               dtype=jnp.float32) -> jax.Array:
    """Inverse of quantize_kv_rows; identity for float kinds."""
    if kind in ("f32", "f16"):
        return cells.astype(dtype)
    if kind == "q8_0":
        return cells.astype(dtype) * scale[..., None].astype(dtype)
    if kind == "q4_0":
        lo = (cells & 0xF).astype(jnp.int32) - 8
        hi = (cells >> 4).astype(jnp.int32) - 8
        q = jnp.concatenate([lo, hi], axis=-1)
        return q.astype(dtype) * scale[..., None].astype(dtype)
    raise ValueError(kind)


def append_rows(layer_arr: jax.Array, vals: jax.Array, slot_ids: jax.Array,
                starts: jax.Array, n_valid: jax.Array, active: jax.Array,
                ) -> jax.Array:
    """Write vals [B, Tc, KH, *] into layer_arr [S, KH, T, *]: row b's
    valid tokens land at cells [starts[b], starts[b]+n_valid[b]) of slot
    slot_ids[b].

    One read-modify-write dynamic_update_slice per row — the pattern XLA
    keeps in place (a scatter over a stacked cache array copied the whole
    cache per layer). The window start clamps to T-Tc when the padded
    window would cross the end of the cache (the valid tokens themselves
    always fit — engine invariant n_past + n_valid <= T): vals roll right
    by the clamp distance and displaced window positions keep their old
    cells, as do pad tokens and inactive rows."""
    B, Tc = vals.shape[0], vals.shape[1]
    T = layer_arr.shape[2]
    is_scale = vals.ndim == 3  # scale planes [B, Tc, KH]
    sizes = (1, layer_arr.shape[1], Tc) + ((() if is_scale else (layer_arr.shape[3],)))
    out = layer_arr
    for b in range(B):
        s_clamp = jnp.clip(starts[b], 0, max(T - Tc, 0))
        d = starts[b] - s_clamp  # >= 0
        val = jnp.roll(vals[b], d, axis=0)  # [Tc, KH, *]
        j = jnp.arange(Tc, dtype=jnp.int32)
        ok = active[b] & (j >= d) & (j - d < n_valid[b])
        pos = (slot_ids[b], 0, s_clamp) if is_scale else (slot_ids[b], 0, s_clamp, 0)
        old = jax.lax.dynamic_slice(out, pos, sizes)  # [1, KH, Tc, *]
        mask = ok[None, None, :] if is_scale else ok[None, None, :, None]
        new = jnp.swapaxes(val, 0, 1)[None].astype(out.dtype)
        out = jax.lax.dynamic_update_slice(out, jnp.where(mask, new, old), pos)
    return out


# -- seq ops (all jit-able, all metadata/index arithmetic) -------------------

def _map_layers(cache: KVCache, fn):
    k = tuple(fn(a) for a in cache.k)
    v = tuple(fn(a) for a in cache.v)
    ks = tuple(fn(a) for a in cache.k_scale) if cache.k_scale is not None else None
    vs = tuple(fn(a) for a in cache.v_scale) if cache.v_scale is not None else None
    return k, v, ks, vs


def clear_all(cache: KVCache) -> KVCache:
    """Reference: llama_kv_cache_clear (llama_server_context.cc:287)."""
    return KVCache(cache.k, cache.v, jnp.zeros_like(cache.lengths),
                   cache.k_scale, cache.v_scale, cache.kind)


@jax.jit
def trim(cache: KVCache, slot: jax.Array, n: jax.Array) -> KVCache:
    """seq_rm(slot, n, -1): keep the first n cells (prompt-cache reuse,
    reference llama_server_context.cc:1539-1554)."""
    lengths = cache.lengths.at[slot].set(
        jnp.minimum(cache.lengths[slot], n).astype(jnp.int32)
    )
    return KVCache(cache.k, cache.v, lengths, cache.k_scale, cache.v_scale,
                   cache.kind)


@jax.jit
def clear_slot(cache: KVCache, slot: jax.Array) -> KVCache:
    return trim(cache, slot, jnp.int32(0))


@jax.jit
def seq_cp(cache: KVCache, src: jax.Array, dst: jax.Array) -> KVCache:
    """Copy slot src's occupied prefix into slot dst (system-prompt
    broadcast, reference llama_server_context.cc:659-662). Copies whole
    rows; the occupied length governs validity."""
    k, v, ks, vs = _map_layers(cache, lambda a: a.at[dst].set(a[src]))
    lengths = cache.lengths.at[dst].set(cache.lengths[src])
    return KVCache(k, v, lengths, ks, vs, cache.kind)


@jax.jit
def shift_compact(cache: KVCache, slot: jax.Array, n_keep: jax.Array,
                  n_discard: jax.Array) -> KVCache:
    """Context shift: evict cells [n_keep+1, n_keep+1+n_discard) and slide
    the tail down (reference llama_server_context.cc:1274-1306: seq_rm +
    seq_add(-d)). Because cell index == position, the slide renumbers
    positions implicitly.
    """
    T = cache.max_len
    idx = jnp.arange(T, dtype=jnp.int32)
    # source index for each destination cell
    src = jnp.where(idx > n_keep, idx + n_discard, idx)
    src = jnp.minimum(src, T - 1)

    def gather_slot(arr):
        # arr [S, KH, T, ...]: gather the T axis of the picked slot
        return arr.at[slot].set(arr[slot][:, src])

    k, v, ks, vs = _map_layers(cache, gather_slot)
    lengths = cache.lengths.at[slot].set(cache.lengths[slot] - n_discard)
    return KVCache(k, v, lengths, ks, vs, cache.kind)
