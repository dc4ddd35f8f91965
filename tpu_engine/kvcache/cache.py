"""Slot-paged KV cache with seq ops as index arithmetic.

TPU-native redesign of llama.cpp's unified KV cache (SURVEY.md section 2b
"KV cache"; reference call sites llama_kv_cache_clear/seq_rm/seq_add/seq_cp
at /root/reference/src/llama_server_context.cc:287,1288-1290,1540-1547,661).

Design invariant: slot s occupies cells [0, lengths[s]) contiguously and
cell i always holds the token at *position* i. K is stored ROTATED in the
common case (model/llama.py rot_cache=True — the upstream llama.cpp design,
which saves the per-cell rotation in every attention call; measured ~150
us/step on v5e), so:

  - seq_rm(slot, n, -1)  == trim:   lengths[s] = n            (metadata only)
  - seq_cp               == row copy of a prefix
  - context shift        == compact + re-rope of the moved cells by the
    constant delta -n_discard (shift_compact rope=...; mirrors upstream
    llama.cpp's K-shift, incl. requantization for quantized K)
  - self-extend (ga_n>1) == K stored UNROTATED and position-remapped
    rotation applied at attention time (no cache op; shift needs no rope)

**Deferred append.** The forward step does NOT write to the cache inside
the layer loop: attention consumes the step's new K/V rows as separate
"in-flight" operands, the per-layer rows are stacked, and append_step
writes them all with ONE read-modify-write dynamic_update_slice per slot
spanning every layer. Rationale (measured on chip): a scatter over the
cache copied the whole cache every layer (100+ ms/step at 4k ctx), and
per-layer DUS writes cost ~350 small device ops per step (~20 us fixed
overhead each on this runtime). One L-spanning DUS per slot is in-place
and O(slots) ops per step.

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
from functools import partial

import os as _os

import jax
import jax.numpy as jnp

KV_KINDS = ("f32", "f16", "q8_0", "q4_0")
# decode append as ONE scatter instead of a per-slot DUS loop (see
# _put_slot_windows); default off until the scatter is measured faster on
# real TPU silicon than the loop it replaces
_BATCH_APPEND = _os.environ.get("TPU_ENGINE_BATCH_APPEND", "0") == "1"


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    """layout (static):
      "td" — cells [L, S, KH, T, D] (q4_0: [..., T, D//2]). D rides the
             lane dim: at D=64 (or q4_0's packed D/2) every native
             (8, 128) tile is HALF EMPTY in HBM — storage AND bandwidth.
      "dt" — cells [L, S, KH, D, T] (q4_0: [..., D//2, T]). T rides the
             lane dim (always 128-aligned): full tiles at any head_dim,
             K arrives pre-transposed for the QK^T MXU dot, and the
             q8_0/q4_0 per-token scale row [T] broadcasts over D rows
             with no relayout. Scale planes are [L, S, KH, T] either way.
    """
    k: jax.Array
    v: jax.Array
    lengths: jax.Array  # [S] int32: occupied cells per slot
    k_scale: jax.Array | None = None  # [L, S, KH, T] f32 when quantized
    v_scale: jax.Array | None = None
    kind: str = "f32"  # static: one of KV_KINDS
    layout: str = "td"  # static: "td" | "dt"

    def tree_flatten(self):
        return ((self.k, self.v, self.lengths, self.k_scale, self.v_scale),
                (self.kind, self.layout))

    @classmethod
    def tree_unflatten(cls, aux, children):
        kind, layout = aux if isinstance(aux, tuple) else (aux, "td")
        return cls(*children, kind=kind, layout=layout)

    @property
    def n_layer(self) -> int:
        return self.k.shape[0]

    @property
    def n_slots(self) -> int:
        return self.k.shape[1]

    @property
    def max_len(self) -> int:
        return self.k.shape[4 if self.layout == "dt" else 3]

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
    layout: str = "td",
) -> KVCache:
    if kind is None:
        kind = "q8_0" if quantized else ("f32" if dtype == jnp.float32 else "f16")
    if kind not in KV_KINDS:
        raise ValueError(f"kv cache kind {kind!r} not in {KV_KINDS}")
    if layout not in ("td", "dt"):
        raise ValueError(f"kv cache layout {layout!r} not in ('td', 'dt')")

    def cshape(d):
        return ((n_layer, n_slots, n_kv_head, d, max_len) if layout == "dt"
                else (n_layer, n_slots, n_kv_head, max_len, d))

    sshape = (n_layer, n_slots, n_kv_head, max_len)
    lengths = jnp.zeros((n_slots,), jnp.int32)
    if kind in ("q8_0", "q4_0"):
        if kind == "q4_0":
            if head_dim % 2:
                raise ValueError("q4_0 KV needs even head_dim")
            cs, cdt = cshape(head_dim // 2), jnp.uint8
        else:
            cs, cdt = cshape(head_dim), jnp.int8
        return KVCache(
            k=jnp.zeros(cs, cdt),
            v=jnp.zeros(cs, cdt),
            lengths=lengths,
            k_scale=jnp.zeros(sshape, jnp.float32),
            v_scale=jnp.zeros(sshape, jnp.float32),
            kind=kind,
            layout=layout,
        )
    cdtype = jnp.bfloat16 if kind == "f16" else dtype
    return KVCache(
        k=jnp.zeros(cshape(head_dim), cdtype),
        v=jnp.zeros(cshape(head_dim), cdtype),
        lengths=lengths,
        kind=kind,
        layout=layout,
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


def _put_slot_windows(arr: jax.Array, vals: jax.Array, slot_ids, starts,
                      n_valid, active, layout: str = "td") -> jax.Array:
    """Write vals [L, B, KH, Tc, *] into arr [L, S, KH, T, *] (layout
    "td") or [L, S, KH, *, T] (layout "dt"): row b's valid tokens land at
    cells [starts[b], starts[b]+n_valid[b]) of slot slot_ids[b], across
    ALL layers in one dynamic_update_slice per slot.

    The window start clamps to T-Tc when the padded window would cross the
    end (valid tokens always fit — engine invariant lengths + n_valid <=
    T): vals roll right by the clamp distance, and displaced positions,
    pad tokens, and inactive rows keep their old cells via a
    read-modify-write.

    Under "td", vals arrive with the T axis ALREADY in storage order
    ([..., KH, Tc, *]) so no transpose sits between the new rows and the
    update — a transpose there makes XLA layout-assign the whole cache to
    a transposed layout and insert a full-cache relayout copy every step
    (measured 2.2 ms/step at 4k ctx). Under "dt" the SMALL vals array is
    transposed to [..., KH, *, Tc] here (cheap; the cache side stays in
    its native layout). Scale planes ([L, S, KH, T]) already store T
    minor and take the "td" path in both layouts."""
    is_scale = vals.ndim == 4  # scale planes [L, B, KH, Tc]
    if layout == "dt" and not is_scale:
        return _put_slot_windows_dt(arr, vals, slot_ids, starts, n_valid,
                                    active)
    L, B, Tc = vals.shape[0], vals.shape[1], vals.shape[3]
    KH, T = arr.shape[2], arr.shape[3]
    sizes = (L, 1, KH, Tc) + (() if is_scale else (arr.shape[4],))
    if Tc == 1:
        if _BATCH_APPEND:
            # ONE scatter for all slots (PARITY round-3 lead: the per-slot
            # DUS loop costs ~19 us per slot): row b writes cell
            # (slot_ids[b], starts[b]); inactive rows scatter out of
            # bounds and mode="drop" discards them
            S = arr.shape[1]
            slot = jnp.where(active & (n_valid > 0), slot_ids, S)
            pos = jnp.minimum(starts, T - 1)
            upd = jnp.swapaxes(vals[:, :, :, 0], 0, 1).astype(arr.dtype)
            return arr.at[:, slot, :, pos].set(upd, mode="drop")
        # decode fast path: one unpadded token per row — no clamp roll and
        # no pad masking, so skip the read-modify-write; inactive rows skip
        # the write entirely via cond (the dynamic_slice read cost the same
        # as the write: measured 0.32 ms/step on 7B shapes)
        for b in range(B):
            pos = (0, slot_ids[b], 0, jnp.minimum(starts[b], T - 1)) + (
                () if is_scale else (0,))
            val = vals[:, b][:, None].astype(arr.dtype)
            arr = jax.lax.cond(
                active[b] & (n_valid[b] > 0),
                lambda a, v=val, p=pos: jax.lax.dynamic_update_slice(a, v, p),
                lambda a: a,
                arr,
            )
        return arr
    for b in range(B):
        s_c = jnp.clip(starts[b], 0, max(T - Tc, 0))
        d = starts[b] - s_c  # >= 0
        val = jnp.roll(vals[:, b], d, axis=2)[:, None]  # [L, 1, KH, Tc, *]
        j = jnp.arange(Tc, dtype=jnp.int32)
        ok = active[b] & (j >= d) & (j - d < n_valid[b])
        pos = (0, slot_ids[b], 0, s_c) + (() if is_scale else (0,))
        old = jax.lax.dynamic_slice(arr, pos, sizes)
        mask = ok[None, None, None, :] if is_scale else ok[None, None, None, :, None]
        arr = jax.lax.dynamic_update_slice(
            arr, jnp.where(mask, val.astype(arr.dtype), old), pos)
    return arr


def _put_slot_windows_dt(arr: jax.Array, vals: jax.Array, slot_ids, starts,
                         n_valid, active) -> jax.Array:
    """"dt" cell planes: arr [L, S, KH, Dk, T], vals [L, B, KH, Tc, Dk].
    Same window semantics as the "td" path; new cells land as [Dk, Tc]
    column blocks at lane offset starts[b]."""
    L, B, Tc = vals.shape[0], vals.shape[1], vals.shape[3]
    KH, Dk, T = arr.shape[2], arr.shape[3], arr.shape[4]
    vt = jnp.swapaxes(vals, 3, 4)  # [L, B, KH, Dk, Tc] (small array)
    sizes = (L, 1, KH, Dk, Tc)
    if Tc == 1:
        if _BATCH_APPEND:
            # ONE scatter for every slot (vs a B-long cond/DUS chain —
            # ~30 device ops per step per plane at B=8 across k/v/scales);
            # inactive rows scatter out of bounds and mode="drop" drops
            S = arr.shape[1]
            slot = jnp.where(active & (n_valid > 0), slot_ids, S)
            pos = jnp.minimum(starts, T - 1)
            upd = jnp.swapaxes(vt[:, :, :, :, 0], 0, 1).astype(arr.dtype)
            return arr.at[:, slot, :, :, pos].set(upd, mode="drop")
        for b in range(B):
            pos = (0, slot_ids[b], 0, 0, jnp.minimum(starts[b], T - 1))
            val = vt[:, b][:, None].astype(arr.dtype)
            arr = jax.lax.cond(
                active[b] & (n_valid[b] > 0),
                lambda a, v=val, p=pos: jax.lax.dynamic_update_slice(a, v, p),
                lambda a: a,
                arr,
            )
        return arr
    for b in range(B):
        s_c = jnp.clip(starts[b], 0, max(T - Tc, 0))
        d = starts[b] - s_c  # >= 0
        val = jnp.roll(vt[:, b], d, axis=3)[:, None]  # [L, 1, KH, Dk, Tc]
        j = jnp.arange(Tc, dtype=jnp.int32)
        ok = active[b] & (j >= d) & (j - d < n_valid[b])
        pos = (0, slot_ids[b], 0, 0, s_c)
        old = jax.lax.dynamic_slice(arr, pos, sizes)
        mask = ok[None, None, None, None, :]
        arr = jax.lax.dynamic_update_slice(
            arr, jnp.where(mask, val.astype(arr.dtype), old), pos)
    return arr


def append_step(cache: KVCache, k_rows: jax.Array, v_rows: jax.Array,
                slot_ids, starts, n_valid, active) -> KVCache:
    """Append one step's stacked new rows (k/v_rows [L, B, KH, Tc, D],
    UNROTATED, T axis already in storage order) for all layers at once;
    quantizes for q8_0/q4_0 kinds. Does NOT update lengths (the forward
    step owns that)."""
    lay = cache.layout
    if cache.kind in ("q8_0", "q4_0"):
        kc, ks = quantize_kv_rows(k_rows, cache.kind)
        vc, vs = quantize_kv_rows(v_rows, cache.kind)
        k = _put_slot_windows(cache.k, kc, slot_ids, starts, n_valid, active, lay)
        v = _put_slot_windows(cache.v, vc, slot_ids, starts, n_valid, active, lay)
        ksc = _put_slot_windows(cache.k_scale, ks, slot_ids, starts, n_valid, active, lay)
        vsc = _put_slot_windows(cache.v_scale, vs, slot_ids, starts, n_valid, active, lay)
        return KVCache(k, v, cache.lengths, ksc, vsc, cache.kind, lay)
    k = _put_slot_windows(cache.k, k_rows, slot_ids, starts, n_valid, active, lay)
    v = _put_slot_windows(cache.v, v_rows, slot_ids, starts, n_valid, active, lay)
    return KVCache(k, v, cache.lengths, cache.k_scale, cache.v_scale,
                   cache.kind, lay)


# -- seq ops (all jit-able, all metadata/index arithmetic) -------------------

def clear_all(cache: KVCache) -> KVCache:
    """Reference: llama_kv_cache_clear (llama_server_context.cc:287)."""
    return KVCache(cache.k, cache.v, jnp.zeros_like(cache.lengths),
                   cache.k_scale, cache.v_scale, cache.kind, cache.layout)


@jax.jit
def trim(cache: KVCache, slot: jax.Array, n: jax.Array) -> KVCache:
    """seq_rm(slot, n, -1): keep the first n cells (prompt-cache reuse,
    reference llama_server_context.cc:1539-1554)."""
    lengths = cache.lengths.at[slot].set(
        jnp.minimum(cache.lengths[slot], n).astype(jnp.int32)
    )
    return KVCache(cache.k, cache.v, lengths, cache.k_scale, cache.v_scale,
                   cache.kind, cache.layout)


@jax.jit
def clear_slot(cache: KVCache, slot: jax.Array) -> KVCache:
    return trim(cache, slot, jnp.int32(0))


def _map_planes(cache: KVCache, fn):
    k, v = fn(cache.k), fn(cache.v)
    ks = fn(cache.k_scale) if cache.k_scale is not None else None
    vs = fn(cache.v_scale) if cache.v_scale is not None else None
    return k, v, ks, vs


@jax.jit
def seq_cp(cache: KVCache, src: jax.Array, dst: jax.Array) -> KVCache:
    """Copy slot src's occupied prefix into slot dst (system-prompt
    broadcast, reference llama_server_context.cc:659-662). Copies whole
    rows; the occupied length governs validity."""
    k, v, ks, vs = _map_planes(cache, lambda a: a.at[:, dst].set(a[:, src]))
    lengths = cache.lengths.at[dst].set(cache.lengths[src])
    return KVCache(k, v, lengths, ks, vs, cache.kind, cache.layout)


@partial(jax.jit, static_argnames=("rope",))
def shift_compact(cache: KVCache, slot: jax.Array, n_keep: jax.Array,
                  n_discard: jax.Array,
                  rope: tuple | None = None) -> KVCache:
    """Context shift: evict cells [n_keep+1, n_keep+1+n_discard) and slide
    the tail down (reference llama_server_context.cc:1274-1306: seq_rm +
    seq_add(-d)). Because cell index == position, the slide renumbers
    positions implicitly.

    rope = (rope_dim, inv_freq_tuple) when the cache stores K ROTATED
    (model/llama.py rot_cache; the upstream llama.cpp design): moved cells
    were rotated by their OLD position, so re-rotate them by -n_discard
    (rotation composition — position-independent, one cos/sin vector).
    inv_freq_tuple is cfg.rope_freq_table()[0] — the EFFECTIVE per-pair
    frequencies with linear/yarn/llama3 scaling folded in (the delta
    rotation must not re-apply yarn's magnitude scale, so mscale is
    excluded). Quantized K is dequantized, re-rotated, and requantized,
    exactly like upstream llama.cpp's K-shift on a quantized cache.
    """
    T = cache.max_len
    dt = cache.layout == "dt"
    idx = jnp.arange(T, dtype=jnp.int32)
    # source index for each destination cell
    src = jnp.where(idx > n_keep, idx + n_discard, idx)
    src = jnp.minimum(src, T - 1)
    moved_t = src != idx  # [T]

    def gather_slot(arr, t_last: bool):
        # gather the T axis of the picked slot: axis -1 when T is minor
        # ("dt" cells and BOTH layouts' scale planes), else axis 2 of the
        # sliced [L, KH, T, D*]
        if t_last:
            return arr.at[:, slot].set(arr[:, slot][..., src])
        return arr.at[:, slot].set(arr[:, slot][:, :, src])

    k = gather_slot(cache.k, dt)
    v = gather_slot(cache.v, dt)
    ks = gather_slot(cache.k_scale, True) if cache.k_scale is not None else None
    vs = gather_slot(cache.v_scale, True) if cache.v_scale is not None else None

    if rope is not None:
        rd, inv_freq_t = rope
        half = rd // 2
        inv_freq = jnp.asarray(inv_freq_t, jnp.float32)
        ang = -n_discard.astype(jnp.float32) * inv_freq  # [half]
        cos, sin = jnp.cos(ang), jnp.sin(ang)

        def rot_delta(x):  # x [..., T, D] float, split-half rotation
            x1, x2, rest = x[..., :half], x[..., half:rd], x[..., rd:]
            out = jnp.concatenate(
                [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
            if rest.shape[-1]:
                out = jnp.concatenate([out, rest], axis=-1)
            return out

        krow = k[:, slot]  # [L, KH, T, D*] ("td") | [L, KH, D*, T] ("dt")
        if dt:  # normalize to [..., T, D*] for the shared rot/requant path
            krow = jnp.swapaxes(krow, -1, -2)
        moved = moved_t[None, :, None]  # [1, T, 1] over [KH, T, D*]
        if cache.kind in ("q8_0", "q4_0"):
            kd = dequant_kv(krow, ks[:, slot], cache.kind)
            kr = rot_delta(kd)
            qc, qsc = quantize_kv_rows(kr, cache.kind)
            newk = jnp.where(moved, qc, krow)
            ks = ks.at[:, slot].set(
                jnp.where(moved[..., 0], qsc, ks[:, slot]))
        else:
            newk = jnp.where(moved, rot_delta(krow.astype(jnp.float32)),
                             krow.astype(jnp.float32))
        if dt:
            newk = jnp.swapaxes(newk, -1, -2)
        k = k.at[:, slot].set(newk.astype(k.dtype))

    lengths = cache.lengths.at[slot].set(cache.lengths[slot] - n_discard)
    return KVCache(k, v, lengths, ks, vs, cache.kind, cache.layout)


def default_layout(kind: str | None, head_dim: int) -> str:
    """Storage layout policy (see KVCache.layout): the transposed "dt"
    layout whenever "td" would waste lanes — any quantized kind (q4_0
    packs D/2 bytes; q8_0 gains the pre-transposed K dot + lane-resident
    scales) or head_dim < 128 (half-empty (8, 128) tiles). f16/f32 at
    D >= 128 keeps the proven "td" path. TPU_ENGINE_KV_LAYOUT overrides
    for A/B measurement."""
    env = _os.environ.get("TPU_ENGINE_KV_LAYOUT", "")
    if env in ("td", "dt"):
        return env
    if kind in ("q8_0", "q4_0") or head_dim < 128:
        return "dt"
    return "td"
