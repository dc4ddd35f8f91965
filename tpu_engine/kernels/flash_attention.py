"""Pallas TPU flash attention over the slot-paged KV cache.

The TPU-native replacement for llama.cpp's flash-attention path
(params.flash_attn, forced when KV is quantized — reference
/root/reference/src/llama_engine.cc:639-647; SURVEY.md section 2b "Flash
attention"). Two kernels:

  decode  (Tc=1): grid (B, kv_blocks) with ALL kv heads merged into one
          score axis per step (block-diagonal head mask) — one
          [H, D] x [D, KH*Tblk] MXU dot and KH x larger DMAs per step.
  prefill (Tc>1): grid (B, KH, q_blocks, kv_blocks) — enough q rows per
          head to feed the MXU without merging.

TPU-first design points:
  - DEFERRED APPEND (kvcache/cache.py): the cache holds only history
    (cells < start); the step's own K/V rows arrive as small in-flight
    operands (K pre-rotated outside) and fold into the online softmax at
    each row's last kv block.
  - The kernel reads the WHOLE cache array [L, S, KH, T, D] with the layer
    index and slot ids as scalar-prefetch arguments — no gather copy of
    the cache ever materializes, and every layer shares one compiled
    kernel.
  - KV cells stream from HBM in their STORED form (bf16/f32, q8_0 int8 +
    row scale, q4_0 split-half nibbles) and dequantize in VMEM — a
    materialized full-precision cache never exists.
  - K history is stored PRE-ROTATED in the common case (rot_cache=True —
    the upstream llama.cpp design; saved ~150 us/step on v5e) and the
    kernel skips rotation; context shift re-ropes moved cells
    (kvcache.shift_compact). When self-extend is on (ga_n>1) K is stored
    unrotated and rotation happens here from precomputed cos/sin tables
    indexed by cell (the ga remap is baked into the tables, which XLA
    CSEs across layers). All models run split-half "neox" rotation:
    "norm"-rope models are de-interleaved at load (model/loader.py
    deinterleave_rope_perm), so the rotate is two lane-dim halves, never
    a lane interleave.
  - per-(row, q-block) valid-length clamp via scalar prefetch: kv blocks
    past the history frontier map to the previous block index (no new
    DMA) and skip all compute — decode cost scales with the ACTUAL
    context length, not the allocated max_len.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..model.config import ModelConfig

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _dequant_block(cells, scale_col, kind: str):
    """cells [T, Dk] stored form -> f32 [T, D]; scale_col [T, 1] or None."""
    if kind in ("f32", "f16"):
        return cells.astype(jnp.float32)
    if kind == "q8_0":
        return cells.astype(jnp.float32) * scale_col
    # q4_0 split-half packing (kvcache/cache.py quantize_kv_rows)
    c = cells.astype(jnp.int32)
    lo = (c & 0xF) - 8
    hi = (c >> 4) - 8
    return jnp.concatenate([lo, hi], axis=1).astype(jnp.float32) * scale_col


def _rotate(x, cos, sin, cfg: ModelConfig):
    """Split-half rotation of x [T, D] by tables cos/sin [T, rd/2]."""
    rd, half = cfg.rope_dim, cfg.rope_dim // 2
    x1, x2 = x[:, :half], x[:, half:rd]
    rot = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=1)
    if rd < x.shape[1]:
        rot = jnp.concatenate([rot, x[:, rd:]], axis=1)
    return rot


def _rope_tables(Tpad: int, cfg: ModelConfig, ga_n, ga_w):
    """cos/sin [Tpad, rd/2] by cell index, self-extend remap baked in.
    Computed in XLA outside the kernel; CSE'd across the layer loop."""
    pos = jnp.arange(Tpad, dtype=jnp.int32)
    pos = jnp.where(
        (ga_n > 1) & (pos >= ga_w), ga_w + (pos - ga_w) // jnp.maximum(ga_n, 1), pos
    )
    inv_freq_t, mscale = cfg.rope_freq_table()  # linear/yarn/llama3 folded in
    inv_freq = jnp.asarray(inv_freq_t, jnp.float32)
    ang = pos.astype(jnp.float32)[:, None] * inv_freq[None, :]
    if mscale != 1.0:
        return jnp.cos(ang) * mscale, jnp.sin(ang) * mscale
    return jnp.cos(ang), jnp.sin(ang)


def _online_update(s, vf, acc_ref, m_ref, l_ref):
    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
        p, vf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)


def _softcap(s, cfg: ModelConfig):
    if cfg.attn_logit_softcap > 0:
        return jnp.tanh(s / cfg.attn_logit_softcap) * cfg.attn_logit_softcap
    return s


# --------------------------------------------------------------------------
# decode kernel (Tc = 1): heads merged
# --------------------------------------------------------------------------

def _decode_kernel(
    li_ref, slots_ref, starts_ref, win_ref,  # scalar prefetch (SMEM)
    q_ref, kn_ref, vn_ref, k_ref, v_ref, cos_ref, sin_ref, ks_ref, vs_ref,
    out_ref,
    acc_ref, m_ref, l_ref,
    *, cfg: ModelConfig, kind: str, G: int, Tblk: int, n_kb: int,
    rotated: bool = False,
):
    b = pl.program_id(0)
    kb = pl.program_id(1)
    D = cfg.head_dim
    KH = kn_ref.shape[1]  # from the block shape: local kv heads under TP
    H = KH * G
    RQ = acc_ref.shape[0]
    C = KH * Tblk

    start = starts_ref[b]  # history length; cells < start are valid
    last_kb = jnp.maximum((start + Tblk - 1) // Tblk - 1, 0)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(kb <= last_kb)
    def _():  # noqa: F811
        qx = q_ref[0, 0].reshape(H, D).astype(jnp.float32)
        if RQ != H:
            qx = jnp.pad(qx, ((0, RQ - H), (0, 0)))

        @pl.when(start > 0)
        def _():
            # [KH, Tblk, Dk] -> [KH*Tblk, Dk]; flat row c: head c//Tblk,
            # cell kb*Tblk + c%Tblk. Tables tile along the head repeats.
            kcells = k_ref[0].reshape(C, k_ref.shape[-1])
            vcells = v_ref[0].reshape(C, v_ref.shape[-1])
            ks = ks_ref[0].reshape(C, 1) if ks_ref is not None else None
            vs = vs_ref[0].reshape(C, 1) if vs_ref is not None else None
            if rotated:  # K cells stored pre-rotated (llama.cpp design)
                kf = _dequant_block(kcells, ks, kind)
            else:
                cos = pltpu.repeat(cos_ref[:], KH, axis=0) if KH > 1 else cos_ref[:]
                sin = pltpu.repeat(sin_ref[:], KH, axis=0) if KH > 1 else sin_ref[:]
                kf = _rotate(_dequant_block(kcells, ks, kind), cos, sin, cfg)
            vf = _dequant_block(vcells, vs, kind)

            s = jax.lax.dot_general(
                qx, kf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * cfg.attention_scale()
            s = _softcap(s, cfg)

            row_head = jax.lax.broadcasted_iota(jnp.int32, (RQ, C), 0) // G
            col_flat = jax.lax.broadcasted_iota(jnp.int32, (RQ, C), 1)
            cell_abs = kb * Tblk + col_flat % Tblk
            ok = (row_head == col_flat // Tblk) & (cell_abs < start)
            w = win_ref[0]  # sliding window (gemma2 local layers); 0 = global
            ok = ok & ((w <= 0) | (cell_abs > start - w))
            s = jnp.where(ok, s, NEG_INF)
            _online_update(s, vf, acc_ref, m_ref, l_ref)

        @pl.when(kb == last_kb)
        def _():
            # fold in the step's own (in-flight, pre-rotated) K/V row
            kn = kn_ref[0, :, 0].astype(jnp.float32)  # [KH, D]
            vn = vn_ref[0, :, 0].astype(jnp.float32)
            s_new = jax.lax.dot_general(
                qx, kn, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * cfg.attention_scale()
            s_new = _softcap(s_new, cfg)
            row_head = jax.lax.broadcasted_iota(jnp.int32, (RQ, KH), 0) // G
            col = jax.lax.broadcasted_iota(jnp.int32, (RQ, KH), 1)
            s_new = jnp.where(row_head == col, s_new, NEG_INF)
            _online_update(s_new, vn, acc_ref, m_ref, l_ref)

    @pl.when(kb == n_kb - 1)
    def _():
        out = acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)
        out_ref[0, 0] = out[:H].reshape(KH, G, D).astype(out_ref.dtype)


def _decode_kernel_bh(
    li_ref, slots_ref, starts_ref, win_ref,  # scalar prefetch (SMEM)
    q_ref, kn_ref, vn_ref, k_ref, v_ref, cos_ref, sin_ref, ks_ref, vs_ref,
    out_ref,
    acc_ref, m_ref, l_ref,
    *, cfg: ModelConfig, kind: str, G: int, Tblk: int, n_kb: int,
    rotated: bool = True,
):
    """Batched-head decode step (rot_cache path): heads stay a BATCH axis
    of 3-D dots instead of merging into one score axis.  vs the merged
    kernel this removes the KH-times-redundant mask/exp/PV work (only the
    block diagonal of the merged [H, KH*Tblk] scores was ever valid) and
    feeds K/V to the MXU in their stored integer/bf16 form — scales factor
    out of the dot exactly (s*ks post-dot; vs folded into p), so no
    [C, D]-sized f32 dequant materializes.  Measured on v5e at 7B decode
    shapes (KH=32, D=128, fill 128): 154 -> ~40 us/layer."""
    del li_ref, slots_ref, cos_ref, sin_ref  # consumed by index maps only
    b = pl.program_id(0)
    kb = pl.program_id(1)
    KH = k_ref.shape[2]
    start = starts_ref[b]
    last_kb = jnp.maximum((start + Tblk - 1) // Tblk - 1, 0)
    ct = jnp.float32 if kind == "f32" else jnp.bfloat16
    dims_qk = (((2,), (2,)), ((0,), (0,)))  # [KH,G,D]x[KH,T,D] -> [KH,G,T]
    dims_pv = (((2,), (1,)), ((0,), (0,)))  # [KH,G,T]x[KH,T,D] -> [KH,G,D]

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    def update(s, p_extra, vf, dot_pv):
        """Online-softmax fold of one score block s [KH, G, C]."""
        m_prev = m_ref[:, :, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=2, keepdims=True)
        if p_extra is not None:  # quantized V: fold row scales into p
            p = p * p_extra
        acc_ref[:] = acc_ref[:] * corr + dot_pv(p, vf)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(kb <= last_kb)
    def _():  # noqa: F811
        q = q_ref[0, 0].astype(ct)  # [KH, G, D]

        @pl.when(start > 0)
        def _():
            kq = k_ref[0, 0]  # [KH, Tblk, Dk] stored form
            vq = v_ref[0, 0]
            if kind == "q4_0":
                c = kq.astype(jnp.int32)
                kf = jnp.concatenate([(c & 0xF) - 8, (c >> 4) - 8],
                                     axis=2).astype(ct)
                c = vq.astype(jnp.int32)
                vf = jnp.concatenate([(c & 0xF) - 8, (c >> 4) - 8],
                                     axis=2).astype(ct)
            else:  # f16/f32 direct; q8_0 int8 is exact in bf16
                kf = kq.astype(ct)
                vf = vq.astype(ct)
            s = jax.lax.dot_general(
                q, kf, dims_qk, preferred_element_type=jnp.float32)
            if ks_ref is not None:  # row scales factor out of the dot
                s = s * ks_ref[0, 0]  # [KH, 1, Tblk] broadcasts over G
            s = _softcap(s * cfg.attention_scale(), cfg)
            cell = kb * Tblk + jax.lax.broadcasted_iota(
                jnp.int32, (KH, G, Tblk), 2)
            ok = cell < start
            w = win_ref[0]  # sliding window (gemma2 local layers); 0 = off
            ok = ok & ((w <= 0) | (cell > start - w))
            s = jnp.where(ok, s, NEG_INF)
            vs = vs_ref[0, 0] if vs_ref is not None else None
            update(s, vs, vf, lambda p, vf: jax.lax.dot_general(
                p.astype(ct), vf, dims_pv,
                preferred_element_type=jnp.float32))

        @pl.when(kb == last_kb)
        def _():
            # the step's own (in-flight, pre-rotated, full-precision) row
            kn = kn_ref[0].astype(ct)  # [KH, 1, D]
            vn = vn_ref[0].astype(jnp.float32)
            sn = jax.lax.dot_general(
                q, kn, dims_qk, preferred_element_type=jnp.float32)
            sn = _softcap(sn * cfg.attention_scale(), cfg)  # [KH, G, 1]
            # PV contraction is length-1: a broadcast multiply, not a dot
            update(sn, None, vn, lambda p, vf: p * vf)

    @pl.when(kb == n_kb - 1)
    def _():
        out = acc_ref[:] / jnp.maximum(l_ref[:, :, :1], 1e-30)
        out_ref[0, 0] = out.astype(out_ref.dtype)


def _decode_kernel_t(
    li_ref, slots_ref, starts_ref, win_ref,  # scalar prefetch (SMEM)
    q_ref, kn_ref, vn_ref, k_ref, v_ref, cos_ref, sin_ref, ks_ref, vs_ref,
    out_ref,
    acc_ref, m_ref, l_ref,
    *, cfg: ModelConfig, kind: str, G: int, Tblk: int, n_kb: int,
    rotated: bool = True,
):
    """Decode over the TRANSPOSED ("dt") cache: blocks arrive [KH, D, T]
    with cells in the LANE dim — full (8,128) tiles at any head_dim
    (kvcache/cache.py KVCache.layout; the "td" D=64 / q4_0 packed-D/2
    half-tile pathology measured 991 us/layer vs a 5.4 us floor at
    TinyLlama shapes, PARITY.md round-4). K arrives pre-transposed for
    the QK^T dot: scores = q [KH,G,D] x k [KH,D,Tblk] is the canonical
    MXU contraction. Handles both rotated (pre-rotated K, the rot_cache
    default) and unrotated (self-extend: in-kernel rotation from
    transposed [rd/2, T] tables; per-token scales commute with rotation
    because rope only mixes the D axis)."""
    b = pl.program_id(0)
    kb = pl.program_id(1)
    KH = k_ref.shape[2]
    D = cfg.head_dim
    start = starts_ref[b]
    last_kb = jnp.maximum((start + Tblk - 1) // Tblk - 1, 0)
    ct = jnp.float32 if (kind == "f32" or not rotated) else jnp.bfloat16
    dims_qk = (((2,), (1,)), ((0,), (0,)))  # [KH,G,D]x[KH,D,T] -> [KH,G,T]
    dims_pv = (((2,), (2,)), ((0,), (0,)))  # [KH,G,T]x[KH,D,T] -> [KH,G,D]

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    def update(s, p_extra, vf, dot_pv):
        m_prev = m_ref[:, :, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=2, keepdims=True)
        if p_extra is not None:  # quantized V: fold row scales into p
            p = p * p_extra
        acc_ref[:] = acc_ref[:] * corr + dot_pv(p, vf)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(kb <= last_kb)
    def _():  # noqa: F811
        q = q_ref[0, 0].astype(ct)  # [KH, G, D]

        @pl.when(start > 0)
        def _():
            kq = k_ref[0, 0]  # [KH, Dk2, Tblk] stored form
            vq = v_ref[0, 0]
            if kind == "q4_0":  # split-half packed along D -> sublane concat
                c = kq.astype(jnp.int32)
                kf = jnp.concatenate([(c & 0xF) - 8, (c >> 4) - 8],
                                     axis=1).astype(ct)
                c = vq.astype(jnp.int32)
                vf = jnp.concatenate([(c & 0xF) - 8, (c >> 4) - 8],
                                     axis=1).astype(ct)
            else:  # f16/f32 direct; q8_0 int8 is exact in bf16
                kf = kq.astype(ct)
                vf = vq.astype(ct)
            ks = ks_ref[0, 0] if ks_ref is not None else None  # [KH,1,Tblk]
            if not rotated:
                # self-extend: rotate the stored-order K in f32. The
                # per-token scale is constant over D, so dequant-first
                # == rotate-then-scale; apply scales pre-dot here.
                if ks is not None:
                    kf = kf * ks
                half = cfg.rope_dim // 2
                cos = cos_ref[:][None]  # [1, rd/2, Tblk]
                sin = sin_ref[:][None]
                x1, x2 = kf[:, :half], kf[:, half:cfg.rope_dim]
                rot = jnp.concatenate(
                    [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=1)
                if cfg.rope_dim < D:
                    rot = jnp.concatenate([rot, kf[:, cfg.rope_dim:]], axis=1)
                kf = rot
            s = jax.lax.dot_general(
                q, kf, dims_qk, preferred_element_type=jnp.float32)
            if rotated and ks is not None:  # scales factor out of the dot
                s = s * ks
            s = _softcap(s * cfg.attention_scale(), cfg)
            cell = kb * Tblk + jax.lax.broadcasted_iota(
                jnp.int32, (KH, G, Tblk), 2)
            ok = cell < start
            w = win_ref[0]  # sliding window (gemma2 local layers); 0 = off
            ok = ok & ((w <= 0) | (cell > start - w))
            s = jnp.where(ok, s, NEG_INF)
            vs = vs_ref[0, 0] if vs_ref is not None else None
            update(s, vs, vf, lambda p, vf: jax.lax.dot_general(
                p.astype(ct), vf, dims_pv,
                preferred_element_type=jnp.float32))

        @pl.when(kb == last_kb)
        def _():
            # the step's own (in-flight, pre-rotated, full-precision) row
            kn = kn_ref[0].astype(ct)  # [KH, 1, D]
            vn = vn_ref[0].astype(jnp.float32)
            sn = jax.lax.dot_general(
                q, kn, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            sn = _softcap(sn * cfg.attention_scale(), cfg)  # [KH, G, 1]
            update(sn, None, vn, lambda p, vf: p * vf)

    @pl.when(kb == n_kb - 1)
    def _():
        out = acc_ref[:] / jnp.maximum(l_ref[:, :, :1], 1e-30)
        out_ref[0, 0] = out.astype(out_ref.dtype)


def _decode_kernel_dma(
    li_ref, slots_ref, starts_ref, win_ref,  # scalar prefetch (SMEM)
    q_ref, kn_ref, vn_ref, k_hbm, v_hbm, ks_hbm, vs_hbm,
    out_ref,
    acc_ref, m_ref, l_ref, kbuf, vbuf, ksbuf, vsbuf, sem,
    *, cfg: ModelConfig, kind: str, G: int, Tblk: int, B: int,
):
    """Transposed-cache decode with MANUAL double-buffered DMA over ONE
    flat dynamic (slot, block) loop (grid = (1,)).

    The BlockSpec kernels iterate a STATIC kv grid sized by the ALLOCATED
    context: every block past a slot's real fill still costs a clamped
    grid step (~0.7 us), so decode time scales with max_len, not fill —
    measured 300 us/layer at 7B fill=256 over a 4096-cell cache vs a 41 us
    DMA floor. Here the loop visits only the `cdiv(start_b, Tblk)` live
    blocks of every slot, and the NEXT iteration's copies — even across a
    slot boundary — overlap the current block's dot/softmax (a per-slot
    grid left the slot's first DMA latency exposed ~4 us x B per layer:
    measured 58 us/layer at 7B fill~150 vs ~25 for this form). K/V stay
    in ANY/HBM; only [KH, D, Tblk] tiles are VMEM-resident. Accumulators
    carry every slot ([B, KH, G, *]) so the in-flight fold and the final
    normalize run once, vectorized over B. Requires layout="dt" and
    rot_cache (pre-rotated K — the serving default; self-extend uses the
    BlockSpec kernel)."""
    KH = kbuf.shape[1]
    li = li_ref[0]
    ct = jnp.float32 if kind == "f32" else jnp.bfloat16
    dims_qk = (((2,), (1,)), ((0,), (0,)))  # [KH,G,D]x[KH,D,T] -> [KH,G,T]
    dims_pv = (((2,), (2,)), ((0,), (0,)))  # [KH,G,T]x[KH,D,T] -> [KH,G,D]
    quant = ks_hbm is not None

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    def nblk(b):
        return (starts_ref[b] + Tblk - 1) // Tblk

    def dmas(b, i, buf):
        off = i * Tblk
        s = jnp.minimum(slots_ref[b], k_hbm.shape[1] - 1)
        cps = [
            pltpu.make_async_copy(
                k_hbm.at[li, s, :, :, pl.ds(off, Tblk)], kbuf.at[buf],
                sem.at[buf, 0]),
            pltpu.make_async_copy(
                v_hbm.at[li, s, :, :, pl.ds(off, Tblk)], vbuf.at[buf],
                sem.at[buf, 1]),
        ]
        if quant:
            cps += [
                pltpu.make_async_copy(
                    ks_hbm.at[li, s, :, :, pl.ds(off, Tblk)], ksbuf.at[buf],
                    sem.at[buf, 2]),
                pltpu.make_async_copy(
                    vs_hbm.at[li, s, :, :, pl.ds(off, Tblk)], vsbuf.at[buf],
                    sem.at[buf, 3]),
            ]
        return cps

    def first_live(b):
        # smallest b' >= b with work; B when none remain
        def cond(bb):
            return (bb < B) & (nblk(bb) == 0)

        return jax.lax.while_loop(cond, lambda bb: bb + 1, b)

    def nxt_pair(b, i):
        # successor of (b, i) in the flat walk; b == B past the end
        return jax.lax.cond(
            i + 1 < nblk(b),
            lambda: (b, i + 1),
            lambda: (first_live(b + 1), 0),
        )

    b0 = first_live(0)

    @pl.when(b0 < B)
    def _():
        for cp in dmas(b0, 0, 0):
            cp.start()

    def body(state):
        b, i, buf = state
        bn, in_ = nxt_pair(b, i)

        @pl.when(bn < B)
        def _():
            for cp in dmas(bn, in_, 1 - buf):
                cp.start()

        for cp in dmas(b, i, buf):
            cp.wait()
        start = starts_ref[b]
        q = q_ref[b, 0].astype(ct)  # [KH, G, D]
        kq = kbuf[buf]  # [KH, Dk2, Tblk] stored form
        vq = vbuf[buf]
        if kind == "q4_0":
            c = kq.astype(jnp.int32)
            kf = jnp.concatenate([(c & 0xF) - 8, (c >> 4) - 8],
                                 axis=1).astype(ct)
            c = vq.astype(jnp.int32)
            vf = jnp.concatenate([(c & 0xF) - 8, (c >> 4) - 8],
                                 axis=1).astype(ct)
        else:
            kf = kq.astype(ct)
            vf = vq.astype(ct)
        sc = jax.lax.dot_general(
            q, kf, dims_qk, preferred_element_type=jnp.float32)
        if quant:
            sc = sc * ksbuf[buf]  # [KH, 1, Tblk] broadcasts over G
        sc = _softcap(sc * cfg.attention_scale(), cfg)
        cell = i * Tblk + jax.lax.broadcasted_iota(
            jnp.int32, (KH, G, Tblk), 2)
        ok = cell < start
        w = win_ref[0]
        ok = ok & ((w <= 0) | (cell > start - w))
        sc = jnp.where(ok, sc, NEG_INF)

        m_prev = m_ref[b, :, :, :1]
        m_new = jnp.maximum(m_prev, jnp.max(sc, axis=2, keepdims=True))
        p = jnp.exp(sc - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_ref[b] = l_ref[b] * corr + jnp.sum(p, axis=2, keepdims=True)
        if quant:
            p = p * vsbuf[buf]
        acc_ref[b] = acc_ref[b] * corr + jax.lax.dot_general(
            p.astype(ct), vf, dims_pv, preferred_element_type=jnp.float32)
        m_ref[b] = jnp.broadcast_to(m_new, m_ref[b].shape)
        return (bn, in_, 1 - buf)

    jax.lax.while_loop(lambda st: st[0] < B, body, (b0, 0, 0))

    # every slot's in-flight (pre-rotated, full-precision) row + finalize,
    # vectorized over B
    q_all = q_ref[:, 0].astype(jnp.float32)  # [B, KH, G, D]
    kn = kn_ref[:].astype(jnp.float32)  # [B, KH, 1, D]
    vn = vn_ref[:].astype(jnp.float32)
    # length-1 kv: an elementwise multiply-reduce, not a dot (Mosaic's
    # tpu.matmul supports at most one batch dim)
    sn = jnp.sum(q_all * kn, axis=3, keepdims=True)  # [B, KH, G, 1]
    sn = _softcap(sn * cfg.attention_scale(), cfg)
    m_prev = m_ref[:, :, :, :1]
    m_new = jnp.maximum(m_prev, sn)
    p = jnp.exp(sn - m_new)
    corr = jnp.exp(m_prev - m_new)
    l_fin = l_ref[:] * corr + p
    acc = acc_ref[:] * corr + p * vn
    out_ref[:, 0] = (acc / jnp.maximum(l_fin[:, :, :, :1], 1e-30)
                     ).astype(out_ref.dtype)


def _dma_tblk(T: int, KH: int, Dk2: int, elt: int) -> int | None:
    """Largest 128-multiple divisor of T whose double-buffered K+V tiles
    fit a ~4 MB scratch budget, preferring a divisor that yields >= 2
    blocks so the next block's DMA overlaps the current block's compute
    (a single whole-row block serializes transfer and compute); None when
    T has no usable divisor (caller falls back to the BlockSpec kernel)."""
    if T % 128:
        return None
    budget = 4 << 20
    best = best_multi = None
    for m in range(1, T // 128 + 1):
        tb = m * 128
        if T % tb:
            continue
        if 4 * KH * Dk2 * tb * elt <= budget:  # 2 planes x 2 buffers
            best = tb
            if tb * 2 <= T:
                best_multi = tb
    return best_multi or best


@functools.partial(jax.jit, static_argnames=("cfg", "kind", "interpret"))
def _decode_call_dma(q5, k_new, v_new, k_all, v_all, ks_all, vs_all,
                     li, slots, starts, win,
                     *, cfg: ModelConfig, kind: str, interpret: bool,
                     Tblk: int | None = None):
    """Manual-DMA transposed-cache decode (see _decode_kernel_dma)."""
    B, _, KH, G, D = q5.shape
    T = k_all.shape[4]
    Dk2 = k_all.shape[3]
    elt = 4 if kind == "f32" else (2 if kind == "f16" else 1)
    Tblk = Tblk or _dma_tblk(T, KH, Dk2, elt)
    assert Tblk is not None and T % Tblk == 0

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # q5 (small, whole array)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # k_new
        pl.BlockSpec(memory_space=pltpu.VMEM),  # v_new
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args = [q5, k_new, v_new, k_all, v_all]
    quant = ks_all is not None
    if quant:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pl.ANY)]
        args += [ks_all[:, :, :, None, :], vs_all[:, :, :, None, :]]
        kernel = _decode_kernel_dma
    else:
        kernel = lambda li, sl, st, wn, q, kn, vn, k, v, o, a, m, l, kb, vb, se, **kw: \
            _decode_kernel_dma(li, sl, st, wn, q, kn, vn, k, v, None, None,
                               o, a, m, l, kb, vb, None, None, se, **kw)

    scratch = [
        pltpu.VMEM((B, KH, G, D), jnp.float32),
        pltpu.VMEM((B, KH, G, 128), jnp.float32),
        pltpu.VMEM((B, KH, G, 128), jnp.float32),
        pltpu.VMEM((2, KH, Dk2, Tblk), k_all.dtype),
        pltpu.VMEM((2, KH, Dk2, Tblk), v_all.dtype),
    ]
    if quant:
        scratch += [
            pltpu.VMEM((2, KH, 1, Tblk), jnp.float32),
            pltpu.VMEM((2, KH, 1, Tblk), jnp.float32),
        ]
    scratch += [pltpu.SemaphoreType.DMA((2, 4 if quant else 2))]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        functools.partial(kernel, cfg=cfg, kind=kind, G=G, Tblk=Tblk, B=B),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q5.shape, q5.dtype),
        interpret=interpret,
    )(jnp.asarray(li, jnp.int32).reshape(1), slots, starts, win, *args)


@functools.partial(jax.jit, static_argnames=("cfg", "kind", "interpret",
                                              "rotated"))
def _decode_call_t(q5, k_new, v_new, k_all, v_all, ks_all, vs_all,
                   li, slots, starts, win, ga,
                   *, cfg: ModelConfig, kind: str, interpret: bool,
                   rotated: bool = True):
    """Transposed-cache decode: cache k/v [L, S, KH, Dk2, T] (T in lanes);
    q5/k_new/v_new/scales exactly as _decode_call."""
    import os as _os

    B, _, KH, G, D = q5.shape
    T = k_all.shape[4]
    Dk2 = k_all.shape[3]

    c_budget = int(_os.environ.get("TPU_ENGINE_FA_CBUDGET", str(1 << 18)))
    Tblk = max(128, c_budget // (KH * D * 4) // 128 * 128)
    Tblk = min(Tblk, _round_up(T, 128))
    n_kb = pl.cdiv(T, Tblk)
    Tpad = Tblk * n_kb

    half = cfg.rope_dim // 2
    if rotated:  # tables unused: one zero block, never re-fetched
        cos_t = sin_t = jnp.zeros((half, Tblk), jnp.float32)
    else:  # transposed tables [rd/2, Tpad] (cells ride lanes)
        c0, s0 = _rope_tables(Tpad, cfg, ga[0], ga[1])
        cos_t, sin_t = c0.T, s0.T

    def q_map(b, kb, *_):
        return (b, 0, 0, 0, 0)

    def new_map(b, kb, *_):
        return (b, 0, 0, 0)

    def clamp(b, kb, starts):
        return jnp.minimum(kb, jnp.maximum((starts[b] + Tblk - 1) // Tblk - 1, 0))

    def kv_map(b, kb, li, slots, starts, win):
        s = jnp.minimum(slots[b], k_all.shape[1] - 1)
        return (li[0], s, 0, 0, clamp(b, kb, starts))

    def tab_map(b, kb, li, slots, starts, win):
        if rotated:
            return (0, 0)
        return (0, clamp(b, kb, starts))

    in_specs = [
        pl.BlockSpec((1, 1, KH, G, D), q_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, KH, 1, D), new_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, KH, 1, D), new_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, KH, Dk2, Tblk), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, KH, Dk2, Tblk), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((half, Tblk), tab_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((half, Tblk), tab_map, memory_space=pltpu.VMEM),
    ]
    args = [q5, k_new, v_new, k_all, v_all, cos_t, sin_t]
    if ks_all is not None:
        def sc_map(b, kb, li, slots, starts, win):
            s = jnp.minimum(slots[b], k_all.shape[1] - 1)
            return (li[0], s, 0, 0, clamp(b, kb, starts))

        in_specs += [
            pl.BlockSpec((1, 1, KH, 1, Tblk), sc_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KH, 1, Tblk), sc_map, memory_space=pltpu.VMEM),
        ]
        args += [ks_all[:, :, :, None, :], vs_all[:, :, :, None, :]]
        kernel = _decode_kernel_t
    else:
        kernel = lambda li, sl, st, wn, q, kn, vn, k, v, co, si, o, a, m, l, **kw: \
            _decode_kernel_t(li, sl, st, wn, q, kn, vn, k, v, co, si,
                             None, None, o, a, m, l, **kw)
    kernel = functools.partial(kernel, rotated=rotated)

    if T != Tpad:
        pad = [(0, 0)] * 5
        pad[4] = (0, Tpad - T)
        args[3] = jnp.pad(args[3], pad)
        args[4] = jnp.pad(args[4], pad)
        if ks_all is not None:
            args[7] = jnp.pad(args[7], pad)
            args[8] = jnp.pad(args[8], pad)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, n_kb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, KH, G, D), q_map, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((KH, G, D), jnp.float32),
            pltpu.VMEM((KH, G, 128), jnp.float32),
            pltpu.VMEM((KH, G, 128), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(kernel, cfg=cfg, kind=kind, G=G, Tblk=Tblk, n_kb=n_kb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q5.shape, q5.dtype),
        interpret=interpret,
    )(jnp.asarray(li, jnp.int32).reshape(1), slots, starts, win, *args)


@functools.partial(jax.jit, static_argnames=("cfg", "kind", "interpret",
                                              "rotated"))
def _decode_call(q5, k_new, v_new, k_all, v_all, ks_all, vs_all,
                 li, slots, starts, win, ga,
                 *, cfg: ModelConfig, kind: str, interpret: bool,
                 rotated: bool = False):
    """q5 [B, 1, KH, G, D]; k/v_new [B, KH, 1, D] rotated in-flight rows;
    cache k/v [L, S, KH, T, Dk]; scales [L, S, KH, T]|None."""
    B, _, KH, G, D = q5.shape
    T = k_all.shape[3]
    Dk = k_all.shape[4]

    # budget the merged score axis C = KH*Tblk so dequantized f32 blocks
    # (C x D) stay ~256 KB regardless of storage dtype. Measured on v5e
    # (TinyLlama shapes, T=2048): 1 MB blocks cost 4.25 ms/step at empty
    # fill vs 3.22 ms at 256 KB — the always-read first block + per-block
    # VPU work dominates, and finer blocks clamp closer to the real
    # history length. (TPU_ENGINE_FA_CBUDGET: tuning override, bytes)
    import os as _os

    c_budget = int(_os.environ.get("TPU_ENGINE_FA_CBUDGET", str(1 << 18)))
    C_target = max(128 * KH, c_budget // (D * 4))
    Tblk = max(128, C_target // KH // 128 * 128)
    Tblk = min(Tblk, _round_up(T, 128))
    n_kb = pl.cdiv(T, Tblk)
    Tpad = Tblk * n_kb
    RQ = _round_up(KH * G, 8)

    if rotated:  # tables unused: one zero block, never re-fetched
        cos_t = sin_t = jnp.zeros((Tblk, cfg.rope_dim // 2), jnp.float32)
    else:
        cos_t, sin_t = _rope_tables(Tpad, cfg, ga[0], ga[1])

    def q_map(b, kb, *_):
        return (b, 0, 0, 0, 0)

    def new_map(b, kb, *_):
        return (b, 0, 0, 0)

    def clamp(b, kb, starts):
        return jnp.minimum(kb, jnp.maximum((starts[b] + Tblk - 1) // Tblk - 1, 0))

    def kv_map(b, kb, li, slots, starts, win):
        # clamp: under dp, non-owned rows carry slot id == S_local (one past
        # the end) so their lengths scatter drops; the cache read must not
        # rely on Mosaic's implicit block-index clamping (dist/tp.py)
        s = jnp.minimum(slots[b], k_all.shape[1] - 1)
        return (li[0], s, 0, clamp(b, kb, starts), 0)

    def tab_map(b, kb, li, slots, starts, win):
        if rotated:
            return (0, 0)
        return (clamp(b, kb, starts), 0)

    in_specs = [
        pl.BlockSpec((1, 1, KH, G, D), q_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, KH, 1, D), new_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, KH, 1, D), new_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, KH, Tblk, Dk), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, KH, Tblk, Dk), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((Tblk, cfg.rope_dim // 2), tab_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((Tblk, cfg.rope_dim // 2), tab_map, memory_space=pltpu.VMEM),
    ]
    args = [q5, k_new, v_new, k_all, v_all, cos_t, sin_t]
    base = _decode_kernel_bh if rotated else _decode_kernel
    if ks_all is not None:
        # scales ride with T in the LANE dim: [L, S, KH, 1, T] blocked as
        # (1, 1, KH, 1, Tblk) — contiguous 128-lane DMA reads, and the
        # loaded tile [KH, 1, Tblk] is exactly the broadcast shape the
        # kernels multiply with. The old [..., T, 1] layout (lane dim 1)
        # made every scale-block DMA degenerate: measured 19.8 -> 4.3
        # ms/step on the TinyLlama q8_0 ctx-512 decode loop on v5e.
        def sc_map(b, kb, li, slots, starts, win):
            s = jnp.minimum(slots[b], k_all.shape[1] - 1)
            return (li[0], s, 0, 0, clamp(b, kb, starts))

        in_specs += [
            pl.BlockSpec((1, 1, KH, 1, Tblk), sc_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KH, 1, Tblk), sc_map, memory_space=pltpu.VMEM),
        ]
        args += [ks_all[:, :, :, None, :], vs_all[:, :, :, None, :]]
        kernel = base
    else:
        kernel = lambda li, sl, st, wn, q, kn, vn, k, v, co, si, o, a, m, l, **kw: \
            base(li, sl, st, wn, q, kn, vn, k, v, co, si, None, None,
                 o, a, m, l, **kw)
    kernel = functools.partial(kernel, rotated=rotated)

    if T != Tpad:
        pad = [(0, 0)] * 5
        pad[3] = (0, Tpad - T)
        args[3] = jnp.pad(args[3], pad)
        args[4] = jnp.pad(args[4], pad)
        if ks_all is not None:
            spad = [(0, 0)] * 5
            spad[4] = (0, Tpad - T)  # scales carry T in the LANE dim
            args[7] = jnp.pad(args[7], spad)
            args[8] = jnp.pad(args[8], spad)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, n_kb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, KH, G, D), q_map, memory_space=pltpu.VMEM),
        scratch_shapes=(
            [
                pltpu.VMEM((KH, G, D), jnp.float32),
                pltpu.VMEM((KH, G, 128), jnp.float32),
                pltpu.VMEM((KH, G, 128), jnp.float32),
            ]
            if rotated
            else [
                pltpu.VMEM((RQ, D), jnp.float32),
                pltpu.VMEM((RQ, 128), jnp.float32),
                pltpu.VMEM((RQ, 128), jnp.float32),
            ]
        ),
    )
    return pl.pallas_call(
        functools.partial(kernel, cfg=cfg, kind=kind, G=G, Tblk=Tblk, n_kb=n_kb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q5.shape, q5.dtype),
        interpret=interpret,
    )(jnp.asarray(li, jnp.int32).reshape(1), slots, starts, win, *args)  # decode


# --------------------------------------------------------------------------
# prefill kernel (Tc > 1): per-head grid
# --------------------------------------------------------------------------

def _prefill_kernel(
    li_ref, slots_ref, starts_ref, nv_ref, win_ref,  # scalar prefetch (SMEM)
    q_ref, kn_ref, vn_ref, k_ref, v_ref, cos_ref, sin_ref, ks_ref, vs_ref,
    out_ref,
    acc_ref, m_ref, l_ref,
    *, cfg: ModelConfig, kind: str, G: int, Qblk: int, Tblk: int, n_kb: int,
    rotated: bool = False,
):
    b = pl.program_id(0)
    qb = pl.program_id(2)
    kb = pl.program_id(3)
    D = cfg.head_dim
    rows = Qblk * G
    RQ = acc_ref.shape[0]
    Tc = kn_ref.shape[2]

    start = starts_ref[b]  # history length; cells < start are valid
    last_kb = jnp.maximum((start + Tblk - 1) // Tblk - 1, 0)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(kb <= last_kb)
    def _():
        qx = q_ref[0, :, 0].reshape(rows, D).astype(jnp.float32)
        if RQ != rows:
            qx = jnp.pad(qx, ((0, RQ - rows), (0, 0)))

        @pl.when(start > 0)
        def _():
            # scale tiles arrive [1, Tblk] (T in lanes); _dequant_block
            # wants a [Tblk, 1] column — a small in-tile relayout
            ks = (ks_ref[0, 0, 0].reshape(Tblk, 1)
                  if ks_ref is not None else None)
            vs = (vs_ref[0, 0, 0].reshape(Tblk, 1)
                  if vs_ref is not None else None)
            if rotated:  # K cells stored pre-rotated (llama.cpp design)
                kf = _dequant_block(k_ref[0, 0, 0], ks, kind)
            else:
                kf = _rotate(_dequant_block(k_ref[0, 0, 0], ks, kind),
                             cos_ref[:], sin_ref[:], cfg)
            vf = _dequant_block(v_ref[0, 0, 0], vs, kind)

            s = jax.lax.dot_general(
                qx, kf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * cfg.attention_scale()
            s = _softcap(s, cfg)
            col = kb * Tblk + jax.lax.broadcasted_iota(jnp.int32, (RQ, Tblk), 1)
            ok = col < start
            w = win_ref[0]  # sliding window; 0 = global
            row_pos = start + qb * Qblk + (
                jax.lax.broadcasted_iota(jnp.int32, (RQ, Tblk), 0) // G
            )
            ok = ok & ((w <= 0) | (col > row_pos - w))
            s = jnp.where(ok, s, NEG_INF)
            _online_update(s, vf, acc_ref, m_ref, l_ref)

        @pl.when(kb == last_kb)
        def _():
            # in-flight block: causal within the chunk + n_valid mask
            kn = kn_ref[0, 0].astype(jnp.float32)  # [Tc, D] (pre-rotated)
            vn = vn_ref[0, 0].astype(jnp.float32)
            s_new = jax.lax.dot_general(
                qx, kn, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * cfg.attention_scale()
            s_new = _softcap(s_new, cfg)
            row_t = qb * Qblk + jax.lax.broadcasted_iota(jnp.int32, (RQ, Tc), 0) // G
            col_t = jax.lax.broadcasted_iota(jnp.int32, (RQ, Tc), 1)
            ok = (col_t <= row_t) & (col_t < nv_ref[b])
            w = win_ref[0]
            ok = ok & ((w <= 0) | (col_t > row_t - w))
            s_new = jnp.where(ok, s_new, NEG_INF)
            _online_update(s_new, vn, acc_ref, m_ref, l_ref)

    @pl.when(kb == n_kb - 1)
    def _():
        out = acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)
        out_ref[0, :, 0] = out[:rows].reshape(Qblk, G, D).astype(out_ref.dtype)


def _prefill_kernel_t(
    li_ref, slots_ref, starts_ref, nv_ref, win_ref,  # scalar prefetch (SMEM)
    q_ref, kn_ref, vn_ref, k_ref, v_ref, cos_ref, sin_ref, ks_ref, vs_ref,
    out_ref,
    acc_ref, m_ref, l_ref,
    *, cfg: ModelConfig, kind: str, G: int, Qblk: int, Tblk: int, n_kb: int,
    rotated: bool = False,
):
    """Prefill over the TRANSPOSED ("dt") cache: per-(row, kv-head) blocks
    arrive [Dk2, Tblk] with cells in lanes. K is stored pre-transposed, so
    scores = q [rows, D] @ k [D, Tblk] is the direct MXU form (the "td"
    kernel contracts two lane dims), and the q8_0/q4_0 scale row [1, Tblk]
    broadcasts with no relayout (the "td" kernel reshapes it to a column).
    PV contracts the lane dims of p [rows, Tblk] and v [D, Tblk]."""
    b = pl.program_id(0)
    qb = pl.program_id(2)
    kb = pl.program_id(3)
    D = cfg.head_dim
    rows = Qblk * G
    RQ = acc_ref.shape[0]
    Tc = kn_ref.shape[2]

    start = starts_ref[b]  # history length; cells < start are valid
    last_kb = jnp.maximum((start + Tblk - 1) // Tblk - 1, 0)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(kb <= last_kb)
    def _():
        qx = q_ref[0, :, 0].reshape(rows, D).astype(jnp.float32)
        if RQ != rows:
            qx = jnp.pad(qx, ((0, RQ - rows), (0, 0)))

        @pl.when(start > 0)
        def _():
            kq = k_ref[0, 0, 0]  # [Dk2, Tblk] stored form
            vq = v_ref[0, 0, 0]
            if kind == "q4_0":  # split-half packed along D -> sublane concat
                c = kq.astype(jnp.int32)
                kf = jnp.concatenate([(c & 0xF) - 8, (c >> 4) - 8],
                                     axis=0).astype(jnp.float32)
                c = vq.astype(jnp.int32)
                vf = jnp.concatenate([(c & 0xF) - 8, (c >> 4) - 8],
                                     axis=0).astype(jnp.float32)
            else:
                kf = kq.astype(jnp.float32)
                vf = vq.astype(jnp.float32)
            if ks_ref is not None:  # [1, Tblk] broadcasts over D rows
                kf = kf * ks_ref[0, 0, 0]
                vf = vf * vs_ref[0, 0, 0]
            if not rotated:
                half = cfg.rope_dim // 2
                cos, sin = cos_ref[:], sin_ref[:]  # [rd/2, Tblk]
                x1, x2 = kf[:half], kf[half:cfg.rope_dim]
                rot = jnp.concatenate(
                    [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=0)
                if cfg.rope_dim < D:
                    rot = jnp.concatenate([rot, kf[cfg.rope_dim:]], axis=0)
                kf = rot

            s = jax.lax.dot_general(
                qx, kf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * cfg.attention_scale()
            s = _softcap(s, cfg)
            col = kb * Tblk + jax.lax.broadcasted_iota(jnp.int32, (RQ, Tblk), 1)
            ok = col < start
            w = win_ref[0]  # sliding window; 0 = global
            row_pos = start + qb * Qblk + (
                jax.lax.broadcasted_iota(jnp.int32, (RQ, Tblk), 0) // G
            )
            ok = ok & ((w <= 0) | (col > row_pos - w))
            s = jnp.where(ok, s, NEG_INF)
            # online update with PV contracting the LANE dims (vf [D, T])
            m_prev = m_ref[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m_prev - m_new)
            l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
            acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
                p, vf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

        @pl.when(kb == last_kb)
        def _():
            # in-flight block ([Tc, D] row-major): same as the "td" kernel
            kn = kn_ref[0, 0].astype(jnp.float32)
            vn = vn_ref[0, 0].astype(jnp.float32)
            s_new = jax.lax.dot_general(
                qx, kn, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * cfg.attention_scale()
            s_new = _softcap(s_new, cfg)
            row_t = qb * Qblk + jax.lax.broadcasted_iota(jnp.int32, (RQ, Tc), 0) // G
            col_t = jax.lax.broadcasted_iota(jnp.int32, (RQ, Tc), 1)
            ok = (col_t <= row_t) & (col_t < nv_ref[b])
            w = win_ref[0]
            ok = ok & ((w <= 0) | (col_t > row_t - w))
            s_new = jnp.where(ok, s_new, NEG_INF)
            _online_update(s_new, vn, acc_ref, m_ref, l_ref)

    @pl.when(kb == n_kb - 1)
    def _():
        out = acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)
        out_ref[0, :, 0] = out[:rows].reshape(Qblk, G, D).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "kind", "interpret",
                                              "rotated"))
def _prefill_call_t(q5, k_new, v_new, k_all, v_all, ks_all, vs_all,
                    li, slots, starts, n_valid, win, ga,
                    *, cfg: ModelConfig, kind: str, interpret: bool,
                    rotated: bool = False):
    """Transposed-cache prefill: cache k/v [L, S, KH, Dk2, T]."""
    B, Tc, KH, G, D = q5.shape
    T = k_all.shape[4]
    Dk2 = k_all.shape[3]

    Tblk = min(_round_up(T, 128), 512)
    n_kb = pl.cdiv(T, Tblk)
    Tpad = Tblk * n_kb
    Qblk = max(1, min(Tc, 256 // G))
    while Tc % Qblk:
        Qblk -= 1
    n_qb = Tc // Qblk
    RQ = _round_up(Qblk * G, 8)

    half = cfg.rope_dim // 2
    if rotated:
        cos_t = sin_t = jnp.zeros((half, Tblk), jnp.float32)
    else:
        c0, s0 = _rope_tables(Tpad, cfg, ga[0], ga[1])
        cos_t, sin_t = c0.T, s0.T

    def q_map(b, kh, qb, kb, *_):
        return (b, qb, kh, 0, 0)

    def new_map(b, kh, qb, kb, *_):
        return (b, kh, 0, 0)

    def clamp_kb(b, kb, starts):
        return jnp.minimum(kb, jnp.maximum((starts[b] + Tblk - 1) // Tblk - 1, 0))

    def kv_map(b, kh, qb, kb, li, slots, starts, nv, win):
        s = jnp.minimum(slots[b], k_all.shape[1] - 1)
        return (li[0], s, kh, 0, clamp_kb(b, kb, starts))

    def tab_map(b, kh, qb, kb, li, slots, starts, nv, win):
        if rotated:
            return (0, 0)
        return (0, clamp_kb(b, kb, starts))

    in_specs = [
        pl.BlockSpec((1, Qblk, 1, G, D), q_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Tc, D), new_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Tc, D), new_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, Dk2, Tblk), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, Dk2, Tblk), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((half, Tblk), tab_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((half, Tblk), tab_map, memory_space=pltpu.VMEM),
    ]
    args = [q5, k_new, v_new, k_all, v_all, cos_t, sin_t]
    if ks_all is not None:
        def sc_map(b, kh, qb, kb, li, slots, starts, nv, win):
            s = jnp.minimum(slots[b], k_all.shape[1] - 1)
            return (li[0], s, kh, 0, clamp_kb(b, kb, starts))

        in_specs += [
            pl.BlockSpec((1, 1, 1, 1, Tblk), sc_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1, Tblk), sc_map, memory_space=pltpu.VMEM),
        ]
        args += [ks_all[:, :, :, None, :], vs_all[:, :, :, None, :]]
        kernel = _prefill_kernel_t
    else:
        kernel = lambda li, sl, st, nv, wn, q, kn, vn, k, v, co, si, o, a, m, l, **kw: \
            _prefill_kernel_t(li, sl, st, nv, wn, q, kn, vn, k, v, co, si,
                              None, None, o, a, m, l, **kw)
    kernel = functools.partial(kernel, rotated=rotated)

    if T != Tpad:
        pad = [(0, 0)] * 5
        pad[4] = (0, Tpad - T)
        args[3] = jnp.pad(args[3], pad)
        args[4] = jnp.pad(args[4], pad)
        if ks_all is not None:
            args[7] = jnp.pad(args[7], pad)
            args[8] = jnp.pad(args[8], pad)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B, KH, n_qb, n_kb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Qblk, 1, G, D), q_map, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((RQ, D), jnp.float32),
            pltpu.VMEM((RQ, 128), jnp.float32),
            pltpu.VMEM((RQ, 128), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(kernel, cfg=cfg, kind=kind, G=G, Qblk=Qblk,
                          Tblk=Tblk, n_kb=n_kb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q5.shape, q5.dtype),
        interpret=interpret,
    )(jnp.asarray(li, jnp.int32).reshape(1), slots, starts, n_valid, win, *args)


@functools.partial(jax.jit, static_argnames=("cfg", "kind", "interpret",
                                              "rotated"))
def _prefill_call(q5, k_new, v_new, k_all, v_all, ks_all, vs_all,
                  li, slots, starts, n_valid, win, ga,
                  *, cfg: ModelConfig, kind: str, interpret: bool,
                  rotated: bool = False):
    """q5 [B, Tc, KH, G, D]; k/v_new [B, KH, Tc, D]; cache as _decode_call."""
    B, Tc, KH, G, D = q5.shape
    T = k_all.shape[3]
    Dk = k_all.shape[4]

    Tblk = min(_round_up(T, 128), 512)
    n_kb = pl.cdiv(T, Tblk)
    Tpad = Tblk * n_kb
    Qblk = max(1, min(Tc, 256 // G))
    while Tc % Qblk:
        Qblk -= 1
    n_qb = Tc // Qblk
    RQ = _round_up(Qblk * G, 8)

    if rotated:  # tables unused: one zero block, never re-fetched
        cos_t = sin_t = jnp.zeros((Tblk, cfg.rope_dim // 2), jnp.float32)
    else:
        cos_t, sin_t = _rope_tables(Tpad, cfg, ga[0], ga[1])

    def q_map(b, kh, qb, kb, *_):
        return (b, qb, kh, 0, 0)

    def new_map(b, kh, qb, kb, *_):
        return (b, kh, 0, 0)

    def clamp_kb(b, kb, starts):
        return jnp.minimum(kb, jnp.maximum((starts[b] + Tblk - 1) // Tblk - 1, 0))

    def kv_map(b, kh, qb, kb, li, slots, starts, nv, win):
        # clamp OOB dp sentinel slot ids (see _decode_call.kv_map)
        s = jnp.minimum(slots[b], k_all.shape[1] - 1)
        return (li[0], s, kh, clamp_kb(b, kb, starts), 0)

    def tab_map(b, kh, qb, kb, li, slots, starts, nv, win):
        if rotated:
            return (0, 0)
        return (clamp_kb(b, kb, starts), 0)

    in_specs = [
        pl.BlockSpec((1, Qblk, 1, G, D), q_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Tc, D), new_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Tc, D), new_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, Tblk, Dk), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, Tblk, Dk), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((Tblk, cfg.rope_dim // 2), tab_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((Tblk, cfg.rope_dim // 2), tab_map, memory_space=pltpu.VMEM),
    ]
    args = [q5, k_new, v_new, k_all, v_all, cos_t, sin_t]
    if ks_all is not None:
        # scales with T in the LANE dim (see _decode_call): contiguous
        # DMA; the kernel transposes the small [1, Tblk] tile to a column
        def sc_map(b, kh, qb, kb, li, slots, starts, nv, win):
            s = jnp.minimum(slots[b], k_all.shape[1] - 1)
            return (li[0], s, kh, 0, clamp_kb(b, kb, starts))

        in_specs += [
            pl.BlockSpec((1, 1, 1, 1, Tblk), sc_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1, Tblk), sc_map, memory_space=pltpu.VMEM),
        ]
        args += [ks_all[:, :, :, None, :], vs_all[:, :, :, None, :]]
        kernel = _prefill_kernel
    else:
        kernel = lambda li, sl, st, nv, wn, q, kn, vn, k, v, co, si, o, a, m, l, **kw: \
            _prefill_kernel(li, sl, st, nv, wn, q, kn, vn, k, v, co, si, None, None,
                            o, a, m, l, **kw)
    kernel = functools.partial(kernel, rotated=rotated)

    if T != Tpad:
        pad = [(0, 0)] * 5
        pad[3] = (0, Tpad - T)
        args[3] = jnp.pad(args[3], pad)
        args[4] = jnp.pad(args[4], pad)
        if ks_all is not None:
            spad = [(0, 0)] * 5
            spad[4] = (0, Tpad - T)  # scales carry T in the LANE dim
            args[7] = jnp.pad(args[7], spad)
            args[8] = jnp.pad(args[8], spad)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B, KH, n_qb, n_kb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Qblk, 1, G, D), q_map, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((RQ, D), jnp.float32),
            pltpu.VMEM((RQ, 128), jnp.float32),
            pltpu.VMEM((RQ, 128), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(kernel, cfg=cfg, kind=kind, G=G, Qblk=Qblk,
                          Tblk=Tblk, n_kb=n_kb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q5.shape, q5.dtype),
        interpret=interpret,
    )(jnp.asarray(li, jnp.int32).reshape(1), slots, starts, n_valid, win, *args)


_INTERPRET = False


def flash_attention(q, cache, li, slot_ids, q_pos, n_valid, k_new, v_new,
                    cfg, ga_n, ga_w, rot_cache: bool = False, win=None):
    """Drop-in for model.llama.attention_reference (the _ATTN_IMPL hook).
    rot_cache: K cells are stored PRE-ROTATED (upstream llama.cpp design;
    the engine enables it when self-extend is off) — skips the in-kernel
    rotate and the cos/sin table DMA entirely. li / win may be traced
    (layer-scanned forward): both are scalar-prefetch operands of the
    kernels, never compile-time constants."""
    B, Tc, H, D = q.shape
    KH = k_new.shape[1]  # local kv heads (== cfg.n_kv_head/p under TP)
    G = H // KH
    q5 = q.reshape(B, Tc, KH, G, D)
    starts = q_pos[:, 0].astype(jnp.int32)
    ga = jnp.stack([jnp.asarray(ga_n, jnp.int32), jnp.asarray(ga_w, jnp.int32)])
    if win is None:
        win = cfg.layer_window(li)
    win = jnp.asarray(win, jnp.int32).reshape(1)
    dt = cache.layout == "dt"
    if Tc == 1:
        elt = {"f32": 4, "f16": 2}.get(cache.kind, 1)
        if (dt and rot_cache
                and _dma_tblk(cache.k.shape[4], KH, cache.k.shape[3], elt)):
            # the serving fast path: dynamic per-slot block loop, cost
            # scales with real fill (see _decode_kernel_dma)
            out = _decode_call_dma(
                q5, k_new, v_new, cache.k, cache.v,
                cache.k_scale, cache.v_scale,
                li, slot_ids.astype(jnp.int32), starts, win,
                cfg=cfg, kind=cache.kind, interpret=_INTERPRET,
            )
            return out.reshape(B, Tc, H, D)
        fn = _decode_call_t if dt else _decode_call
        out = fn(
            q5, k_new, v_new, cache.k, cache.v, cache.k_scale, cache.v_scale,
            li, slot_ids.astype(jnp.int32), starts, win, ga,
            cfg=cfg, kind=cache.kind, interpret=_INTERPRET,
            rotated=rot_cache,
        )
    else:
        fn = _prefill_call_t if dt else _prefill_call
        out = fn(
            q5, k_new, v_new, cache.k, cache.v, cache.k_scale, cache.v_scale,
            li, slot_ids.astype(jnp.int32), starts,
            n_valid.astype(jnp.int32), win, ga,
            cfg=cfg, kind=cache.kind, interpret=_INTERPRET,
            rotated=rot_cache,
        )
    return out.reshape(B, Tc, H, D)


def enable(interpret: bool = False) -> None:
    """Install as the attention implementation (model.llama._ATTN_IMPL)."""
    global _INTERPRET
    _INTERPRET = interpret
    from ..model import llama

    llama.set_attention_impl(flash_attention)


def disable() -> None:
    from ..model import llama

    llama.set_attention_impl(llama.attention_reference)
