"""Pallas TPU kernels: fused dequantize + matmul.

The TPU-native replacement for ggml's quantized mul_mat (SURVEY.md
section 2b "Quant formats": fused dequant+matmul — quantized blocks stream
from HBM, expand to bf16 in VMEM, and feed the MXU; full-precision weights
never touch HBM).

Layout: QTensors are stored GROUP-TRANSPOSED (quant/device_format.py):
kernel column k' = r*ng + g (g = group, r = position in group, ng = K/G).
Consecutive columns cycle through the ng groups, so the per-column scale
for a [TN, m*ng] tile is exactly `pltpu.repeat(scale_tile, m, axis=1)` —
a tile-repeat, the one broadcast Mosaic does natively. The activation gets
the matching (cheap, [M, K]-sized) transpose in XLA before the call.

4-bit formats pack two *positions in the same group* per byte
(low nibble r=2*r2, high nibble r=2*r2+1), so the dot splits into an
even-plane and odd-plane matmul sharing one scale tile:

    y = x_even @ (lo * s + b).T + x_odd @ (hi * s + b).T
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..model import weights as W

# Tile sizing, tuned on v5e: with >=1024-byte k-tiles the dequant VPU ops
# hide entirely behind the HBM DMA and the kernel runs bandwidth-bound
# (~520 GB/s effective vs ~270 GB/s at the former 512/256 tiles). The
# dequant intermediates (i32 + 2x f32 + 2x bf16 per packed byte) live on
# the Mosaic VMEM stack, so the tile AREA must stay under a budget or the
# kernel hits scoped-vmem OOM (16 MB/core).
import os as _os

TILE_AREA_BUDGET = int(_os.environ.get("TPU_ENGINE_QMM_AREA",
                                       str(512 * 1024)))  # packed elems/tile
# full VMEM-footprint ceiling per grid step (bytes): double-buffered input
# blocks + out/acc + dequant intermediates must fit Mosaic's 16 MB scoped
# stack. The activation blocks scale with the ROW count, so prefill shapes
# (rows = slots * bucket) need smaller tiles than 8-row decode.
VMEM_BYTE_BUDGET = int(_os.environ.get("TPU_ENGINE_QMM_VMEM",
                                       str(14 * 1024 * 1024)))


def _tile_bytes(tn: int, tk: int, splits: int, tm: int, ng: int,
                kind: str, has_bias: bool) -> int:
    """VMEM bytes one grid step needs (conservative model, matched against
    Mosaic's scoped-stack accounting): Pallas double-buffers every input
    block; the dequant intermediates live per sub-tile. tm = activation
    rows per row-block."""
    sub = tk // splits
    if kind == "nib4":
        x_blocks = 2 * tm * tk * 2             # xl + xh bf16
        inter = tn * sub * (4 + 2 * (4 + 2))   # q32 + (lo,hi) f32+bf16
    else:
        x_blocks = tm * tk * 2                 # x bf16
        inter = tn * sub * (4 + 4 + 2)         # q32 + w f32 + bf16
    qs = tn * tk
    scales = tn * ng * 4 * (2 if has_bias else 1)
    xsum = tm * ng * 4 if has_bias else 0
    inputs = (x_blocks + qs + scales + xsum) * 2  # double-buffered
    out_acc = 2 * tm * tn * 4
    # bias-dot bf16x3 splits of xsum + b0
    bias_tmp = (2 * tm * ng * 2 + 2 * tn * ng * 2) if has_bias else 0
    return inputs + out_acc + inter + bias_tmp


def _pick_tiles(n: int, plane_rows: int, ng: int, mrows: int = 8,
                kind: str = "nib4", has_bias: bool = True):
    """Choose (tn, tk, splits): tk = m*ng spans m full group-cycles, with m
    dividing the packed plane rows and tk a multiple of 128 lanes. Prefer
    the largest tn whose largest admissible tk reaches 1024; otherwise the
    largest tk. splits > 1 sub-tiles the in-kernel dequant along k (each
    sub-tile spans m/splits full group cycles) so tiles up to
    splits*TILE_AREA_BUDGET fit the VMEM stack — e.g. Q6_K's group=16
    forces long tk, and without splitting tn would drop to 256 (measured
    241 GB/s vs ~500 for the group-32 formats on v5e). Every candidate must
    also pass the FULL byte model (_tile_bytes) — the activation blocks
    scale with the row count, so the grid gains a ROW-BLOCK dimension (tm
    rows per step) and big prefill batches pick the largest tm that still
    fits instead of hitting a compile-time scoped-vmem OOM.

    Returns (tm, tn, tk, splits) or None."""
    tks = [m * ng for m in range(1, plane_rows + 1)
           if plane_rows % m == 0 and (m * ng) % 128 == 0]
    if not tks:
        tks = [plane_rows * ng]  # single tile spanning the whole plane

    def pick_for_tm(tm):
        best = None

        def splits_for(tn, tk):
            m = max(tk // ng, 1)
            for s_ in (1, 2, 4, 8):
                if (tn * tk <= s_ * TILE_AREA_BUDGET and m % s_ == 0
                        and _tile_bytes(tn, tk, s_, tm, ng, kind, has_bias)
                        <= VMEM_BYTE_BUDGET):
                    return s_
            return None

        for tn in (512, 256, 128):
            if n % tn:
                continue
            fit = [(tk, splits_for(tn, tk)) for tk in tks]
            fit = [(tk, s_) for tk, s_ in fit if s_ is not None]
            if not fit:
                continue
            tk, s_ = max(fit)
            if best is None:
                best = (tn, tk, s_)
            elif tk >= 1024 and best[1] < 1024:
                best = (tn, tk, s_)
            elif tk > best[1] and best[1] < 1024:
                best = (tn, tk, s_)
        return best

    # largest row-block that still admits a k-tiling (rows are padded to a
    # multiple of 8 by the caller)
    for tm in (256, 128, 64, 32, 16, 8):
        if mrows % tm or tm > mrows:
            continue
        best = pick_for_tm(tm)
        if best is not None:
            return (tm, *best)
    return None


def _expand_scales(sc_ref, b_ref, packed_gpb: int, packed_s: int,
                   sc_scratch=None, b_scratch=None, k_step=None):
    """(sc0 [tn, ng] f32, b0 [tn, ng] f32 | None) from either the flat f32
    arrays or the packed two-level representation (f32-widened d|dmin per
    superblock + int sub-scales per group; scale = d*sc, bias = -dmin*m —
    exact in f32, same bit-parity as the flat layout).

    With scratch refs, the expansion runs ONCE per n-tile (k_step == 0) and
    later k grid steps reuse the cached f32 scales — the steady-state
    per-step work is then identical to the flat-scale path.

    Weight-side refs carry a leading block dim of 1 (stacked-layer
    selection by the index maps)."""
    if not packed_gpb:
        # flat layout; scales may be stored bf16 (TPU_ENGINE_BF16_SCALES)
        # — one native widening cast of the small [tn, ng] tile
        sc0 = sc_ref[0].astype(jnp.float32)
        return sc0, (b_ref[0].astype(jnp.float32) if b_ref is not None
                     else None)

    def expand():
        dd = sc_ref[0].astype(jnp.float32)      # [tn, S*ns]
        # Mosaic has no direct 8-bit -> f32 cast: go through i32
        sub = b_ref[0].astype(jnp.int32).astype(jnp.float32)  # [tn, S*ng]
        ns = dd.shape[1] // packed_s
        ngrp = sub.shape[1] // packed_s
        # groups are stored J-MAJOR (g' = j*ns + s, device_format.py), so
        # expanding d per-superblock to per-group is a TILE-repeat:
        # d_exp[g'] = d[g' % ns]. Exact — no rounding anywhere.
        d = pltpu.repeat(dd[:, :ns], packed_gpb, axis=1)
        sc0 = d * sub[:, :ngrp]
        if packed_s == 2:
            dm = pltpu.repeat(dd[:, ns:], packed_gpb, axis=1)
            return sc0, -dm * sub[:, ngrp:]
        return sc0, None

    if sc_scratch is None:
        return expand()

    @pl.when(k_step == 0)
    def _():
        sc0, b0 = expand()
        sc_scratch[:] = sc0
        if b_scratch is not None:
            b_scratch[:] = b0

    return sc_scratch[:], (b_scratch[:] if b_scratch is not None else None)


def _bias_dot(acc_ref, xs_ref, b0, k, kc_tiles: int):
    """Fold the per-group bias in as ONE dot per k-chunk instead of two
    [tn, tk] adds per sub-tile:  sum_k x_k * b_g(k) = xsum[:, g] @ b0.T
    (xsum = activation pre-summed over each group's positions). Saves ~2
    VPU passes per packed byte. The manual bf16x3 split keeps the bias
    contribution exact to ~2^-17 relative (Mosaic rejects Precision.HIGH,
    and HIGHEST's 6-way operand split overflows the 16 MB VMEM stack on
    512-row prefill buckets)."""

    @pl.when(k % kc_tiles == 0)
    def _():
        dims = (((1,), (1,)), ((), ()))
        xs = xs_ref[:]
        a_hi = xs.astype(jnp.bfloat16)
        a_lo = (xs - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_hi = b0.astype(jnp.bfloat16)
        b_lo = (b0 - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(a_hi, b_hi, dims,
                                  preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(a_hi, b_lo, dims,
                                   preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(a_lo, b_hi, dims,
                                   preferred_element_type=jnp.float32)
        acc_ref[:] += acc


def _nib4_kernel(li_ref, xl_ref, xh_ref, qs_ref, sc_ref, b_ref, xs_ref,
                 out_ref, acc_ref, *scratch, m: int, n_k: int,
                 splits: int = 1, packed_gpb: int = 0, packed_s: int = 1,
                 kc_tiles: int = 1):
    # li_ref: scalar-prefetch layer index — the weight blocks were selected
    # by the index maps (stacked [L, ...] arrays under the layer-scanned
    # forward); their refs carry a leading block dim of 1.
    del li_ref
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dims = (((1,), (1,)), ((), ()))
    ms = m // splits
    sub = qs_ref.shape[2] // splits  # = ms*ng columns per sub-tile
    sc0, b0 = _expand_scales(
        sc_ref, b_ref, packed_gpb, packed_s,
        sc_scratch=scratch[0] if scratch else None,
        b_scratch=scratch[1] if len(scratch) > 1 else None, k_step=k)
    if b0 is not None:
        _bias_dot(acc_ref, xs_ref, b0, k, kc_tiles)
    # dequant stays in f32 on the VPU (bf16 elementwise arithmetic is
    # EMULATED — unpack/compute-f32/repack — and measured ~10% slower);
    # the win over the old chain is the bias add moving into _bias_dot.
    # Sub-tiling keeps the i32 + f32 + bf16 intermediates per packed byte
    # within the Mosaic VMEM stack; the scale tile is rebuilt per split so
    # its live range stays inside one sub-tile (hoisting it OOMs the
    # 16 MB stack on 512-row prefill buckets).
    for h in range(splits):
        # bit ops in i32: Mosaic has no u8 vector shifts (arith.shrui on i8)
        q32 = qs_ref[0, :, h * sub:(h + 1) * sub].astype(jnp.int32)
        sc = pltpu.repeat(sc0, ms, axis=1) if ms > 1 else sc0
        lo = (q32 & 0x0F).astype(jnp.float32) * sc
        hi = (q32 >> 4).astype(jnp.float32) * sc
        acc_ref[:] += jax.lax.dot_general(
            xl_ref[:, h * sub:(h + 1) * sub], lo.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] += jax.lax.dot_general(
            xh_ref[:, h * sub:(h + 1) * sub], hi.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32,
        )

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _i8_kernel(li_ref, x_ref, qs_ref, sc_ref, b_ref, xs_ref, out_ref,
               acc_ref, *scratch, m: int, n_k: int, splits: int = 1,
               packed_gpb: int = 0, packed_s: int = 1, kc_tiles: int = 1):
    del li_ref
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ms = m // splits
    sub = qs_ref.shape[2] // splits
    sc0, b0 = _expand_scales(
        sc_ref, b_ref, packed_gpb, packed_s,
        sc_scratch=scratch[0] if scratch else None,
        b_scratch=scratch[1] if len(scratch) > 1 else None, k_step=k)
    if b0 is not None:
        _bias_dot(acc_ref, xs_ref, b0, k, kc_tiles)
    for h in range(splits):
        sc = pltpu.repeat(sc0, ms, axis=1) if ms > 1 else sc0
        w = qs_ref[0, :, h * sub:(h + 1) * sub].astype(jnp.int32).astype(
            jnp.float32) * sc
        acc_ref[:] += jax.lax.dot_general(
            x_ref[:, h * sub:(h + 1) * sub], w.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit, static_argnames=("kind", "group", "n", "k", "shards",
                              "packed_gpb", "packed_s", "interpret")
)
def _qmm_2d(x, qs, scale, bias, li=None, *, kind: str, group: int, n: int,
            k: int, shards: int = 1, packed_gpb: int = 0, packed_s: int = 1,
            interpret: bool = False):
    """x [M, K] (natural order) -> [M, N] f32, or None if untileable.

    shards: perm_shards of the weight layout — the group-transpose was
    applied per K-chunk (TP row-parallel layout, quant/device_format.py).
    k-tiles never straddle chunk boundaries; the scale tile follows the
    chunk's group cycle.

    li: layer index selecting the layer slab of STACKED [L, N, Kp] weight
    arrays (the layer-scanned forward, model/llama.py). It rides as a
    scalar-prefetch operand and the index maps pick the slab — the stacked
    weights are NEVER sliced in XLA (a dynamic-slice there materializes an
    HBM copy of every weight each step; measured +5 ms on 7B decode).
    Unstacked weights get a free leading-1 reshape and li=0."""
    mrows = x.shape[0]
    if qs.ndim == 2:  # unstacked: unify on the [L=1, ...] layout
        qs = qs.reshape(1, *qs.shape)
        scale = scale.reshape(1, *scale.shape) if scale is not None else None
        bias = bias.reshape(1, *bias.shape) if bias is not None else None
    li_arr = (jnp.zeros((1,), jnp.int32) if li is None
              else jnp.asarray(li, jnp.int32).reshape(1))
    ng = (k // shards) // group  # groups per chunk (== K/G when shards=1)
    x16 = x.astype(jnp.bfloat16)
    if packed_gpb:
        # packed tensors store groups J-MAJOR (g' = j*ns + s,
        # device_format.py); give the activation the matching relayout:
        # column r*ng + g' <- natural column (s*gpb + j)*G + r
        n_sb = k // (packed_gpb * group)  # superblocks per row
        xg = x16.reshape(mrows, n_sb, packed_gpb, group).transpose(
            0, 3, 2, 1).reshape(mrows, 1, group, ng)
    else:
        # per-chunk group transpose of the activation to match the weight
        # layout
        xg = x16.reshape(mrows, shards, ng, group).swapaxes(2, 3)  # [M,C,G,ng]

    plane = group // 2 if kind == "nib4" else group
    has_bias_est = (packed_s == 2) if packed_gpb else (bias is not None)
    tiles = _pick_tiles(n, plane, ng, mrows=mrows, kind=kind,
                        has_bias=has_bias_est)
    if tiles is None:
        return None
    tm, tn, _tk, _splits = tiles
    n_r = mrows // tm  # row-block grid dimension (1 for decode shapes)

    def sc_spec(tkb):
        # scale [L, N, ng*shards]: one full chunk group cycle per k-tile;
        # the tile's chunk index selects which ng-column block of scales
        kc_tiles = max((k // shards) // (2 if kind == "nib4" else 1) // tkb, 1)
        return pl.BlockSpec(
            (1, tn, ng), lambda r, i, kk, li: (li[0], i, kk // kc_tiles),
            memory_space=pltpu.VMEM
        )

    def packed_spec(arr):
        # packed scales/subs are tiny: the n-tile's full row slab, constant
        # over the k grid (shards == 1 for packed tensors)
        return pl.BlockSpec((1, tn, arr.shape[2]),
                            lambda r, i, kk, li: (li[0], i, 0),
                            memory_space=pltpu.VMEM)

    # does the weight carry a per-group bias the kernel must fold in?
    # (for packed tensors `bias` holds the int sub-scales; only the S=2
    # formats reconstruct an actual bias row from them)
    has_bias = (packed_s == 2) if packed_gpb else (bias is not None)
    if has_bias:
        # activation pre-summed over each group's positions, chunk-major
        # [M, ng*shards] f32 — one tiny dot per k-chunk replaces two
        # [tn, tk] adds per sub-tile (see _bias_dot)
        xsum = xg.astype(jnp.float32).sum(axis=2).reshape(mrows, -1)

    def xs_spec(kc_tiles):
        return pl.BlockSpec((tm, ng), lambda r, i, kk, li: (r, kk // kc_tiles),
                            memory_space=pltpu.VMEM)

    if kind == "nib4":
        plane_rows = group // 2
        tkb = _tk
        m = tkb // ng
        n_k = (k // 2) // tkb
        kc_tiles = max((k // shards) // 2 // tkb, 1)
        xl = xg[:, :, 0::2, :].reshape(mrows, k // 2)
        xh = xg[:, :, 1::2, :].reshape(mrows, k // 2)
        grid = (n_r, n // tn, n_k)
        in_specs = [
            pl.BlockSpec((tm, tkb), lambda r, i, kk, li: (r, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tkb), lambda r, i, kk, li: (r, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, tkb), lambda r, i, kk, li: (li[0], i, kk),
                         memory_space=pltpu.VMEM),
            packed_spec(scale) if packed_gpb else sc_spec(tkb),
        ]
        args = [xl, xh, qs, scale]
        kw = dict(m=m, n_k=n_k, splits=_splits, packed_gpb=packed_gpb,
                  packed_s=packed_s, kc_tiles=kc_tiles)
        if bias is not None:
            in_specs.append(packed_spec(bias) if packed_gpb else sc_spec(tkb))
            args.append(bias)
            if has_bias:
                in_specs.append(xs_spec(kc_tiles))
                args.append(xsum)
                kernel = functools.partial(_nib4_kernel, **kw)
            else:  # packed S=1: sub-scales present, no bias row
                kernel = functools.partial(
                    lambda li, xl, xh, qs, sc, b, out, acc, *scr, **kw2:
                    _nib4_kernel(li, xl, xh, qs, sc, b, None, out, acc, *scr,
                                 **kw2), **kw)
        else:
            kernel = functools.partial(
                lambda li, xl, xh, qs, sc, out, acc, *scr, **kw2:
                _nib4_kernel(li, xl, xh, qs, sc, None, None, out, acc, *scr,
                             **kw2), **kw)
    else:  # i8
        tk = _tk
        m = tk // ng
        n_k = k // tk
        kc_tiles = max((k // shards) // tk, 1)
        xp = xg.reshape(mrows, k)  # flat col = c*kc + r*ng + g (chunk-major)
        grid = (n_r, n // tn, n_k)
        in_specs = [
            pl.BlockSpec((tm, tk), lambda r, i, kk, li: (r, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, tk), lambda r, i, kk, li: (li[0], i, kk),
                         memory_space=pltpu.VMEM),
            packed_spec(scale) if packed_gpb else sc_spec(tk),
        ]
        args = [xp, qs, scale]
        kw = dict(m=m, n_k=n_k, splits=_splits, packed_gpb=packed_gpb,
                  packed_s=packed_s, kc_tiles=kc_tiles)
        if bias is not None:
            in_specs.append(packed_spec(bias) if packed_gpb else sc_spec(tk))
            args.append(bias)
            if has_bias:
                in_specs.append(xs_spec(kc_tiles))
                args.append(xsum)
                kernel = functools.partial(_i8_kernel, **kw)
            else:  # packed S=1: sub-scales present, no bias row
                kernel = functools.partial(
                    lambda li, x, qs, sc, b, out, acc, *scr, **kw2:
                    _i8_kernel(li, x, qs, sc, b, None, out, acc, *scr, **kw2),
                    **kw)
        else:
            kernel = functools.partial(
                lambda li, x, qs, sc, out, acc, *scr, **kw2:
                _i8_kernel(li, x, qs, sc, None, None, out, acc, *scr, **kw2),
                **kw)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # the layer index (stacked weights)
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda r, i, kk, li: (r, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)]
        + ([pltpu.VMEM((tn, ng), jnp.float32)] * (1 + (packed_s == 2))
           if packed_gpb else []),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mrows, n), jnp.float32),
        interpret=interpret,
        # row-blocks and n-tiles are independent; the k axis carries the
        # accumulator. allow_input_fusion on the activation operands folds
        # the group-transpose relayout (reshape/swapaxes/strided-slice
        # chains) into the kernel's input DMA instead of separate XLA
        # copies. The stacked weights are indexed (not sliced) via the
        # scalar-prefetch layer index, so they never need fusion.
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            allow_input_fusion=[kind == "nib4", kind == "nib4"]
            + [False] * (len(in_specs) - 2) if kind == "nib4"
            else [True] + [False] * (len(in_specs) - 1)),
    )(li_arr, *args)


_INTERPRET = False


def pallas_qmatmul(x: jax.Array, qt: W.QTensor, li=None) -> jax.Array:
    """Drop-in for weights.qmatmul on quantized tensors.

    Shapes come from the ARRAYS, not qt.shape metadata, so shard_map-local
    slices of a TP-sharded tensor (dist/tp.py) work: a K-sharded
    perm_shards=p tensor arrives here as one self-permuted chunk.

    li: layer index into STACKED [L, N, Kp] arrays (layer-scanned forward);
    rides into the kernel as a scalar-prefetch operand."""
    n = qt.qs.shape[-2]
    k = qt.qs.shape[-1] * (2 if qt.kind == "nib4" else 1)
    lead = x.shape[:-1]
    mrows = 1
    for d in lead:
        mrows *= d
    x2 = x.reshape(mrows, x.shape[-1])
    if qt.k_pad:
        # lane-padded layout (QTensor.k_pad): zero groups at the cycle
        # tail; the activation pads to match (its natural-order pad
        # columns are trailing, exactly the zero groups)
        x2 = jnp.concatenate(
            [x2, jnp.zeros((mrows, k - x.shape[-1]), x2.dtype)], axis=1)
    # a local K-slice of a perm_shards=p tensor holds k/k_global of the
    # chunks (p when unsliced; 1 when sharded p-ways)
    shards = (1 if qt.k_pad else
              max(qt.perm_shards * k // qt.shape[1], 1)) if qt.perm else 1
    # Mosaic wants the sublane dim divisible by 8: pad small batches
    pad = (-mrows) % 8
    if pad:
        x2 = jnp.concatenate([x2, jnp.zeros((pad, k), x2.dtype)], axis=0)
    out = None
    if qt.perm:
        packed_gpb = packed_s = 0
        if qt.packed:
            packed_gpb = 256 // qt.group  # groups per k-quant superblock
            packed_s = qt.scale.shape[-1] // (k // 256)
        out = _qmm_2d(
            x2, qt.qs, qt.scale, qt.bias, li,
            kind=qt.kind, group=qt.group, n=n, k=k, shards=shards,
            packed_gpb=packed_gpb, packed_s=max(packed_s, 1),
            interpret=_INTERPRET,
        )
    if out is None:
        w = W.dequant(qt if li is None else W.layer_slice(qt, li), x.dtype)
        return (x.reshape(mrows, x.shape[-1]) @ w.T).reshape(*lead, n)
    if pad:
        out = out[:mrows]
    return out.reshape(*lead, n).astype(x.dtype)


def enable(interpret: bool = False) -> None:
    """Install the Pallas fused kernels as the qmatmul implementation.
    Multi-device (GSPMD) tensors fall back to the XLA path — pallas+TP
    integration via shard_map is a later milestone."""
    global _INTERPRET
    _INTERPRET = interpret
    W.set_pallas_qmatmul(pallas_qmatmul)


def disable() -> None:
    W.set_pallas_qmatmul(None)
