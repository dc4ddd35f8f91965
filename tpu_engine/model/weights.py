"""Weight pytrees: quantized tensors on device + the matmul/gather ops.

The TPU-native analog of ggml's quantized tensors + mul_mat: weights stay
in the unified blockwise layout (quant/device_format.py) in HBM and are
dequantized inside the matmul (Pallas kernel on TPU, jnp reference path
elsewhere) — never materialized at full precision (SURVEY.md section 2b
"Quant formats": fused dequant+matmul, never materialize f16 weights).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFFile
from ..quant.device_format import LAYOUTS, to_device_format
from .config import ModelConfig


@jax.tree_util.register_pytree_node_class
@dataclass
class QTensor:
    """A (possibly) quantized 2D weight [N, K] (y = x @ W.T convention).

    perm=True means qs is stored in the group-transposed kernel layout
    (quant/device_format.py permute_group_transpose_*) consumed directly by
    the Pallas fused dequant+matmul; dequant()/embed_rows() undo it.
    """

    qs: jax.Array  # dense weights, packed nibbles, or int8 values
    scale: jax.Array | None
    bias: jax.Array | None
    kind: str  # "dense" | "nib4" | "i8"
    group: int
    shape: tuple[int, int]
    perm: bool = False
    # number of independent K-chunks the kernel permutation was applied
    # over (1 = whole row). perm_shards == p means the tensor can shard
    # along K into p parts for tensor parallelism with every shard a
    # self-consistent kernel layout (dist/tp.py).
    perm_shards: int = 1
    # packed two-level k-quant scales (quant/device_format.py
    # DeviceQuantPacked): scale holds f32 [N, S*n_super] (d | dmin) and
    # bias holds int8/uint8 [N, S*n_group] (sc | m); the kernel/dequant
    # reconstructs flat f32 scale = d*sc, bias = -dmin*m (exact). Cuts
    # Q4_K HBM bytes from 0.75 to 0.578 per element. Single-shard only
    # (superblocks need not divide K/p).
    packed: bool = False
    # lane-aligned group padding: when K/group is not a multiple of 128,
    # the kernel's per-column scale tile-repeat misaligns every repetition
    # (measured 383 vs ~800 GB/s on llama-7B w_down, ng=344). The stored
    # arrays are padded to k_pad = round_up(ng, 128) * group columns with
    # zero groups; the matmul pads the activation to match. 0 = unpadded.
    k_pad: int = 0

    def tree_flatten(self):
        return (self.qs, self.scale, self.bias), (self.kind, self.group, self.shape,
                                                  self.perm, self.perm_shards,
                                                  self.packed, self.k_pad)

    @classmethod
    def tree_unflatten(cls, aux, children):
        qs, scale, bias = children
        kind, group, shape = aux[:3]
        perm = aux[3] if len(aux) > 3 else False
        perm_shards = aux[4] if len(aux) > 4 else 1
        packed = aux[5] if len(aux) > 5 else False
        k_pad = aux[6] if len(aux) > 6 else 0
        return cls(qs=qs, scale=scale, bias=bias, kind=kind, group=group,
                   shape=shape, perm=perm, perm_shards=perm_shards,
                   packed=packed, k_pad=k_pad)

    @property
    def bits_per_weight(self) -> float:
        n, k = self.shape
        total = self.qs.size * self.qs.dtype.itemsize
        if self.scale is not None:
            total += self.scale.size * self.scale.dtype.itemsize
        if self.bias is not None:
            total += self.bias.size * self.bias.dtype.itemsize
        return total * 8.0 / (n * k)


def lane_pad_group_cycle(qs: np.ndarray, scale: np.ndarray,
                         bias: np.ndarray | None, group: int, k: int):
    """Pad a group-transposed layout's cycle width ng = k/group up to a
    multiple of 128 lanes with ZERO groups (scale 0 kills any qs garbage).
    Returns (qs, scale, bias, k_pad). See QTensor.k_pad."""
    n = qs.shape[0]
    ng = k // group
    ng_pad = -(-ng // 128) * 128
    k_pad = ng_pad * group
    plane = qs.shape[1] // ng  # group//2 (nib4) or group (i8) rows
    qs = np.concatenate([
        qs.reshape(n, plane, ng),
        np.zeros((n, plane, ng_pad - ng), qs.dtype)], axis=2,
    ).reshape(n, plane * ng_pad)
    scale = np.concatenate(
        [scale, np.zeros((n, ng_pad - ng), scale.dtype)], axis=1)
    if bias is not None:
        bias = np.concatenate(
            [bias, np.zeros((n, ng_pad - ng), bias.dtype)], axis=1)
    return qs, scale, bias, k_pad


def qtensor_from_gguf(g: GGUFFile, name: str, dtype=jnp.float32,
                      perm_shards: int = 1, host: bool = False) -> QTensor:
    """host=True keeps the arrays as NUMPY (host staging): the loader
    stacks layers on host and uploads ONE array per stacked leaf instead
    of ~n_layer*n_tensors small transfers — on the remote-TPU tunnel the
    per-transfer overhead made load time vary 4-8x run to run (VERDICT r3
    weak #5). Callers must device-convert before use."""
    _as = np.asarray if host else jnp.asarray
    from ..quant.device_format import (
        permute_group_transpose_i8,
        permute_group_transpose_nib4,
    )

    ti = g.tensors[name]
    shape = ti.shape
    k = shape[-1]
    n = ti.n_elems // k
    if ti.ggml_type in LAYOUTS:
        from ..quant.device_format import PACKED_TYPES, to_device_format_packed

        lay = LAYOUTS[ti.ggml_type]
        if perm_shards > 1 and (
            k % perm_shards or (k // perm_shards) % lay.group
            or (lay.kind == "nib4" and (k // perm_shards) % 2)
        ):
            perm_shards = 1  # chunking impossible; caller replicates
        # two-level packed scales for k-quants (23% less HBM traffic on
        # Q4_K); single-shard only — superblocks need not divide K/p.
        # Default OFF: the fused kernel is VPU-bound, so the saved scale
        # bytes don't pay for the in-kernel expansion. Measured twice on
        # v5e 7B Q4_K_M bs=8: 466 vs 493 tok/s pre-bias-dot, and 492 vs
        # 549 AFTER the bias-dot VPU reduction — the gap widened, so the
        # remaining expansion cost (per-n-tile scale rebuild + the f32
        # d*sc products) dominates the byte savings. Re-test only after a
        # change that removes the per-tile expansion itself.
        packed = (
            perm_shards == 1
            and ti.ggml_type in PACKED_TYPES
            and k % 256 == 0
            # only lane-ALIGNED group cycles: unaligned ng (7B w_down's
            # 344) pays misaligned-repeat VPU cost on top of the packed
            # expansion; those tensors use the flat layout + k_pad instead
            and (k // lay.group) % 128 == 0
            and os.environ.get("TPU_ENGINE_PACKED_SCALES", "0") == "1"
        )
        if packed:
            dq = to_device_format_packed(
                g.tensor_bytes(name), ti.ggml_type, (n, k))
            if lay.kind == "nib4":
                qs = permute_group_transpose_nib4(dq.qs, lay.group)
            else:
                qs = permute_group_transpose_i8(dq.qs, lay.group)
            S = dq.d_dmin.shape[1]
            return QTensor(
                qs=_as(qs),
                # f32 storage (exact widening of the file's f16; Mosaic
                # has no f16 dtype). Superblock scales are k/256 wide, so
                # the extra 2 B/superblock is ~0.016 B/elem of HBM.
                scale=_as(
                    np.concatenate([dq.d_dmin[:, i] for i in range(S)],
                                   axis=1).astype(np.float32)),
                # int8 storage (6-bit values fit; Mosaic-friendly casts)
                bias=_as(
                    np.concatenate([dq.sub[:, i] for i in range(S)],
                                   axis=1).astype(np.int8)),
                kind=lay.kind, group=lay.group, shape=(n, k),
                perm=True, packed=True,
            )
        native = None
        from ..native import lib as native_lib

        native = native_lib.extract_device(
            g.tensor_bytes(name), ti.ggml_type, n, k, shards=perm_shards)
        if native is not None:
            qs, scale, bias = native
        else:
            dq = to_device_format(g.tensor_bytes(name), ti.ggml_type, (n, k))
            scale, bias = dq.scale, dq.bias
            if lay.kind == "nib4":
                qs = permute_group_transpose_nib4(dq.qs, lay.group, perm_shards)
            else:
                qs = permute_group_transpose_i8(dq.qs, lay.group, perm_shards)
        # lane-align the group cycle: pad ng to a multiple of 128 with zero
        # groups (see QTensor.k_pad). Only for single-chunk layouts; TP
        # chunked tensors keep their exact per-chunk cycles.
        k_pad = 0
        ng = k // lay.group
        ng_pad = -(-ng // 128) * 128
        # the pad adds zero-group qs bytes (ng_pad/ng more DMA): only
        # worth it when the misalignment penalty dominates, i.e. the pad
        # ratio is small (7B w_down: 384/344 = +11.6% bytes for a ~2x
        # faster kernel; TinyLlama's 256/176 = +45% would be a net loss)
        if (perm_shards == 1 and ng % 128 and ng_pad <= 1.2 * ng
                and os.environ.get("TPU_ENGINE_PAD_NG", "1") == "1"):
            qs, scale, bias, k_pad = lane_pad_group_cycle(
                np.asarray(qs), np.asarray(scale),
                None if bias is None else np.asarray(bias), lay.group, k)
        if os.environ.get("TPU_ENGINE_BF16_SCALES", "1") == "1":
            # bf16 flat scale/bias storage (DEFAULT ON): halves the
            # per-group scale bytes (Q4_K 0.75 -> 0.625 B/elem of qmm DMA)
            # at zero extra in-kernel work (one native widening cast per
            # tile). Measured on v5e 7B Q4_K_M bs=8, interleaved A/B:
            # 10.37 vs 11.09 ms/step (+6.5%). The file's f16 d/dmin round
            # to 8 mantissa bits — a <=2^-9 relative scale perturbation vs
            # the 4-6 bit weight error; the ppl gate
            # (tests/test_perplexity.py, scripts/ppl_gate.py) bounds the
            # effect at <1% relative on the mini model.
            import ml_dtypes

            scale = np.asarray(scale).astype(ml_dtypes.bfloat16)
            if bias is not None:
                bias = np.asarray(bias).astype(ml_dtypes.bfloat16)
        return QTensor(
            qs=_as(qs),
            scale=_as(scale),
            bias=_as(bias) if bias is not None else None,
            kind=lay.kind,
            group=lay.group,
            shape=(n, k),
            perm=True,
            perm_shards=perm_shards,
            k_pad=k_pad,
        )
    w = np.asarray(g.dequantize(name, np.float32)).reshape(n, k)
    return QTensor(
        qs=_as(w.astype(dtype, copy=False)), scale=None,
        bias=None, kind="dense", group=0, shape=(n, k)
    )


def _unpack_natural(qs: jax.Array, kind: str, group: int, k: int,
                    perm: bool, shards: int = 1) -> jax.Array:
    """Quantized values -> float natural element order. qs: [..., K or K/2].
    shards: perm_shards of the layout (per-K-chunk permutation)."""
    lead = qs.shape[:-1]
    if perm and shards > 1:
        # each chunk is its own self-permuted layout: fold chunks into a
        # leading axis, unpack, and restore natural chunk order
        kb = qs.shape[-1]
        q = _unpack_natural(
            qs.reshape(*lead, shards, kb // shards), kind, group,
            k // shards, perm)
        return q.reshape(*lead, k)
    if kind == "nib4":
        if perm:
            ng = k // group
            lo = (qs & 0x0F).reshape(*lead, group // 2, ng)
            hi = (qs >> 4).reshape(*lead, group // 2, ng)
            qg = jnp.stack([lo, hi], axis=-2)  # [..., G/2, 2, ng]
            qg = qg.reshape(*lead, group, ng)
            q = jnp.swapaxes(qg, -1, -2).reshape(*lead, k)
        else:
            lo = qs & 0x0F
            hi = qs >> 4
            q = jnp.stack([lo, hi], axis=-1).reshape(*lead, k)
    else:
        if perm:
            ng = k // group
            q = jnp.swapaxes(qs.reshape(*lead, group, ng), -1, -2).reshape(*lead, k)
        else:
            q = qs
    return q.astype(jnp.float32)


def _expand_packed_scales(qt: QTensor, idx=None):
    """Reconstruct flat f32 (scale [., ng], bias [., ng] | None) from the
    packed two-level representation (exact: f16 x small-int products).
    Output follows the STORED j-major group order (g' = j*ns + s,
    quant/device_format.py), matching the stored qs columns: the expansion
    d_exp[g'] = d[g' % ns] is a tile-repeat."""
    from ..gguf.constants import QK_K

    gpb = QK_K // qt.group
    sc_arr = qt.scale if idx is None else qt.scale[idx]
    sub_arr = qt.bias if idx is None else qt.bias[idx]
    n_super = qt.shape[1] // QK_K
    S = sc_arr.shape[-1] // n_super  # 2 rows (d|dmin) for biased formats
    n_group = sub_arr.shape[-1] // S

    def tile(a):
        return jnp.concatenate([a.astype(jnp.float32)] * gpb, axis=-1)

    scale = tile(sc_arr[..., :n_super]) * sub_arr[..., :n_group].astype(
        jnp.float32)
    if S == 2:
        bias = -tile(sc_arr[..., n_super:]) * sub_arr[..., n_group:].astype(
            jnp.float32)
        return scale, bias
    return scale, None


def _unpermute_packed_groups(w: jax.Array, qt: QTensor) -> jax.Array:
    """Columns of a dequantized packed tensor follow the stored j-major
    group order; restore natural column order (quant/device_format.py:
    stored position (j*ns + s)*G + r <- natural (s*gpb + j)*G + r)."""
    from ..gguf.constants import QK_K

    gpb = QK_K // qt.group
    k = qt.shape[1]
    ns = k // QK_K
    lead = w.shape[:-1]
    w = w.reshape(*lead, gpb, ns, qt.group)
    return jnp.swapaxes(w, -3, -2).reshape(*lead, k)


def _local_k_shards(qt: QTensor) -> tuple[int, int]:
    """(k, shards) from the ARRAYS, not qt.shape metadata: a shard_map-local
    K-slice of a perm_shards=p tensor (dist/tp.py) holds k/k_global of the
    permutation chunks."""
    k = qt.qs.shape[-1] * (2 if qt.kind == "nib4" else 1)
    if qt.k_pad:
        return k, 1  # lane-padded layouts are single-chunk by construction
    shards = max(qt.perm_shards * k // qt.shape[1], 1) if qt.perm else 1
    return k, shards


def dequant(qt: QTensor, dtype=jnp.float32) -> jax.Array:
    """Full dequantization (reference path / embeddings / tiny tensors)."""
    if qt.kind == "dense":
        return qt.qs.astype(dtype)
    k, shards = _local_k_shards(qt)
    q = _unpack_natural(qt.qs, qt.kind, qt.group, k, qt.perm, shards)
    if qt.packed:
        scale, bias = _expand_packed_scales(qt)
    else:
        scale, bias = qt.scale, qt.bias
    w = q * jnp.repeat(scale, qt.group, axis=-1)
    if bias is not None:
        w = w + jnp.repeat(bias, qt.group, axis=-1)
    if qt.packed:
        w = _unpermute_packed_groups(w, qt)
    if qt.k_pad:
        # lane-padding groups sit at the TAIL in natural column order
        w = w[..., : qt.shape[1]]
    return w.astype(dtype)


def _rows(qt: QTensor, ids: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Gather + dequantize rows (embedding lookup)."""
    if qt.kind == "dense":
        return qt.qs[ids].astype(dtype)
    k, shards = _local_k_shards(qt)
    q = _unpack_natural(qt.qs[ids], qt.kind, qt.group, k, qt.perm, shards)
    if qt.packed:
        scale, bias = _expand_packed_scales(qt, idx=ids)
    else:
        scale, bias = qt.scale[ids], (
            qt.bias[ids] if qt.bias is not None else None)
    w = q * jnp.repeat(scale, qt.group, axis=-1)
    if bias is not None:
        w = w + jnp.repeat(bias, qt.group, axis=-1)
    if qt.packed:
        w = _unpermute_packed_groups(w, qt)
    if qt.k_pad:
        w = w[..., : qt.shape[1]]
    return w.astype(dtype)


def permute_rows(qt: QTensor, perm: np.ndarray) -> QTensor:
    """Permute output rows (axis N). Exact for every kind: quantization is
    along K, so each row travels with its own scales/bias.

    Used to de-interleave "norm"-rope q/k projections at load time so the
    whole engine runs split-half ("neox") rotation — the form a Pallas
    kernel can apply with a lane-dim concat instead of a lane interleave
    (model/loader.py deinterleave_rope)."""
    # numpy index keeps host-staged (numpy) tensors on host; indexing a
    # device array with a numpy index works identically
    idx = np.asarray(perm, np.int32)
    return QTensor(
        qs=qt.qs[idx],
        scale=qt.scale[idx] if qt.scale is not None else None,
        bias=qt.bias[idx] if qt.bias is not None else None,
        kind=qt.kind, group=qt.group, shape=qt.shape, perm=qt.perm,
        perm_shards=qt.perm_shards, packed=qt.packed, k_pad=qt.k_pad,
    )


# Pallas kernel hook: set by kernels/dequant_matmul.py when running on TPU.
_PALLAS_QMATMUL = None


def set_pallas_qmatmul(fn) -> None:
    global _PALLAS_QMATMUL
    _PALLAS_QMATMUL = fn


def get_pallas_qmatmul():
    return _PALLAS_QMATMUL


def slice_rows(qt: QTensor, start: int, stop: int) -> QTensor:
    """Slice output rows [start, stop) — exact for every kind (rows carry
    their own scales). The inverse of concat_qtensors; used to split
    fused-on-disk tensors (phi3 attn_qkv / gate|up) for TP sharding."""
    return QTensor(
        qs=qt.qs[start:stop],
        scale=qt.scale[start:stop] if qt.scale is not None else None,
        bias=qt.bias[start:stop] if qt.bias is not None else None,
        kind=qt.kind, group=qt.group, shape=(stop - start, qt.shape[1]),
        perm=qt.perm, perm_shards=qt.perm_shards, packed=qt.packed,
        k_pad=qt.k_pad,
    )


def concat_qtensors(qts: list[QTensor]) -> QTensor | None:
    """Fuse weights along the output dim N (e.g. q|k|v, gate|up) so one
    matmul replaces several sharing the same activation — fewer kernel
    launches and one activation relayout instead of N. Requires matching
    kind/group/K/perm and uniform presence of bias; returns None otherwise."""
    k0 = qts[0]
    if any(
        t.kind != k0.kind or t.group != k0.group or t.shape[1] != k0.shape[1]
        or t.perm != k0.perm or t.perm_shards != k0.perm_shards
        or t.packed != k0.packed or t.k_pad != k0.k_pad
        or (t.bias is None) != (k0.bias is None)
        for t in qts
    ):
        return None
    n_total = sum(t.shape[0] for t in qts)
    # host-staged (numpy) tensors concatenate on host (see qtensor_from_gguf)
    cat = np.concatenate if isinstance(k0.qs, np.ndarray) else jnp.concatenate
    return QTensor(
        qs=cat([t.qs for t in qts], axis=0),
        scale=cat([t.scale for t in qts], axis=0)
        if k0.scale is not None else None,
        bias=cat([t.bias for t in qts], axis=0)
        if k0.bias is not None else None,
        kind=k0.kind, group=k0.group, shape=(n_total, k0.shape[1]), perm=k0.perm,
        perm_shards=k0.perm_shards, packed=k0.packed, k_pad=k0.k_pad,
    )


def stack_layer_dicts(layers: list[dict]) -> dict | list:
    """Stack per-layer weight dicts into ONE dict whose leaves carry a
    leading layer axis — the layout jax.lax.scan consumes (model/llama.py
    scans the transformer layers so XLA compiles ONE layer body instead of
    an n_layer-times unrolled graph; compile time and executable size drop
    ~n_layer-fold). Returns the original list when the layers are not
    uniform (different keys / shapes / quant meta).

    Sharded leaves (TP) keep their placement: the stacked array gets the
    per-layer NamedSharding extended with a leading replicated axis."""
    keys = set(layers[0].keys())
    if any(set(lw.keys()) != keys for lw in layers[1:]):
        return layers

    def stack_arrays(arrs):
        if all(isinstance(a, np.ndarray) for a in arrs):
            # host-staged leaves: stack on host, ONE upload for the whole
            # [L, ...] array (load-time variance fix — see qtensor_from_gguf)
            return jax.device_put(np.stack(arrs))
        shardings = {getattr(a, "sharding", None) for a in arrs}
        out = jnp.stack(arrs)
        sh = shardings.pop() if len(shardings) == 1 else None
        if (sh is not None and hasattr(sh, "spec")
                and any(p is not None for p in sh.spec)):
            from jax.sharding import NamedSharding, PartitionSpec
            out = jax.device_put(
                out, NamedSharding(sh.mesh, PartitionSpec(None, *sh.spec)))
        return out

    out: dict = {}
    for key in keys:
        leaves = [lw[key] for lw in layers]
        if isinstance(leaves[0], QTensor):
            q0 = leaves[0]
            meta = (q0.kind, q0.group, q0.shape, q0.perm, q0.perm_shards,
                    q0.packed, q0.k_pad)
            if any((t.kind, t.group, t.shape, t.perm, t.perm_shards, t.packed,
                    t.k_pad)
                   != meta or t.qs.shape != q0.qs.shape for t in leaves[1:]):
                return layers
            out[key] = QTensor(
                qs=stack_arrays([t.qs for t in leaves]),
                scale=stack_arrays([t.scale for t in leaves])
                if q0.scale is not None else None,
                bias=stack_arrays([t.bias for t in leaves])
                if q0.bias is not None else None,
                kind=q0.kind, group=q0.group, shape=q0.shape, perm=q0.perm,
                perm_shards=q0.perm_shards, packed=q0.packed, k_pad=q0.k_pad,
            )
        else:
            if any(t.shape != leaves[0].shape for t in leaves[1:]):
                return layers
            out[key] = stack_arrays(leaves)
    return out


def layer_slice(qt: QTensor, li) -> QTensor:
    """Per-layer view of a STACKED [L, ...] QTensor (stack_layer_dicts).
    li may be traced (scan) — this is a dynamic slice, so only the
    XLA-fallback path uses it; the Pallas kernel indexes the stacked
    arrays directly via a scalar-prefetch operand instead."""
    return QTensor(
        qs=qt.qs[li],
        scale=qt.scale[li] if qt.scale is not None else None,
        bias=qt.bias[li] if qt.bias is not None else None,
        kind=qt.kind, group=qt.group, shape=qt.shape, perm=qt.perm,
        perm_shards=qt.perm_shards, packed=qt.packed, k_pad=qt.k_pad,
    )


def qmatmul(x: jax.Array, qt: QTensor, li=None) -> jax.Array:
    """y = x @ W.T with W quantized. x: [..., K] -> [..., N].

    li: layer index into a STACKED [L, ...] QTensor (the layer-scanned
    forward passes it; None for per-layer tensors)."""
    if qt.kind == "dense":
        w = qt.qs if li is None else qt.qs[li]
        return x @ w.T.astype(x.dtype)
    if _PALLAS_QMATMUL is not None:
        return _PALLAS_QMATMUL(x, qt, li)
    w = dequant(qt if li is None else layer_slice(qt, li), x.dtype)
    return x @ w.T


embed_rows = _rows
