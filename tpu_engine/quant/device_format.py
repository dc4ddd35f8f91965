"""Load-time conversion of GGUF blocks into the unified device layout.

TPU kernels should not chase ggml's byte-interleaved superblock structs
through HBM. At load time we rewrite every supported format into ONE
uniform blockwise layout in natural element order:

    qs:    "nib4" -> uint8 [N, K/2]  (element 2j = low nibble, 2j+1 = high)
           "i8"   -> int8  [N, K]
    scale: float32 [N, K/G]   (G = 16 or 32 depending on format)
    bias:  float32 [N, K/G] or None (symmetric formats)

so that dequant(w)[n, k] = qs[n, k] * scale[n, k//G] + bias[n, k//G].

The conversion is exact: scale = d * sc and bias = -dmin * m are products
of an f16 value and a <=6-bit integer, which are exactly representable in
f32, so device dequant is bit-identical to the ggml reference dequant
(verified in tests/test_device_format.py). This keeps perplexity parity
(SURVEY.md section 7 "Perplexity parity") while letting a single Pallas
kernel template serve every format.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..gguf.constants import GGML_BLOCK_INFO, QK_K, GGMLType
from . import formats as F


@dataclass(frozen=True)
class QuantLayout:
    kind: str  # "nib4" | "i8"
    group: int  # elements per scale group
    has_bias: bool


LAYOUTS: dict[GGMLType, QuantLayout] = {
    GGMLType.Q4_0: QuantLayout("nib4", 32, True),
    GGMLType.Q4_1: QuantLayout("nib4", 32, True),
    GGMLType.Q5_0: QuantLayout("i8", 32, True),
    GGMLType.Q5_1: QuantLayout("i8", 32, True),
    GGMLType.Q8_0: QuantLayout("i8", 32, False),
    GGMLType.Q2_K: QuantLayout("nib4", 16, True),
    GGMLType.Q3_K: QuantLayout("i8", 16, False),
    GGMLType.Q4_K: QuantLayout("nib4", 32, True),
    GGMLType.Q5_K: QuantLayout("i8", 32, True),
    GGMLType.Q6_K: QuantLayout("i8", 16, False),
}


@dataclass
class DeviceQuant:
    """Host-side (numpy) unified quantized tensor, ready for device upload."""

    ggml_type: GGMLType
    layout: QuantLayout
    shape: tuple[int, int]  # (N, K) logical
    qs: np.ndarray
    scale: np.ndarray
    bias: np.ndarray | None

    def dequantize(self) -> np.ndarray:
        n, k = self.shape
        g = self.layout.group
        if self.layout.kind == "nib4":
            q = np.empty((n, k), np.float32)
            q[:, 0::2] = self.qs & 0x0F
            q[:, 1::2] = self.qs >> 4
        else:
            q = self.qs.astype(np.float32)
        w = q * np.repeat(self.scale, g, axis=1)
        if self.bias is not None:
            w += np.repeat(self.bias, g, axis=1)
        return w


def _pack_nib4(q: np.ndarray) -> np.ndarray:
    """uint values 0..15, natural order [N, K] -> packed [N, K/2]."""
    return (q[:, 0::2] | (q[:, 1::2] << 4)).astype(np.uint8)


def _extract(raw: np.ndarray, ty: GGMLType, n: int, k: int):
    """Return (q_natural [n*k], scale [n*k/G], bias [n*k/G] or None)."""
    nb_per_row = k // GGML_BLOCK_INFO[ty][0]
    b = raw.reshape(-1, GGML_BLOCK_INFO[ty][1])

    if ty == GGMLType.Q8_0:
        d = b[:, 0:2].view(np.float16).astype(np.float32)
        q = b[:, 2:34].view(np.int8)
        return q.reshape(-1), d.reshape(-1), None

    if ty == GGMLType.Q4_0:
        d = b[:, 0:2].view(np.float16).astype(np.float32).reshape(-1)
        qs = b[:, 2:18]
        q = np.empty((b.shape[0], 32), np.uint8)
        q[:, :16] = qs & 0x0F
        q[:, 16:] = qs >> 4
        return q.reshape(-1), d, -8.0 * d

    if ty == GGMLType.Q4_1:
        d = b[:, 0:2].view(np.float16).astype(np.float32).reshape(-1)
        m = b[:, 2:4].view(np.float16).astype(np.float32).reshape(-1)
        qs = b[:, 4:20]
        q = np.empty((b.shape[0], 32), np.uint8)
        q[:, :16] = qs & 0x0F
        q[:, 16:] = qs >> 4
        return q.reshape(-1), d, m

    if ty in (GGMLType.Q5_0, GGMLType.Q5_1):
        off = 2 if ty == GGMLType.Q5_0 else 4
        d = b[:, 0:2].view(np.float16).astype(np.float32).reshape(-1)
        if ty == GGMLType.Q5_1:
            m = b[:, 2:4].view(np.float16).astype(np.float32).reshape(-1)
        qh = b[:, off : off + 4].copy().view(np.uint32)
        qs = b[:, off + 4 : off + 20]
        j = np.arange(16, dtype=np.uint32)
        q = np.empty((b.shape[0], 32), np.int16)
        q[:, :16] = (qs & 0x0F) | (((qh >> j) & 1) << 4).astype(np.uint8)
        q[:, 16:] = (qs >> 4) | (((qh >> (j + 16)) & 1) << 4).astype(np.uint8)
        if ty == GGMLType.Q5_0:
            return (q - 16).astype(np.int8).reshape(-1), d, np.zeros_like(d)
        return q.astype(np.int8).reshape(-1), d, m

    if ty == GGMLType.Q4_K:
        d = b[:, 0:2].view(np.float16).astype(np.float32)
        dmin = b[:, 2:4].view(np.float16).astype(np.float32)
        sc, m = F.unpack_scale_min_k4(b[:, 4:16])
        qs = b[:, 16:144]
        q = np.empty((b.shape[0], QK_K), np.uint8)
        for c in range(4):
            blk = qs[:, 32 * c : 32 * c + 32]
            q[:, 64 * c : 64 * c + 32] = blk & 0x0F
            q[:, 64 * c + 32 : 64 * c + 64] = blk >> 4
        scale = (d * sc).astype(np.float32)  # [nb, 8]
        bias = (-dmin * m).astype(np.float32)
        return q.reshape(-1), scale.reshape(-1), bias.reshape(-1)

    if ty == GGMLType.Q5_K:
        d = b[:, 0:2].view(np.float16).astype(np.float32)
        dmin = b[:, 2:4].view(np.float16).astype(np.float32)
        sc, m = F.unpack_scale_min_k4(b[:, 4:16])
        qh = b[:, 16:48]
        qs = b[:, 48:176]
        q = np.empty((b.shape[0], QK_K), np.uint8)
        for c in range(4):
            ql = qs[:, 32 * c : 32 * c + 32]
            u1 = np.uint8(1 << (2 * c))
            u2 = np.uint8(2 << (2 * c))
            q[:, 64 * c : 64 * c + 32] = (ql & 0x0F) + np.where((qh & u1) != 0, 16, 0).astype(np.uint8)
            q[:, 64 * c + 32 : 64 * c + 64] = (ql >> 4) + np.where((qh & u2) != 0, 16, 0).astype(np.uint8)
        scale = (d * sc).astype(np.float32)
        bias = (-dmin * m).astype(np.float32)
        return q.reshape(-1).view(np.int8), scale.reshape(-1), bias.reshape(-1)

    if ty == GGMLType.Q6_K:
        ql = b[:, 0:128]
        qh = b[:, 128:192]
        sc = b[:, 192:208].view(np.int8).astype(np.float32)
        d = b[:, 208:210].view(np.float16).astype(np.float32)
        q = np.empty((b.shape[0], QK_K), np.int16)
        for n_ in range(2):
            qln = ql[:, 64 * n_ : 64 * n_ + 64].astype(np.int16)
            qhn = qh[:, 32 * n_ : 32 * n_ + 32].astype(np.int16)
            base = 128 * n_
            q[:, base : base + 32] = ((qln[:, :32] & 0x0F) | (((qhn >> 0) & 3) << 4)) - 32
            q[:, base + 32 : base + 64] = ((qln[:, 32:] & 0x0F) | (((qhn >> 2) & 3) << 4)) - 32
            q[:, base + 64 : base + 96] = ((qln[:, :32] >> 4) | (((qhn >> 4) & 3) << 4)) - 32
            q[:, base + 96 : base + 128] = ((qln[:, 32:] >> 4) | (((qhn >> 6) & 3) << 4)) - 32
        # Q6_K's scale index (is + 2*quarter within each half) is exactly the
        # natural-order 16-group index, so per-group scales are just d * sc.
        scale = (d * sc).astype(np.float32)
        return q.astype(np.int8).reshape(-1), scale.reshape(-1), None

    if ty == GGMLType.Q2_K:
        scales = b[:, 0:16]
        qs = b[:, 16:80]
        d = b[:, 80:82].view(np.float16).astype(np.float32)
        dmin = b[:, 82:84].view(np.float16).astype(np.float32)
        q = np.empty((b.shape[0], QK_K), np.uint8)
        for n_ in range(2):
            qh = qs[:, 32 * n_ : 32 * n_ + 32]
            for j in range(4):
                q[:, 128 * n_ + 32 * j : 128 * n_ + 32 * j + 32] = (qh >> (2 * j)) & 3
        scale = d * (scales & 0x0F)  # [nb, 16] per-16 in natural order
        bias = -dmin * (scales >> 4)
        return q.reshape(-1), scale.astype(np.float32).reshape(-1), bias.astype(np.float32).reshape(-1)

    if ty == GGMLType.Q3_K:
        hmask = b[:, 0:32]
        qs = b[:, 32:96]
        sc6 = F._unpack_q3k_scales(b[:, 96:108]).astype(np.float32)
        d = b[:, 108:110].view(np.float16).astype(np.float32)
        q = np.empty((b.shape[0], QK_K), np.int8)
        m = 1
        for n_ in range(2):
            qh = qs[:, 32 * n_ : 32 * n_ + 32]
            for j in range(4):
                vals = ((qh >> (2 * j)) & 3).astype(np.int8)
                vals = vals - np.where((hmask & m) != 0, 0, 4).astype(np.int8)
                q[:, 128 * n_ + 32 * j : 128 * n_ + 32 * j + 32] = vals
                m <<= 1
        scale = (d * sc6).astype(np.float32)  # [nb, 16] natural order
        return q.reshape(-1), scale.reshape(-1), None

    raise NotImplementedError(f"device format for {ty.name}")


def permute_group_transpose_i8(qs: np.ndarray, group: int,
                               shards: int = 1) -> np.ndarray:
    """Natural-order int8 values [N, K] -> kernel layout [N, K] with
    k' = r*ng + g (g = group index, r = position in group, ng = K/group).

    Consecutive kernel columns then cycle through groups with period ng, so
    per-group scales broadcast with a tile-repeat (see
    kernels/dequant_matmul.py).

    shards > 1 applies the permutation independently within each of
    `shards` contiguous K-chunks (chunk length a multiple of group), so the
    tensor can be sharded along K for tensor parallelism with each shard a
    self-consistent kernel layout (dist/tp.py). Implemented by treating
    every chunk as its own row.
    """
    n, k = qs.shape
    if shards > 1:
        out = permute_group_transpose_i8(
            qs.reshape(n * shards, k // shards), group)
        return out.reshape(n, k)
    ng = k // group
    return np.ascontiguousarray(
        qs.reshape(n, ng, group).transpose(0, 2, 1).reshape(n, k)
    )


def unpermute_group_transpose_i8(qs: np.ndarray, group: int,
                                 shards: int = 1) -> np.ndarray:
    n, k = qs.shape
    if shards > 1:
        out = unpermute_group_transpose_i8(
            qs.reshape(n * shards, k // shards), group)
        return out.reshape(n, k)
    ng = k // group
    return qs.reshape(n, group, ng).transpose(0, 2, 1).reshape(n, k)


def permute_group_transpose_nib4(packed: np.ndarray, group: int,
                                 shards: int = 1) -> np.ndarray:
    """Natural packed nibbles [N, K/2] (byte j = elements 2j, 2j+1) ->
    kernel layout [N, K/2] where byte b = (elements (g, 2*r2), (g, 2*r2+1))
    at b = r2*ng + g: the low-nibble plane covers even positions-in-group,
    the high-nibble plane odd ones, and both planes share the same group
    cycle with period ng. shards: as permute_group_transpose_i8."""
    n, kb = packed.shape
    if shards > 1:
        out = permute_group_transpose_nib4(
            packed.reshape(n * shards, kb // shards), group)
        return out.reshape(n, kb)
    k = kb * 2
    ng = k // group
    q = np.empty((n, k), np.uint8)
    q[:, 0::2] = packed & 0x0F
    q[:, 1::2] = packed >> 4
    qg = q.reshape(n, ng, group).transpose(0, 2, 1)  # [N, G, ng]
    lo = qg[:, 0::2, :].reshape(n, kb)
    hi = qg[:, 1::2, :].reshape(n, kb)
    return np.ascontiguousarray(lo | (hi << 4))


def unpermute_group_transpose_nib4(packed: np.ndarray, group: int,
                                   shards: int = 1) -> np.ndarray:
    n, kb = packed.shape
    if shards > 1:
        out = unpermute_group_transpose_nib4(
            packed.reshape(n * shards, kb // shards), group)
        return out.reshape(n, kb)
    k = kb * 2
    ng = k // group
    lo = (packed & 0x0F).reshape(n, group // 2, ng)
    hi = (packed >> 4).reshape(n, group // 2, ng)
    qg = np.empty((n, group, ng), np.uint8)
    qg[:, 0::2, :] = lo
    qg[:, 1::2, :] = hi
    q = qg.transpose(0, 2, 1).reshape(n, k)  # natural element order
    return np.ascontiguousarray(q[:, 0::2] | (q[:, 1::2] << 4))


@dataclass
class DeviceQuantPacked:
    """Two-level k-quant scale storage (the HBM-lean layout).

    The flat layout (DeviceQuant) stores one f32 scale (+ f32 bias) per
    G-group: 0.25 B/elem on top of the nibbles — 33% more HBM traffic per
    Q4_K weight than the ggml file itself. This layout keeps ggml's
    structure: f16 d (+dmin) per 256-superblock and the small integer
    sub-scales per group, and the kernel reconstructs
    scale = d * sc, bias = -dmin * m in f32 (EXACT — f16 x 6-bit products
    are representable; same bit-exactness as the flat layout, verified in
    tests/test_device_format.py). 0.578 B/elem total for Q4_K.

    GROUP ORDER: this layout stores groups J-MAJOR ("interleaved
    superblock" order): stored group index g' = j*ns + s, where s is the
    superblock and j the position within it (natural g = s*gpb + j). Both
    qs columns and sub follow g'; d_dmin stays s-ordered. This makes the
    in-kernel superblock->group expansion of d a TILE-repeat
    (pltpu.repeat, the one broadcast Mosaic does natively):
    d_exp[g'] = d[g' % ns]. Element-repeat (needed by natural order) has
    no cheap Mosaic lowering, and an exact 0/1-matrix dot costs ~10% of
    the whole matmul (measured on v5e, 7B shapes).

    d_dmin: f16 [N, S, n_super]  (S=2 rows d,dmin for biased formats; S=1)
    sub:    int8/uint8 [N, S, n_group]  (rows sc, m; j-major group order)
    """

    ggml_type: GGMLType
    layout: QuantLayout
    shape: tuple[int, int]
    qs: np.ndarray
    d_dmin: np.ndarray
    sub: np.ndarray

    def scale_bias(self) -> tuple[np.ndarray, np.ndarray | None]:
        """Reconstruct the flat f32 per-group scale/bias (exact), in the
        STORED (j-major) group order — pair with the j-major qs."""
        n, k = self.shape
        ns = k // QK_K
        gpb = QK_K // self.layout.group
        d = np.tile(self.d_dmin[:, 0].astype(np.float32), (1, gpb))
        scale = d * self.sub[:, 0].astype(np.float32)
        if self.layout.has_bias:
            dmin = np.tile(self.d_dmin[:, 1].astype(np.float32), (1, gpb))
            return scale, -dmin * self.sub[:, 1].astype(np.float32)
        return scale, None

    def group_perm(self) -> np.ndarray:
        """perm[g'] = natural group index at stored position g'."""
        ns = self.shape[1] // QK_K
        gpb = QK_K // self.layout.group
        return np.arange(ns * gpb).reshape(ns, gpb).T.reshape(-1)


# k-quant formats with two-level scales the packed layout supports
PACKED_TYPES = (GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q5_K,
                GGMLType.Q6_K)


def _extract_packed(raw: np.ndarray, ty: GGMLType, n: int, k: int):
    """(q natural [n*k], d_dmin f16 [n, S, ns], sub i8/u8 [n, S, ng])."""
    b = np.asarray(raw, np.uint8).reshape(-1, GGML_BLOCK_INFO[ty][1])
    nb = b.shape[0]

    if ty in (GGMLType.Q4_K, GGMLType.Q5_K):
        d = b[:, 0:2].view(np.float16).reshape(-1)
        dmin = b[:, 2:4].view(np.float16).reshape(-1)
        sc, m = F.unpack_scale_min_k4(b[:, 4:16])  # [nb, 8] 6-bit ints
        if ty == GGMLType.Q4_K:
            qs = b[:, 16:144]
            q = np.empty((nb, QK_K), np.uint8)
            for c in range(4):
                blk = qs[:, 32 * c : 32 * c + 32]
                q[:, 64 * c : 64 * c + 32] = blk & 0x0F
                q[:, 64 * c + 32 : 64 * c + 64] = blk >> 4
        else:
            qh = b[:, 16:48]
            qs = b[:, 48:176]
            q = np.empty((nb, QK_K), np.uint8)
            for c in range(4):
                ql = qs[:, 32 * c : 32 * c + 32]
                u1 = np.uint8(1 << (2 * c))
                u2 = np.uint8(2 << (2 * c))
                q[:, 64 * c : 64 * c + 32] = (ql & 0x0F) + np.where((qh & u1) != 0, 16, 0).astype(np.uint8)
                q[:, 64 * c + 32 : 64 * c + 64] = (ql >> 4) + np.where((qh & u2) != 0, 16, 0).astype(np.uint8)
            q = q.view(np.int8)
        d_dmin = np.stack([d, dmin], axis=1)  # [nb, 2]
        sub = np.stack([sc.astype(np.uint8), m.astype(np.uint8)], axis=1)
        return q.reshape(-1), d_dmin, sub

    if ty == GGMLType.Q6_K:
        ql = b[:, 0:128]
        qh = b[:, 128:192]
        sc = b[:, 192:208].view(np.int8)  # [nb, 16] signed 8-bit
        d = b[:, 208:210].view(np.float16).reshape(-1)
        q = np.empty((nb, QK_K), np.int16)
        for n_ in range(2):
            qln = ql[:, 64 * n_ : 64 * n_ + 64].astype(np.int16)
            qhn = qh[:, 32 * n_ : 32 * n_ + 32].astype(np.int16)
            base = 128 * n_
            q[:, base : base + 32] = ((qln[:, :32] & 0x0F) | (((qhn >> 0) & 3) << 4)) - 32
            q[:, base + 32 : base + 64] = ((qln[:, 32:] & 0x0F) | (((qhn >> 2) & 3) << 4)) - 32
            q[:, base + 64 : base + 96] = ((qln[:, :32] >> 4) | (((qhn >> 4) & 3) << 4)) - 32
            q[:, base + 96 : base + 128] = ((qln[:, 32:] >> 4) | (((qhn >> 6) & 3) << 4)) - 32
        return (q.astype(np.int8).reshape(-1), d[:, None],
                sc[:, None, :].astype(np.int8))

    if ty == GGMLType.Q2_K:
        scales = b[:, 0:16]
        qs = b[:, 16:80]
        d = b[:, 80:82].view(np.float16).reshape(-1)
        dmin = b[:, 82:84].view(np.float16).reshape(-1)
        q = np.empty((nb, QK_K), np.uint8)
        for n_ in range(2):
            qh = qs[:, 32 * n_ : 32 * n_ + 32]
            for j in range(4):
                q[:, 128 * n_ + 32 * j : 128 * n_ + 32 * j + 32] = (qh >> (2 * j)) & 3
        d_dmin = np.stack([d, dmin], axis=1)
        sub = np.stack([(scales & 0x0F), (scales >> 4)], axis=1)  # [nb,2,16]
        return q.reshape(-1), d_dmin, sub

    if ty == GGMLType.Q3_K:
        sc6 = F._unpack_q3k_scales(b[:, 96:108]).astype(np.int8)  # [nb,16] -32..31
        d = b[:, 108:110].view(np.float16).reshape(-1)
        hmask = b[:, 0:32]
        qs = b[:, 32:96]
        q = np.empty((nb, QK_K), np.int8)
        m_ = 1
        for n_ in range(2):
            qh = qs[:, 32 * n_ : 32 * n_ + 32]
            for j in range(4):
                vals = ((qh >> (2 * j)) & 3).astype(np.int8)
                vals = vals - np.where((hmask & m_) != 0, 0, 4).astype(np.int8)
                q[:, 128 * n_ + 32 * j : 128 * n_ + 32 * j + 32] = vals
                m_ <<= 1
        return q.reshape(-1), d[:, None], sc6[:, None, :]

    raise NotImplementedError(ty.name)


def to_device_format_packed(raw: np.ndarray, ty: GGMLType,
                            shape: tuple[int, ...]) -> DeviceQuantPacked:
    """Two-level scale conversion; last axis is the quantized axis."""
    layout = LAYOUTS[ty]
    k = shape[-1]
    n = 1
    for dim in shape[:-1]:
        n *= dim
    q, d_dmin, sub = _extract_packed(np.asarray(raw, np.uint8), ty, n, k)
    nbpr = k // QK_K  # superblocks per row
    gpb = QK_K // layout.group
    S = d_dmin.shape[1] if d_dmin.ndim == 2 else 1
    d_dmin = d_dmin.reshape(n, nbpr, -1).transpose(0, 2, 1)  # [n, S, ns]
    # j-major group order (see DeviceQuantPacked): g' = j*ns + s
    sub = sub.reshape(n, nbpr, -1, gpb).transpose(0, 2, 3, 1).reshape(
        n, -1, nbpr * gpb)  # [n, S, ng] with ng ordered (j, s)
    q = q.reshape(n, nbpr, gpb, layout.group).transpose(0, 2, 1, 3).reshape(
        n, k)  # natural columns reordered to (j, s, r)
    if layout.kind == "nib4":
        qs = _pack_nib4(q.astype(np.uint8))
    else:
        qs = q.astype(np.int8)
    return DeviceQuantPacked(ggml_type=ty, layout=layout, shape=(n, k),
                             qs=qs, d_dmin=np.ascontiguousarray(d_dmin),
                             sub=np.ascontiguousarray(sub))


def to_device_format(raw: np.ndarray, ty: GGMLType, shape: tuple[int, ...]) -> DeviceQuant:
    """Convert raw GGUF block bytes to the unified device layout.

    shape: logical numpy shape; last axis is the contiguous/quantized axis.
    """
    layout = LAYOUTS[ty]
    k = shape[-1]
    n = 1
    for dim in shape[:-1]:
        n *= dim
    q, scale, bias = _extract(np.asarray(raw, np.uint8), ty, n, k)
    q = q.reshape(n, k)
    scale = scale.reshape(n, k // layout.group)
    bias = bias.reshape(n, k // layout.group) if bias is not None else None
    if layout.kind == "nib4":
        qs = _pack_nib4(q.astype(np.uint8))
    else:
        qs = q.astype(np.int8)
    if not layout.has_bias:
        bias = None
    return DeviceQuant(
        ggml_type=ty, layout=layout, shape=(n, k), qs=qs, scale=scale, bias=bias
    )
