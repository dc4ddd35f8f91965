"""GGUF/ggml block-quant formats: reference numpy dequant + RTN quantizers.

This is the capability surface SURVEY.md section 2b row "Quant formats"
requires: Q4_0/Q4_1/Q5_0/Q5_1/Q8_0 (32-element blocks) and the k-quants
Q2_K/Q3_K/Q4_K/Q5_K/Q6_K (256-element superblocks with packed sub-block
scales/mins). Dequantization is bit-faithful to ggml's public layouts
(element ordering, nibble packing, 6-bit scale packing) so that perplexity
matches llama.cpp on the same GGUF file. Quantization here is plain
round-to-nearest producing *valid* blocks (ggml's encoder does an error
search; any valid encoding decodes identically by construction).

All functions are vectorized over blocks. `dequantize` returns float32.
"""

from __future__ import annotations

import numpy as np

from ..gguf.constants import GGML_BLOCK_INFO, K_SCALE_SIZE, QK_K, GGMLType


def _f16(b: np.ndarray) -> np.ndarray:
    """View little-endian byte pairs as float16 -> float32."""
    return b.view(np.float16).astype(np.float32)


def _to_f16_bytes(x: np.ndarray) -> np.ndarray:
    return x.astype(np.float16).view(np.uint8)


def _blocks(raw: np.ndarray, ty: GGMLType) -> np.ndarray:
    _, bsize = GGML_BLOCK_INFO[ty]
    raw = np.frombuffer(raw, dtype=np.uint8) if not isinstance(raw, np.ndarray) else raw
    if raw.size % bsize != 0:
        raise ValueError(f"raw size {raw.size} not a multiple of block size {bsize}")
    return raw.reshape(-1, bsize)


def _nearest_int(x: np.ndarray) -> np.ndarray:
    # round-half-away-from-zero, like ggml's nearest_int usage patterns
    return np.trunc(x + np.where(x >= 0, 0.5, -0.5)).astype(np.int32)


# ---------------------------------------------------------------------------
# 32-element block formats
# ---------------------------------------------------------------------------

def dequant_q4_0(raw) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q4_0)
    d = _f16(b[:, 0:2])[:, 0:1]
    qs = b[:, 2:18]
    lo = (qs & 0x0F).astype(np.int32) - 8
    hi = (qs >> 4).astype(np.int32) - 8
    out = np.empty((b.shape[0], 32), np.float32)
    out[:, :16] = d * lo
    out[:, 16:] = d * hi
    return out.reshape(-1)


def quant_q4_0(x: np.ndarray) -> bytes:
    x = x.reshape(-1, 32).astype(np.float32)
    imax = np.argmax(np.abs(x), axis=1)
    smax = x[np.arange(x.shape[0]), imax]  # signed value of max |x|
    d = (smax / -8).astype(np.float16).astype(np.float32)
    inv = np.where(d != 0, 1.0 / np.where(d == 0, 1, d), 0.0)
    q = np.clip(np.floor(x * inv[:, None] + 8.5), 0, 15).astype(np.uint8)
    out = np.zeros((x.shape[0], 18), np.uint8)
    out[:, 0:2] = _to_f16_bytes(d).reshape(-1, 2)
    out[:, 2:18] = q[:, :16] | (q[:, 16:] << 4)
    return out.tobytes()


def dequant_q4_1(raw) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q4_1)
    d = _f16(b[:, 0:2])[:, 0:1]
    m = _f16(b[:, 2:4])[:, 0:1]
    qs = b[:, 4:20]
    out = np.empty((b.shape[0], 32), np.float32)
    out[:, :16] = d * (qs & 0x0F) + m
    out[:, 16:] = d * (qs >> 4) + m
    return out.reshape(-1)


def quant_q4_1(x: np.ndarray) -> bytes:
    x = x.reshape(-1, 32).astype(np.float32)
    mn, mx = x.min(1), x.max(1)
    d = ((mx - mn) / 15).astype(np.float16).astype(np.float32)
    m = mn.astype(np.float16).astype(np.float32)
    inv = np.where(d != 0, 1.0 / np.where(d == 0, 1, d), 0.0)
    q = np.clip(_nearest_int((x - m[:, None]) * inv[:, None]), 0, 15).astype(np.uint8)
    out = np.zeros((x.shape[0], 20), np.uint8)
    out[:, 0:2] = _to_f16_bytes(d.astype(np.float32)).reshape(-1, 2)
    out[:, 2:4] = _to_f16_bytes(m.astype(np.float32)).reshape(-1, 2)
    out[:, 4:20] = q[:, :16] | (q[:, 16:] << 4)
    return out.tobytes()


def dequant_q5_0(raw) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q5_0)
    d = _f16(b[:, 0:2])[:, 0:1]
    qh = b[:, 2:6].copy().view(np.uint32)  # [nb,1]
    qs = b[:, 6:22]
    j = np.arange(16, dtype=np.uint32)
    hlo = ((qh >> j) & 1).astype(np.int32)
    hhi = ((qh >> (j + 16)) & 1).astype(np.int32)
    out = np.empty((b.shape[0], 32), np.float32)
    out[:, :16] = d * (((qs & 0x0F).astype(np.int32) | (hlo << 4)) - 16)
    out[:, 16:] = d * (((qs >> 4).astype(np.int32) | (hhi << 4)) - 16)
    return out.reshape(-1)


def quant_q5_0(x: np.ndarray) -> bytes:
    x = x.reshape(-1, 32).astype(np.float32)
    imax = np.argmax(np.abs(x), axis=1)
    smax = x[np.arange(x.shape[0]), imax]
    d = (smax / -16).astype(np.float16).astype(np.float32)
    inv = np.where(d != 0, 1.0 / np.where(d == 0, 1, d), 0.0)
    q = np.clip(np.floor(x * inv[:, None] + 16.5), 0, 31).astype(np.uint32)
    qh = np.zeros(x.shape[0], np.uint32)
    for j in range(32):
        qh |= ((q[:, j] >> 4) & 1) << j
    out = np.zeros((x.shape[0], 22), np.uint8)
    out[:, 0:2] = _to_f16_bytes(d).reshape(-1, 2)
    out[:, 2:6] = qh[:, None].view(np.uint8)
    ql = (q & 0x0F).astype(np.uint8)
    out[:, 6:22] = ql[:, :16] | (ql[:, 16:] << 4)
    return out.tobytes()


def dequant_q5_1(raw) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q5_1)
    d = _f16(b[:, 0:2])[:, 0:1]
    m = _f16(b[:, 2:4])[:, 0:1]
    qh = b[:, 4:8].copy().view(np.uint32)
    qs = b[:, 8:24]
    j = np.arange(16, dtype=np.uint32)
    hlo = ((qh >> j) & 1).astype(np.int32)
    hhi = ((qh >> (j + 16)) & 1).astype(np.int32)
    out = np.empty((b.shape[0], 32), np.float32)
    out[:, :16] = d * ((qs & 0x0F).astype(np.int32) | (hlo << 4)) + m
    out[:, 16:] = d * ((qs >> 4).astype(np.int32) | (hhi << 4)) + m
    return out.reshape(-1)


def quant_q5_1(x: np.ndarray) -> bytes:
    x = x.reshape(-1, 32).astype(np.float32)
    mn, mx = x.min(1), x.max(1)
    d = ((mx - mn) / 31).astype(np.float16).astype(np.float32)
    m = mn.astype(np.float16).astype(np.float32)
    inv = np.where(d != 0, 1.0 / np.where(d == 0, 1, d), 0.0)
    q = np.clip(_nearest_int((x - m[:, None]) * inv[:, None]), 0, 31).astype(np.uint32)
    qh = np.zeros(x.shape[0], np.uint32)
    for j in range(32):
        qh |= ((q[:, j] >> 4) & 1) << j
    out = np.zeros((x.shape[0], 24), np.uint8)
    out[:, 0:2] = _to_f16_bytes(d).reshape(-1, 2)
    out[:, 2:4] = _to_f16_bytes(m).reshape(-1, 2)
    out[:, 4:8] = qh[:, None].view(np.uint8)
    ql = (q & 0x0F).astype(np.uint8)
    out[:, 8:24] = ql[:, :16] | (ql[:, 16:] << 4)
    return out.tobytes()


def dequant_q8_0(raw) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q8_0)
    d = _f16(b[:, 0:2])[:, 0:1]
    qs = b[:, 2:34].view(np.int8).astype(np.float32)
    return (d * qs).reshape(-1)


def quant_q8_0(x: np.ndarray) -> bytes:
    x = x.reshape(-1, 32).astype(np.float32)
    amax = np.abs(x).max(1)
    d = (amax / 127).astype(np.float16).astype(np.float32)
    inv = np.where(d != 0, 1.0 / np.where(d == 0, 1, d), 0.0)
    q = np.clip(_nearest_int(x * inv[:, None]), -127, 127).astype(np.int8)
    out = np.zeros((x.shape[0], 34), np.uint8)
    out[:, 0:2] = _to_f16_bytes(d).reshape(-1, 2)
    out[:, 2:34] = q.view(np.uint8)
    return out.tobytes()


# ---------------------------------------------------------------------------
# k-quant superblock helpers
# ---------------------------------------------------------------------------

def unpack_scale_min_k4(scales12: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """ggml get_scale_min_k4: 12 packed bytes -> 8 x (6-bit sc, 6-bit m).

    scales12: [nb, 12] uint8 -> (sc [nb, 8], m [nb, 8]) int32
    """
    s = scales12.astype(np.int32)
    sc = np.empty((s.shape[0], 8), np.int32)
    m = np.empty((s.shape[0], 8), np.int32)
    for j in range(4):
        sc[:, j] = s[:, j] & 63
        m[:, j] = s[:, j + 4] & 63
    for j in range(4, 8):
        sc[:, j] = (s[:, j + 4] & 0x0F) | ((s[:, j - 4] >> 6) << 4)
        m[:, j] = (s[:, j + 4] >> 4) | ((s[:, j] >> 6) << 4)
    return sc, m


def pack_scale_min_k4(sc: np.ndarray, m: np.ndarray) -> np.ndarray:
    """Inverse of unpack_scale_min_k4 (ggml quantize_row_q4_K packing)."""
    nb = sc.shape[0]
    out = np.zeros((nb, 12), np.uint8)
    for j in range(8):
        ls = sc[:, j].astype(np.uint8)
        lm = m[:, j].astype(np.uint8)
        if j < 4:
            out[:, j] = ls
            out[:, j + 4] = lm
        else:
            out[:, j + 4] = (ls & 0x0F) | ((lm & 0x0F) << 4)
            out[:, j - 4] |= (ls >> 4) << 6
            out[:, j] |= (lm >> 4) << 6
    return out


def _subblock_scale_min(x16: np.ndarray, nmax: int):
    """Per-sub-block (rows) affine RTN params: x ~ D*q - M, q in [0, nmax]."""
    mn = np.minimum(x16.min(axis=-1), 0.0)
    mx = np.maximum(x16.max(axis=-1), 0.0)
    D = (mx - mn) / nmax
    M = -mn
    return D, M


# ---------------------------------------------------------------------------
# Q4_K
# ---------------------------------------------------------------------------

def dequant_q4_k(raw) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q4_K)
    nb = b.shape[0]
    d = _f16(b[:, 0:2])[:, 0]
    dmin = _f16(b[:, 2:4])[:, 0]
    sc, m = unpack_scale_min_k4(b[:, 4:16])
    qs = b[:, 16:144]
    out = np.empty((nb, QK_K), np.float32)
    for c in range(4):  # 4 chunks of 64
        q = qs[:, 32 * c : 32 * c + 32]
        dl1 = d * sc[:, 2 * c]
        ml1 = dmin * m[:, 2 * c]
        dl2 = d * sc[:, 2 * c + 1]
        ml2 = dmin * m[:, 2 * c + 1]
        out[:, 64 * c : 64 * c + 32] = dl1[:, None] * (q & 0x0F) - ml1[:, None]
        out[:, 64 * c + 32 : 64 * c + 64] = dl2[:, None] * (q >> 4) - ml2[:, None]
    return out.reshape(-1)


def _quant_k_affine(x: np.ndarray, nmax: int):
    """Shared RTN for Q4_K/Q5_K: returns (d, dmin, sc6, m6, q) per superblock.

    x: [nb, 256] -> q in [0, nmax] per element, 8 sub-blocks of 32.
    """
    nb = x.shape[0]
    xs = x.reshape(nb, 8, 32)
    D, M = _subblock_scale_min(xs, nmax)  # [nb, 8]
    d = (D.max(1) / 63).astype(np.float16).astype(np.float32)
    dmin = (M.max(1) / 63).astype(np.float16).astype(np.float32)
    invd = np.where(d > 0, 1.0 / np.where(d == 0, 1, d), 0.0)
    invm = np.where(dmin > 0, 1.0 / np.where(dmin == 0, 1, dmin), 0.0)
    sc6 = np.clip(_nearest_int(D * invd[:, None]), 0, 63)
    m6 = np.clip(_nearest_int(M * invm[:, None]), 0, 63)
    Deff = d[:, None] * sc6  # [nb, 8]
    Meff = dmin[:, None] * m6
    invDeff = np.where(Deff > 0, 1.0 / np.where(Deff == 0, 1, Deff), 0.0)
    q = np.clip(_nearest_int((xs + Meff[:, :, None]) * invDeff[:, :, None]), 0, nmax)
    return d, dmin, sc6, m6, q.reshape(nb, QK_K)


def quant_q4_k(x: np.ndarray) -> bytes:
    x = x.reshape(-1, QK_K).astype(np.float32)
    nb = x.shape[0]
    d, dmin, sc6, m6, q = _quant_k_affine(x, 15)
    out = np.zeros((nb, 144), np.uint8)
    out[:, 0:2] = _to_f16_bytes(d).reshape(-1, 2)
    out[:, 2:4] = _to_f16_bytes(dmin).reshape(-1, 2)
    out[:, 4:16] = pack_scale_min_k4(sc6, m6)
    q = q.astype(np.uint8)
    for c in range(4):
        lo = q[:, 64 * c : 64 * c + 32]
        hi = q[:, 64 * c + 32 : 64 * c + 64]
        out[:, 16 + 32 * c : 16 + 32 * c + 32] = lo | (hi << 4)
    return out.tobytes()


# ---------------------------------------------------------------------------
# Q5_K
# ---------------------------------------------------------------------------

def dequant_q5_k(raw) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q5_K)
    nb = b.shape[0]
    d = _f16(b[:, 0:2])[:, 0]
    dmin = _f16(b[:, 2:4])[:, 0]
    sc, m = unpack_scale_min_k4(b[:, 4:16])
    qh = b[:, 16:48]
    qs = b[:, 48:176]
    out = np.empty((nb, QK_K), np.float32)
    for c in range(4):
        ql = qs[:, 32 * c : 32 * c + 32]
        u1 = np.uint8(1 << (2 * c))
        u2 = np.uint8(2 << (2 * c))
        h1 = np.where((qh & u1) != 0, 16, 0)
        h2 = np.where((qh & u2) != 0, 16, 0)
        dl1 = d * sc[:, 2 * c]
        ml1 = dmin * m[:, 2 * c]
        dl2 = d * sc[:, 2 * c + 1]
        ml2 = dmin * m[:, 2 * c + 1]
        out[:, 64 * c : 64 * c + 32] = dl1[:, None] * ((ql & 0x0F) + h1) - ml1[:, None]
        out[:, 64 * c + 32 : 64 * c + 64] = dl2[:, None] * ((ql >> 4) + h2) - ml2[:, None]
    return out.reshape(-1)


def quant_q5_k(x: np.ndarray) -> bytes:
    x = x.reshape(-1, QK_K).astype(np.float32)
    nb = x.shape[0]
    d, dmin, sc6, m6, q = _quant_k_affine(x, 31)
    out = np.zeros((nb, 176), np.uint8)
    out[:, 0:2] = _to_f16_bytes(d).reshape(-1, 2)
    out[:, 2:4] = _to_f16_bytes(dmin).reshape(-1, 2)
    out[:, 4:16] = pack_scale_min_k4(sc6, m6)
    qh = np.zeros((nb, 32), np.uint8)
    ql_all = np.zeros((nb, 128), np.uint8)
    q = q.astype(np.uint8)
    for c in range(4):
        lo = q[:, 64 * c : 64 * c + 32]
        hi = q[:, 64 * c + 32 : 64 * c + 64]
        ql_all[:, 32 * c : 32 * c + 32] = (lo & 0x0F) | ((hi & 0x0F) << 4)
        qh |= ((lo >> 4) << (2 * c)) | ((hi >> 4) << (2 * c + 1))
    out[:, 16:48] = qh
    out[:, 48:176] = ql_all
    return out.tobytes()


# ---------------------------------------------------------------------------
# Q6_K
# ---------------------------------------------------------------------------

def dequant_q6_k(raw) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q6_K)
    nb = b.shape[0]
    ql = b[:, 0:128]
    qh = b[:, 128:192]
    sc = b[:, 192:208].view(np.int8).astype(np.int32)
    d = _f16(b[:, 208:210])[:, 0:1]
    out = np.empty((nb, QK_K), np.float32)
    l = np.arange(32)
    is_ = l // 16  # 0 or 1
    for n in range(2):  # two halves of 128
        qln = ql[:, 64 * n : 64 * n + 64].astype(np.int32)
        qhn = qh[:, 32 * n : 32 * n + 32].astype(np.int32)
        scn = sc[:, 8 * n : 8 * n + 8]
        q1 = ((qln[:, :32] & 0x0F) | (((qhn >> 0) & 3) << 4)) - 32
        q2 = ((qln[:, 32:] & 0x0F) | (((qhn >> 2) & 3) << 4)) - 32
        q3 = ((qln[:, :32] >> 4) | (((qhn >> 4) & 3) << 4)) - 32
        q4 = ((qln[:, 32:] >> 4) | (((qhn >> 6) & 3) << 4)) - 32
        base = 128 * n
        out[:, base + 0 : base + 32] = d * scn[:, is_] * q1
        out[:, base + 32 : base + 64] = d * scn[:, is_ + 2] * q2
        out[:, base + 64 : base + 96] = d * scn[:, is_ + 4] * q3
        out[:, base + 96 : base + 128] = d * scn[:, is_ + 6] * q4
    return out.reshape(-1)


def quant_q6_k(x: np.ndarray) -> bytes:
    x = x.reshape(-1, QK_K).astype(np.float32)
    nb = x.shape[0]
    xg = x.reshape(nb, 16, 16)  # 16 groups of 16
    # ggml make_qx_quants convention: scale = signed_max / -nmax, so the
    # extreme element maps exactly to -nmax (sign absorbed by int8 scale).
    imax = np.argmax(np.abs(xg), axis=-1)
    smax = np.take_along_axis(xg, imax[:, :, None], axis=-1)[:, :, 0]
    sg = smax / -32.0
    d = (np.abs(sg).max(1) / 127).astype(np.float16).astype(np.float32)
    invd = np.where(d > 0, 1.0 / np.where(d == 0, 1, d), 0.0)
    sc8 = np.clip(_nearest_int(sg * invd[:, None]), -128, 127)  # int8 scales
    Deff = d[:, None] * sc8
    invD = np.where(Deff != 0, 1.0 / np.where(Deff == 0, 1, Deff), 0.0)
    q = np.clip(_nearest_int(xg * invD[:, :, None]), -32, 31) + 32  # [nb,16,16] in 0..63
    q = q.reshape(nb, QK_K).astype(np.uint8)

    out = np.zeros((nb, 210), np.uint8)
    # The element->(ql,qh) mapping is the inverse of dequant_q6_k.
    for n in range(2):
        base = 128 * n
        g1 = q[:, base + 0 : base + 32]
        g2 = q[:, base + 32 : base + 64]
        g3 = q[:, base + 64 : base + 96]
        g4 = q[:, base + 96 : base + 128]
        out[:, 64 * n : 64 * n + 32] = (g1 & 0x0F) | ((g3 & 0x0F) << 4)
        out[:, 64 * n + 32 : 64 * n + 64] = (g2 & 0x0F) | ((g4 & 0x0F) << 4)
        out[:, 128 + 32 * n : 128 + 32 * n + 32] = (
            (g1 >> 4) | ((g2 >> 4) << 2) | ((g3 >> 4) << 4) | ((g4 >> 4) << 6)
        )
    out[:, 192:208] = sc8.astype(np.int8).view(np.uint8)
    out[:, 208:210] = _to_f16_bytes(d).reshape(-1, 2)
    return out.tobytes()


# ---------------------------------------------------------------------------
# Q2_K
# ---------------------------------------------------------------------------

def dequant_q2_k(raw) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q2_K)
    nb = b.shape[0]
    scales = b[:, 0:16].astype(np.int32)
    qs = b[:, 16:80]
    d = _f16(b[:, 80:82])[:, 0]
    dmin = _f16(b[:, 82:84])[:, 0]
    out = np.empty((nb, QK_K), np.float32)
    for n in range(2):  # halves of 128
        qh = qs[:, 32 * n : 32 * n + 32].astype(np.int32)
        for j in range(4):
            shift = 2 * j
            for half in range(2):  # two 16-element groups per (n, j)
                is_ = 8 * n + 2 * j + half
                sc = scales[:, is_]
                dl = d * (sc & 0x0F)
                ml = dmin * (sc >> 4)
                q16 = (qh[:, 16 * half : 16 * half + 16] >> shift) & 3
                lo = 128 * n + 32 * j + 16 * half
                out[:, lo : lo + 16] = dl[:, None] * q16 - ml[:, None]
    return out.reshape(-1)


def quant_q2_k(x: np.ndarray) -> bytes:
    x = x.reshape(-1, QK_K).astype(np.float32)
    nb = x.shape[0]
    xg = x.reshape(nb, 16, 16)
    D, M = _subblock_scale_min(xg, 3)  # [nb,16]
    d = (D.max(1) / 15).astype(np.float16).astype(np.float32)
    dmin = (M.max(1) / 15).astype(np.float16).astype(np.float32)
    invd = np.where(d > 0, 1.0 / np.where(d == 0, 1, d), 0.0)
    invm = np.where(dmin > 0, 1.0 / np.where(dmin == 0, 1, dmin), 0.0)
    sc4 = np.clip(_nearest_int(D * invd[:, None]), 0, 15)
    m4 = np.clip(_nearest_int(M * invm[:, None]), 0, 15)
    Deff = d[:, None] * sc4
    Meff = dmin[:, None] * m4
    invD = np.where(Deff > 0, 1.0 / np.where(Deff == 0, 1, Deff), 0.0)
    q = np.clip(_nearest_int((xg + Meff[:, :, None]) * invD[:, :, None]), 0, 3)
    q = q.reshape(nb, QK_K).astype(np.uint8)

    out = np.zeros((nb, 84), np.uint8)
    out[:, 0:16] = (sc4 | (m4 << 4)).astype(np.uint8)
    qs = np.zeros((nb, 64), np.uint8)
    for n in range(2):
        for j in range(4):
            grp = q[:, 128 * n + 32 * j : 128 * n + 32 * j + 32]
            qs[:, 32 * n : 32 * n + 32] |= grp << (2 * j)
    out[:, 16:80] = qs
    out[:, 80:82] = _to_f16_bytes(d).reshape(-1, 2)
    out[:, 82:84] = _to_f16_bytes(dmin).reshape(-1, 2)
    return out.tobytes()


# ---------------------------------------------------------------------------
# Q3_K
# ---------------------------------------------------------------------------

def _unpack_q3k_scales(s12: np.ndarray) -> np.ndarray:
    """12 packed bytes -> 16 signed scales (6-bit, offset -32). [nb,16] int32."""
    s = s12.astype(np.int32)
    out = np.empty((s.shape[0], 16), np.int32)
    for j in range(16):
        lo4 = (s[:, j] & 0x0F) if j < 8 else (s[:, j - 8] >> 4)
        hi2 = (s[:, 8 + j % 4] >> (2 * (j // 4))) & 3
        out[:, j] = (lo4 | (hi2 << 4)) - 32
    return out


def _pack_q3k_scales(sc6: np.ndarray) -> np.ndarray:
    """16 values in 0..63 -> 12 packed bytes (ggml quantize_row_q3_K layout)."""
    nb = sc6.shape[0]
    out = np.zeros((nb, 12), np.uint8)
    for j in range(16):
        l = sc6[:, j].astype(np.uint8)
        if j < 8:
            out[:, j] |= l & 0x0F
        else:
            out[:, j - 8] |= (l & 0x0F) << 4
        out[:, 8 + j % 4] |= (l >> 4) << (2 * (j // 4))
    return out


def dequant_q3_k(raw) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q3_K)
    nb = b.shape[0]
    hmask = b[:, 0:32].astype(np.int32)
    qs = b[:, 32:96]
    scales = _unpack_q3k_scales(b[:, 96:108])
    d = _f16(b[:, 108:110])[:, 0]
    out = np.empty((nb, QK_K), np.float32)
    m = 1
    for n in range(2):
        qh = qs[:, 32 * n : 32 * n + 32].astype(np.int32)
        for j in range(4):
            shift = 2 * j
            for half in range(2):
                is_ = 8 * n + 2 * j + half
                dl = d * scales[:, is_]
                q16 = (qh[:, 16 * half : 16 * half + 16] >> shift) & 3
                hm = hmask[:, 16 * half : 16 * half + 16]
                q16 = q16 - np.where((hm & m) != 0, 0, 4)
                lo = 128 * n + 32 * j + 16 * half
                out[:, lo : lo + 16] = dl[:, None] * q16
            m <<= 1
    return out.reshape(-1)


def quant_q3_k(x: np.ndarray) -> bytes:
    x = x.reshape(-1, QK_K).astype(np.float32)
    nb = x.shape[0]
    xg = x.reshape(nb, 16, 16)
    imax = np.argmax(np.abs(xg), axis=-1)
    smax = np.take_along_axis(xg, imax[:, :, None], axis=-1)[:, :, 0]
    sg = smax / -4.0  # q3 signed range -4..3; extreme -> -4 exactly
    mx = np.abs(sg).max(1)
    d = np.where(mx > 0, mx / 31.0, 0.0).astype(np.float16).astype(np.float32)
    invd = np.where(d != 0, 1.0 / np.where(d == 0, 1, d), 0.0)
    s6 = np.clip(_nearest_int(sg * invd[:, None]), -32, 31)  # signed 6-bit
    Deff = d[:, None] * s6
    invD = np.where(Deff != 0, 1.0 / np.where(Deff == 0, 1, Deff), 0.0)
    q = np.clip(_nearest_int(xg * invD[:, :, None]), -4, 3) + 4  # 0..7
    q = q.reshape(nb, QK_K).astype(np.uint8)

    out = np.zeros((nb, 110), np.uint8)
    hmask = np.zeros((nb, 32), np.uint8)
    qs = np.zeros((nb, 64), np.uint8)
    m = 1
    for n in range(2):
        for j in range(4):
            grp = q[:, 128 * n + 32 * j : 128 * n + 32 * j + 32]
            qs[:, 32 * n : 32 * n + 32] |= (grp & 3) << (2 * j)
            hmask |= np.where(grp >= 4, m, 0).astype(np.uint8)
            m <<= 1
    out[:, 0:32] = hmask
    out[:, 32:96] = qs
    out[:, 96:108] = _pack_q3k_scales(s6 + 32)
    out[:, 108:110] = _to_f16_bytes(d).reshape(-1, 2)
    return out.tobytes()


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

_DEQUANT = {
    GGMLType.Q4_0: dequant_q4_0,
    GGMLType.Q4_1: dequant_q4_1,
    GGMLType.Q5_0: dequant_q5_0,
    GGMLType.Q5_1: dequant_q5_1,
    GGMLType.Q8_0: dequant_q8_0,
    GGMLType.Q2_K: dequant_q2_k,
    GGMLType.Q3_K: dequant_q3_k,
    GGMLType.Q4_K: dequant_q4_k,
    GGMLType.Q5_K: dequant_q5_k,
    GGMLType.Q6_K: dequant_q6_k,
}

_QUANT = {
    GGMLType.Q4_0: quant_q4_0,
    GGMLType.Q4_1: quant_q4_1,
    GGMLType.Q5_0: quant_q5_0,
    GGMLType.Q5_1: quant_q5_1,
    GGMLType.Q8_0: quant_q8_0,
    GGMLType.Q2_K: quant_q2_k,
    GGMLType.Q3_K: quant_q3_k,
    GGMLType.Q4_K: quant_q4_k,
    GGMLType.Q5_K: quant_q5_k,
    GGMLType.Q6_K: quant_q6_k,
}


def dequantize(raw, ggml_type: GGMLType, n_elems: int | None = None) -> np.ndarray:
    if ggml_type == GGMLType.F32:
        out = np.frombuffer(raw, dtype=np.float32).copy()
    elif ggml_type == GGMLType.F16:
        out = np.frombuffer(raw, dtype=np.float16).astype(np.float32)
    elif ggml_type == GGMLType.BF16:
        u = np.frombuffer(raw, dtype=np.uint16).astype(np.uint32) << 16
        out = u.view(np.float32).copy()
    else:
        fn = _DEQUANT.get(ggml_type)
        if fn is None:
            raise NotImplementedError(f"dequant for {ggml_type.name}")
        out = fn(raw)
    if n_elems is not None and out.size != n_elems:
        raise ValueError(f"decoded {out.size} elements, expected {n_elems}")
    return out


def quantize(x: np.ndarray, ggml_type: GGMLType) -> bytes:
    if ggml_type == GGMLType.F32:
        return x.astype(np.float32).tobytes()
    if ggml_type == GGMLType.F16:
        return x.astype(np.float16).tobytes()
    fn = _QUANT.get(ggml_type)
    if fn is None:
        raise NotImplementedError(f"quantize for {ggml_type.name}")
    return fn(x)
