"""Block-quant format tests.

Strategy (exceeding the reference, which has no unit tests — SURVEY.md §4):
  1. Scalar golden references: direct, loop-by-loop transcriptions of the
     public ggml dequant algorithms, compared against the vectorized
     production kernels on random valid blocks.
  2. Hand-computed golden vectors for simple handcrafted block bytes.
  3. RTN quantize -> dequantize round-trip error bounds per format.
"""

import numpy as np
import pytest

from tpu_engine.gguf.constants import GGML_BLOCK_INFO, GGMLType
from tpu_engine.quant import formats as F

RNG = np.random.default_rng(0)


# ---------------------------------------------------------------------------
# scalar golden implementations (independent transcription of ggml loops)
# ---------------------------------------------------------------------------

def f16(lo, hi):
    return np.frombuffer(bytes([lo, hi]), dtype=np.float16)[0].astype(np.float32)


def scalar_dequant_q4_0(b):
    d = f16(b[0], b[1])
    y = np.zeros(32, np.float32)
    for j in range(16):
        y[j] = d * ((b[2 + j] & 0xF) - 8)
        y[j + 16] = d * ((b[2 + j] >> 4) - 8)
    return y


def scalar_dequant_q8_0(b):
    d = f16(b[0], b[1])
    q = np.frombuffer(bytes(b[2:34]), dtype=np.int8)
    return d * q.astype(np.float32)


def scalar_dequant_q5_0(b):
    d = f16(b[0], b[1])
    qh = int.from_bytes(bytes(b[2:6]), "little")
    y = np.zeros(32, np.float32)
    for j in range(16):
        xh0 = ((qh >> j) & 1) << 4
        xh1 = ((qh >> (j + 16)) & 1) << 4
        y[j] = d * (((b[6 + j] & 0xF) | xh0) - 16)
        y[j + 16] = d * (((b[6 + j] >> 4) | xh1) - 16)
    return y


def scalar_get_scale_min_k4(j, q):
    if j < 4:
        return q[j] & 63, q[j + 4] & 63
    d = (q[j + 4] & 0xF) | ((q[j - 4] >> 6) << 4)
    m = (q[j + 4] >> 4) | ((q[j] >> 6) << 4)
    return d, m


def scalar_dequant_q4_k(b):
    d = f16(b[0], b[1])
    dmin = f16(b[2], b[3])
    scales = b[4:16]
    qs = b[16:144]
    y = np.zeros(256, np.float32)
    yi = 0
    is_ = 0
    qoff = 0
    for _ in range(4):  # 64-element chunks
        sc, m = scalar_get_scale_min_k4(is_, scales)
        d1, m1 = d * sc, dmin * m
        sc, m = scalar_get_scale_min_k4(is_ + 1, scales)
        d2, m2 = d * sc, dmin * m
        for l in range(32):
            y[yi] = d1 * (qs[qoff + l] & 0xF) - m1
            yi += 1
        for l in range(32):
            y[yi] = d2 * (qs[qoff + l] >> 4) - m2
            yi += 1
        qoff += 32
        is_ += 2
    return y


def scalar_dequant_q5_k(b):
    d = f16(b[0], b[1])
    dmin = f16(b[2], b[3])
    scales = b[4:16]
    qh = b[16:48]
    ql = b[48:176]
    y = np.zeros(256, np.float32)
    yi = 0
    is_ = 0
    u1, u2 = 1, 2
    qoff = 0
    for _ in range(4):
        sc, m = scalar_get_scale_min_k4(is_, scales)
        d1, m1 = d * sc, dmin * m
        sc, m = scalar_get_scale_min_k4(is_ + 1, scales)
        d2, m2 = d * sc, dmin * m
        for l in range(32):
            y[yi] = d1 * ((ql[qoff + l] & 0xF) + (16 if qh[l] & u1 else 0)) - m1
            yi += 1
        for l in range(32):
            y[yi] = d2 * ((ql[qoff + l] >> 4) + (16 if qh[l] & u2 else 0)) - m2
            yi += 1
        qoff += 32
        is_ += 2
        u1 <<= 2
        u2 <<= 2
    return y


def scalar_dequant_q6_k(b):
    ql = b[0:128]
    qh = b[128:192]
    sc = np.frombuffer(bytes(b[192:208]), dtype=np.int8)
    d = f16(b[208], b[209])
    y = np.zeros(256, np.float32)
    for n in range(2):
        for l in range(32):
            is_ = l // 16
            q1 = ((ql[64 * n + l] & 0xF) | (((qh[32 * n + l] >> 0) & 3) << 4)) - 32
            q2 = ((ql[64 * n + l + 32] & 0xF) | (((qh[32 * n + l] >> 2) & 3) << 4)) - 32
            q3 = ((ql[64 * n + l] >> 4) | (((qh[32 * n + l] >> 4) & 3) << 4)) - 32
            q4 = ((ql[64 * n + l + 32] >> 4) | (((qh[32 * n + l] >> 6) & 3) << 4)) - 32
            y[128 * n + l + 0] = d * sc[8 * n + is_ + 0] * q1
            y[128 * n + l + 32] = d * sc[8 * n + is_ + 2] * q2
            y[128 * n + l + 64] = d * sc[8 * n + is_ + 4] * q3
            y[128 * n + l + 96] = d * sc[8 * n + is_ + 6] * q4
    return y


def scalar_dequant_q2_k(b):
    scales = b[0:16]
    qs = b[16:80]
    d = f16(b[80], b[81])
    dmin = f16(b[82], b[83])
    y = np.zeros(256, np.float32)
    yi = 0
    is_ = 0
    qoff = 0
    for _ in range(2):
        shift = 0
        for _ in range(4):
            sc = scales[is_]
            is_ += 1
            dl, ml = d * (sc & 0xF), dmin * (sc >> 4)
            for l in range(16):
                y[yi] = dl * ((qs[qoff + l] >> shift) & 3) - ml
                yi += 1
            sc = scales[is_]
            is_ += 1
            dl, ml = d * (sc & 0xF), dmin * (sc >> 4)
            for l in range(16):
                y[yi] = dl * ((qs[qoff + 16 + l] >> shift) & 3) - ml
                yi += 1
            shift += 2
        qoff += 32
    return y


def scalar_dequant_q3_k(b):
    hmask = b[0:32]
    qs = b[32:96]
    d = f16(b[108], b[109])
    # unpack 16 6-bit scales (layout per ggml quantize_row_q3_K packing)
    s = b[96:108]
    scales = np.zeros(16, np.int32)
    for j in range(16):
        lo4 = (s[j] & 0xF) if j < 8 else (s[j - 8] >> 4)
        hi2 = (s[8 + j % 4] >> (2 * (j // 4))) & 3
        scales[j] = (lo4 | (hi2 << 4)) - 32
    y = np.zeros(256, np.float32)
    yi = 0
    is_ = 0
    m = 1
    qoff = 0
    for _ in range(2):
        shift = 0
        for _ in range(4):
            dl = d * scales[is_]
            is_ += 1
            for l in range(16):
                q = ((qs[qoff + l] >> shift) & 3) - (0 if hmask[l] & m else 4)
                y[yi] = dl * q
                yi += 1
            dl = d * scales[is_]
            is_ += 1
            for l in range(16):
                q = ((qs[qoff + 16 + l] >> shift) & 3) - (0 if hmask[16 + l] & m else 4)
                y[yi] = dl * q
                yi += 1
            shift += 2
            m <<= 1
        qoff += 32
    return y


SCALAR = {
    GGMLType.Q4_0: scalar_dequant_q4_0,
    GGMLType.Q5_0: scalar_dequant_q5_0,
    GGMLType.Q8_0: scalar_dequant_q8_0,
    GGMLType.Q2_K: scalar_dequant_q2_k,
    GGMLType.Q3_K: scalar_dequant_q3_k,
    GGMLType.Q4_K: scalar_dequant_q4_k,
    GGMLType.Q5_K: scalar_dequant_q5_k,
    GGMLType.Q6_K: scalar_dequant_q6_k,
}


@pytest.mark.parametrize("ty", list(SCALAR))
def test_vectorized_matches_scalar_golden(ty):
    """Vectorized dequant == scalar ggml-transcription on quantizer output."""
    blk, _ = GGML_BLOCK_INFO[ty]
    x = RNG.normal(size=8 * blk).astype(np.float32) * 3.0
    raw = np.frombuffer(F.quantize(x, ty), dtype=np.uint8)
    got = F.dequantize(raw, ty).reshape(8, blk)
    bsize = GGML_BLOCK_INFO[ty][1]
    for i in range(8):
        expect = SCALAR[ty](raw[i * bsize : (i + 1) * bsize].tolist())
        np.testing.assert_allclose(got[i], expect, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("ty", list(SCALAR))
def test_vectorized_matches_scalar_on_random_bytes(ty):
    """Same check on arbitrary random block bytes (scale bytes constrained
    to avoid NaN/inf f16 scales)."""
    blk, bsize = GGML_BLOCK_INFO[ty]
    raw = RNG.integers(0, 256, size=4 * bsize, dtype=np.uint8)
    # Zero the f16 exponent top bits of scale fields to keep them finite.
    scale_offsets = {
        GGMLType.Q4_0: [(0, 2)],
        GGMLType.Q5_0: [(0, 2)],
        GGMLType.Q8_0: [(0, 2)],
        GGMLType.Q2_K: [(80, 82), (82, 84)],
        GGMLType.Q3_K: [(108, 110)],
        GGMLType.Q4_K: [(0, 2), (2, 4)],
        GGMLType.Q5_K: [(0, 2), (2, 4)],
        GGMLType.Q6_K: [(208, 210)],
    }[ty]
    for i in range(4):
        for (a, b) in scale_offsets:
            raw[i * bsize + b - 1] &= 0x3F  # clear sign+top exponent bit
    got = F.dequantize(raw, ty).reshape(4, blk)
    for i in range(4):
        expect = SCALAR[ty](raw[i * bsize : (i + 1) * bsize].tolist())
        np.testing.assert_allclose(got[i], expect, rtol=1e-5, atol=1e-5)


def test_handcrafted_q8_0():
    # d = 0.5 (f16 0x3800); qs = [-3, 7, 0, 127, -128, ...]
    qs = np.zeros(32, np.int8)
    qs[:5] = [-3, 7, 0, 127, -128]
    raw = bytes([0x00, 0x38]) + qs.tobytes()
    y = F.dequantize(np.frombuffer(raw, np.uint8), GGMLType.Q8_0)
    np.testing.assert_allclose(y[:5], [-1.5, 3.5, 0.0, 63.5, -64.0])


def test_handcrafted_q4_0():
    # d = 1.0 (f16 0x3C00); qs[j] = j | ((15-j)<<4)
    qs = bytes((j | ((15 - j) << 4)) for j in range(16))
    raw = bytes([0x00, 0x3C]) + qs
    y = F.dequantize(np.frombuffer(raw, np.uint8), GGMLType.Q4_0)
    np.testing.assert_allclose(y[:16], np.arange(16) - 8.0)  # low nibbles first
    np.testing.assert_allclose(y[16:], (15 - np.arange(16)) - 8.0)


def test_handcrafted_q4_k():
    # d=1.0, dmin=0.5; sc[j]=j+1, m[j]=j (all <16 so packing is trivial)
    sc = [j + 1 for j in range(8)]
    m = list(range(8))
    scales = bytes(sc[:4]) + bytes(m[:4]) + bytes(
        (sc[4 + i] | (m[4 + i] << 4)) for i in range(4)
    )
    qs = bytes([(3 | (7 << 4))] * 128)  # low nibble 3, high nibble 7 everywhere
    raw = bytes([0x00, 0x3C, 0x00, 0x38]) + scales + qs
    y = F.dequantize(np.frombuffer(raw, np.uint8), GGMLType.Q4_K)
    # chunk c: elements 64c..64c+32 = 1.0*sc[2c]*3 - 0.5*m[2c]
    for c in range(4):
        np.testing.assert_allclose(y[64 * c : 64 * c + 32], sc[2 * c] * 3 - 0.5 * m[2 * c])
        np.testing.assert_allclose(
            y[64 * c + 32 : 64 * c + 64], sc[2 * c + 1] * 7 - 0.5 * m[2 * c + 1]
        )


# ---------------------------------------------------------------------------
# round-trip error bounds
# ---------------------------------------------------------------------------

RT_TOL = {
    GGMLType.Q8_0: 0.006,
    GGMLType.Q4_0: 0.10,
    GGMLType.Q4_1: 0.10,
    GGMLType.Q5_0: 0.05,
    GGMLType.Q5_1: 0.05,
    GGMLType.Q6_K: 0.03,
    GGMLType.Q5_K: 0.04,
    GGMLType.Q4_K: 0.08,
    GGMLType.Q3_K: 0.30,
    GGMLType.Q2_K: 0.75,
}


@pytest.mark.parametrize("ty", list(RT_TOL))
def test_roundtrip_error(ty):
    blk, _ = GGML_BLOCK_INFO[ty]
    x = RNG.normal(size=16 * blk).astype(np.float32)
    y = F.dequantize(F.quantize(x, ty), ty)
    assert y.shape == x.shape
    rms = np.sqrt(np.mean((x - y) ** 2))
    assert rms < RT_TOL[ty], f"{ty.name}: rms {rms}"


@pytest.mark.parametrize("ty", list(RT_TOL))
def test_requant_stable(ty):
    """Requantizing already-quantized values adds far less error than the
    first quantization (near-idempotence of the RTN encoder)."""
    blk, _ = GGML_BLOCK_INFO[ty]
    x = RNG.normal(size=4 * blk).astype(np.float32)
    y1 = F.dequantize(F.quantize(x, ty), ty)
    y2 = F.dequantize(F.quantize(y1, ty), ty)
    e1 = np.sqrt(np.mean((x - y1) ** 2))
    e2 = np.sqrt(np.mean((y1 - y2) ** 2))
    assert e2 < 0.25 * e1 + 1e-6, f"{ty.name}: requant rms {e2} vs quant rms {e1}"
