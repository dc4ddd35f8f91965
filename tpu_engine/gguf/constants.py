"""GGUF v3 container constants.

Layouts reconstructed from the public GGUF specification (ggml-org) — the
reference consumes this format through llama.cpp's model loader
(SURVEY.md section 2b "Model loading (GGUF)"; reference call site
/root/reference/src/llama_server_context.cc:207).
"""

from __future__ import annotations

import enum

GGUF_MAGIC = 0x46554747  # b"GGUF" little-endian
GGUF_VERSION = 3
GGUF_DEFAULT_ALIGNMENT = 32


class GGUFValueType(enum.IntEnum):
    UINT8 = 0
    INT8 = 1
    UINT16 = 2
    INT16 = 3
    UINT32 = 4
    INT32 = 5
    FLOAT32 = 6
    BOOL = 7
    STRING = 8
    ARRAY = 9
    UINT64 = 10
    INT64 = 11
    FLOAT64 = 12


class GGMLType(enum.IntEnum):
    """ggml tensor dtypes appearing in GGUF tensor infos."""

    F32 = 0
    F16 = 1
    Q4_0 = 2
    Q4_1 = 3
    # 4, 5: removed upstream (Q4_2/Q4_3)
    Q5_0 = 6
    Q5_1 = 7
    Q8_0 = 8
    Q8_1 = 9
    Q2_K = 10
    Q3_K = 11
    Q4_K = 12
    Q5_K = 13
    Q6_K = 14
    Q8_K = 15
    IQ2_XXS = 16
    IQ2_XS = 17
    IQ3_XXS = 18
    IQ1_S = 19
    IQ4_NL = 20
    IQ3_S = 21
    IQ2_S = 22
    IQ4_XS = 23
    I8 = 24
    I16 = 25
    I32 = 26
    I64 = 27
    F64 = 28
    IQ1_M = 29
    BF16 = 30


QK_K = 256  # k-quant superblock length
K_SCALE_SIZE = 12  # packed 6-bit scales+mins bytes in Q4_K/Q5_K

# (block_elems, block_bytes) per ggml type.
GGML_BLOCK_INFO: dict[GGMLType, tuple[int, int]] = {
    GGMLType.F32: (1, 4),
    GGMLType.F16: (1, 2),
    GGMLType.BF16: (1, 2),
    GGMLType.F64: (1, 8),
    GGMLType.I8: (1, 1),
    GGMLType.I16: (1, 2),
    GGMLType.I32: (1, 4),
    GGMLType.I64: (1, 8),
    GGMLType.Q4_0: (32, 18),   # f16 d + 16B nibbles
    GGMLType.Q4_1: (32, 20),   # f16 d, f16 m + 16B nibbles
    GGMLType.Q5_0: (32, 22),   # f16 d + 4B high bits + 16B nibbles
    GGMLType.Q5_1: (32, 24),   # f16 d, f16 m + 4B high bits + 16B nibbles
    GGMLType.Q8_0: (32, 34),   # f16 d + 32 int8
    GGMLType.Q8_1: (32, 36),   # f32 d, f32 s + 32 int8
    GGMLType.Q2_K: (QK_K, 2 + 2 + QK_K // 16 + QK_K // 4),          # 84
    GGMLType.Q3_K: (QK_K, QK_K // 8 + QK_K // 4 + 12 + 2),          # 110
    GGMLType.Q4_K: (QK_K, 2 + 2 + K_SCALE_SIZE + QK_K // 2),        # 144
    GGMLType.Q5_K: (QK_K, 2 + 2 + K_SCALE_SIZE + QK_K // 8 + QK_K // 2),  # 176
    GGMLType.Q6_K: (QK_K, QK_K // 2 + QK_K // 4 + QK_K // 16 + 2),  # 210
    GGMLType.Q8_K: (QK_K, 4 + QK_K + QK_K // 16 * 2),               # 292
}


def ggml_type_size(ty: GGMLType, n_elems: int) -> int:
    """Byte size of ``n_elems`` elements of ggml type ``ty``."""
    blk, nbytes = GGML_BLOCK_INFO[ty]
    if n_elems % blk != 0:
        raise ValueError(f"{n_elems} elements not a multiple of block {blk} for {ty.name}")
    return n_elems // blk * nbytes


# Quant-level aliases accepted by the model-conversion surface
# (reference quant matrix: .github/workflows/convert-model-all-quant.yml:115-131).
QUANT_LEVEL_ALIASES = {
    "q2_k": GGMLType.Q2_K,
    "q3_k_s": GGMLType.Q3_K,
    "q3_k_m": GGMLType.Q3_K,
    "q3_k_l": GGMLType.Q3_K,
    "q4_0": GGMLType.Q4_0,
    "q4_1": GGMLType.Q4_1,
    "q4_k_s": GGMLType.Q4_K,
    "q4_k_m": GGMLType.Q4_K,
    "q5_0": GGMLType.Q5_0,
    "q5_1": GGMLType.Q5_1,
    "q5_k_s": GGMLType.Q5_K,
    "q5_k_m": GGMLType.Q5_K,
    "q6_k": GGMLType.Q6_K,
    "q8_0": GGMLType.Q8_0,
    "f16": GGMLType.F16,
    "bf16": GGMLType.BF16,
    "f32": GGMLType.F32,
}
