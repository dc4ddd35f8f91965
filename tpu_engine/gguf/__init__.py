from .constants import GGMLType, GGUFValueType, QK_K, QUANT_LEVEL_ALIASES, ggml_type_size
from .reader import GGUFFile, TensorInfo, read_gguf
from .writer import GGUFWriter

__all__ = [
    "GGMLType", "GGUFValueType", "QK_K", "QUANT_LEVEL_ALIASES", "ggml_type_size",
    "GGUFFile", "TensorInfo", "read_gguf", "GGUFWriter",
]
