from . import formats
from .formats import dequantize, quantize

__all__ = ["formats", "dequantize", "quantize"]
