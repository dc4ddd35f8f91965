"""GGUF v3 writer.

Used by tests (synthetic models), by the model-conversion tool
(tools/convert.py — the TPU-native analog of the reference's HF→GGUF
pipeline, .github/workflows/convert-model-all-quant.yml), and by the
quantizer. Produces files our reader and llama.cpp both parse.
"""

from __future__ import annotations

import struct
from typing import Iterable

import numpy as np

from .constants import (
    GGUF_DEFAULT_ALIGNMENT,
    GGUF_MAGIC,
    GGUF_VERSION,
    GGMLType,
    GGUFValueType,
    ggml_type_size,
)

_SCALAR_FMT = {
    GGUFValueType.UINT8: "<B",
    GGUFValueType.INT8: "<b",
    GGUFValueType.UINT16: "<H",
    GGUFValueType.INT16: "<h",
    GGUFValueType.UINT32: "<I",
    GGUFValueType.INT32: "<i",
    GGUFValueType.FLOAT32: "<f",
    GGUFValueType.BOOL: "<B",
    GGUFValueType.UINT64: "<Q",
    GGUFValueType.INT64: "<q",
    GGUFValueType.FLOAT64: "<d",
}


def _infer_type(v) -> GGUFValueType:
    if isinstance(v, bool):
        return GGUFValueType.BOOL
    if isinstance(v, int):
        if v < 0:
            return GGUFValueType.INT64 if v < -(2**31) else GGUFValueType.INT32
        return GGUFValueType.UINT64 if v >= 2**32 else GGUFValueType.UINT32
    if isinstance(v, float):
        return GGUFValueType.FLOAT32
    if isinstance(v, str):
        return GGUFValueType.STRING
    if isinstance(v, (list, tuple, np.ndarray)):
        return GGUFValueType.ARRAY
    raise TypeError(f"cannot infer GGUF type for {type(v)}")


class GGUFWriter:
    def __init__(self, path: str, alignment: int = GGUF_DEFAULT_ALIGNMENT):
        self.path = path
        self.alignment = alignment
        self._kv: list[tuple[str, object, GGUFValueType]] = []
        self._tensors: list[tuple[str, tuple[int, ...], GGMLType, bytes]] = []

    # -- metadata -----------------------------------------------------------
    def add(self, key: str, value, vtype: GGUFValueType | None = None) -> None:
        self._kv.append((key, value, vtype or _infer_type(value)))

    def add_array(self, key: str, values: Iterable, elem_type: GGUFValueType) -> None:
        self._kv.append((key, (list(values), elem_type), GGUFValueType.ARRAY))

    # -- tensors ------------------------------------------------------------
    def add_tensor_raw(
        self, name: str, shape: tuple[int, ...], ggml_type: GGMLType, data: bytes
    ) -> None:
        """shape is numpy convention (slowest-first); data is raw block bytes."""
        n = 1
        for d in shape:
            n *= d
        expect = ggml_type_size(ggml_type, n)
        if len(data) != expect:
            raise ValueError(f"{name}: got {len(data)} bytes, expected {expect}")
        self._tensors.append((name, shape, ggml_type, data))

    def add_tensor(self, name: str, arr: np.ndarray, ggml_type: GGMLType | None = None) -> None:
        """Add a float/int tensor, quantizing if a block type is requested."""
        from ..quant import formats

        if ggml_type is None:
            ggml_type = {
                np.dtype(np.float32): GGMLType.F32,
                np.dtype(np.float16): GGMLType.F16,
                np.dtype(np.int8): GGMLType.I8,
                np.dtype(np.int32): GGMLType.I32,
            }[arr.dtype]
        if ggml_type == GGMLType.F32:
            data = np.ascontiguousarray(arr, dtype=np.float32).tobytes()
        elif ggml_type == GGMLType.F16:
            data = np.ascontiguousarray(arr, dtype=np.float16).tobytes()
        elif ggml_type == GGMLType.BF16:
            u = np.ascontiguousarray(arr, dtype=np.float32).view(np.uint32)
            # round-to-nearest-even bf16
            rounded = ((u + 0x7FFF + ((u >> 16) & 1)) >> 16).astype(np.uint16)
            data = rounded.tobytes()
        elif ggml_type == GGMLType.I32:
            data = np.ascontiguousarray(arr, dtype=np.int32).tobytes()
        else:
            data = formats.quantize(np.ascontiguousarray(arr, dtype=np.float32).reshape(-1), ggml_type)
        self.add_tensor_raw(name, tuple(arr.shape), ggml_type, bytes(data))

    # -- serialization ------------------------------------------------------
    def _write_str(self, f, s: str) -> None:
        b = s.encode("utf-8")
        f.write(struct.pack("<Q", len(b)))
        f.write(b)

    def _write_value(self, f, value, vt: GGUFValueType) -> None:
        if vt == GGUFValueType.STRING:
            self._write_str(f, value)
        elif vt == GGUFValueType.ARRAY:
            if isinstance(value, tuple) and len(value) == 2 and isinstance(value[1], GGUFValueType):
                vals, et = value
            else:
                vals = list(value)
                et = _infer_type(vals[0]) if vals else GGUFValueType.INT32
            f.write(struct.pack("<I", int(et)))
            f.write(struct.pack("<Q", len(vals)))
            for v in vals:
                self._write_value(f, v, et)
        else:
            f.write(struct.pack(_SCALAR_FMT[vt], value))

    def write(self) -> None:
        with open(self.path, "wb") as f:
            f.write(struct.pack("<II", GGUF_MAGIC, GGUF_VERSION))
            f.write(struct.pack("<QQ", len(self._tensors), len(self._kv)))
            for key, value, vt in self._kv:
                self._write_str(f, key)
                f.write(struct.pack("<I", int(vt)))
                self._write_value(f, value, vt)

            offset = 0
            infos = []
            for name, shape, ggml_ty, data in self._tensors:
                infos.append((name, shape, ggml_ty, offset))
                offset += (len(data) + self.alignment - 1) // self.alignment * self.alignment

            for name, shape, ggml_ty, off in infos:
                self._write_str(f, name)
                dims = tuple(reversed(shape))  # GGUF stores fastest-first
                f.write(struct.pack("<I", len(dims)))
                f.write(struct.pack(f"<{len(dims)}Q", *dims))
                f.write(struct.pack("<I", int(ggml_ty)))
                f.write(struct.pack("<Q", off))

            pos = f.tell()
            pad = (pos + self.alignment - 1) // self.alignment * self.alignment - pos
            f.write(b"\x00" * pad)
            for _, _, _, data in self._tensors:
                f.write(data)
                pad = (len(data) + self.alignment - 1) // self.alignment * self.alignment - len(data)
                f.write(b"\x00" * pad)
