"""GGUF v3 reader: header, metadata KV store, tensor table, mmap'd data.

TPU-native replacement for the GGUF loading the reference delegates to
llama.cpp (`common_init_from_params`, /root/reference/src/llama_server_context.cc:207;
SURVEY.md section 2b). We parse the container ourselves and hand raw block
bytes to quant/device_format.py, which rewrites them into TPU-friendly
layouts before device upload.
"""

from __future__ import annotations

import mmap
import os
import struct
from dataclasses import dataclass, field

import numpy as np

from .constants import (
    GGML_BLOCK_INFO,
    GGUF_DEFAULT_ALIGNMENT,
    GGUF_MAGIC,
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

_SCALAR_NP = {
    GGUFValueType.UINT8: np.uint8,
    GGUFValueType.INT8: np.int8,
    GGUFValueType.UINT16: np.uint16,
    GGUFValueType.INT16: np.int16,
    GGUFValueType.UINT32: np.uint32,
    GGUFValueType.INT32: np.int32,
    GGUFValueType.FLOAT32: np.float32,
    GGUFValueType.UINT64: np.uint64,
    GGUFValueType.INT64: np.int64,
    GGUFValueType.FLOAT64: np.float64,
}


@dataclass
class TensorInfo:
    name: str
    # Logical shape, numpy/JAX convention (row-major, slowest first). GGUF
    # stores dims fastest-first; we reverse on read so shape[-1] is the
    # contiguous (quant-block) axis.
    shape: tuple[int, ...]
    ggml_type: GGMLType
    offset: int  # relative to data section start

    @property
    def n_elems(self) -> int:
        n = 1
        for d in self.shape:
            n *= d
        return n

    @property
    def n_bytes(self) -> int:
        return ggml_type_size(self.ggml_type, self.n_elems)


@dataclass
class GGUFFile:
    path: str
    metadata: dict[str, object]
    tensors: dict[str, TensorInfo]
    data_offset: int
    alignment: int
    _mm: mmap.mmap | None = field(default=None, repr=False)
    _f: object = field(default=None, repr=False)

    # -- raw access ---------------------------------------------------------
    def tensor_bytes(self, name: str) -> np.ndarray:
        """Raw block bytes of a tensor as a uint8 view into the mmap."""
        ti = self.tensors[name]
        start = self.data_offset + ti.offset
        return np.frombuffer(self._mm, dtype=np.uint8, count=ti.n_bytes, offset=start)

    def tensor_array(self, name: str) -> np.ndarray:
        """Tensor as a numpy array for non-quantized dtypes (f32/f16/bf16/int)."""
        ti = self.tensors[name]
        raw = self.tensor_bytes(name)
        if ti.ggml_type == GGMLType.F32:
            return raw.view(np.float32).reshape(ti.shape)
        if ti.ggml_type == GGMLType.F16:
            return raw.view(np.float16).reshape(ti.shape)
        if ti.ggml_type == GGMLType.BF16:
            u = raw.view(np.uint16).astype(np.uint32) << 16
            return u.view(np.float32).reshape(ti.shape)
        if ti.ggml_type == GGMLType.I8:
            return raw.view(np.int8).reshape(ti.shape)
        if ti.ggml_type == GGMLType.I16:
            return raw.view(np.int16).reshape(ti.shape)
        if ti.ggml_type == GGMLType.I32:
            return raw.view(np.int32).reshape(ti.shape)
        if ti.ggml_type == GGMLType.I64:
            return raw.view(np.int64).reshape(ti.shape)
        if ti.ggml_type == GGMLType.F64:
            return raw.view(np.float64).reshape(ti.shape)
        raise ValueError(
            f"tensor {name} is quantized ({ti.ggml_type.name}); use quant.dequantize"
        )

    def dequantize(self, name: str, dtype=np.float32) -> np.ndarray:
        """Full dequantization to float via the reference numpy kernels."""
        from ..quant import formats  # local import to avoid cycle

        ti = self.tensors[name]
        if ti.ggml_type in (
            GGMLType.F32, GGMLType.F16, GGMLType.BF16,
            GGMLType.I8, GGMLType.I16, GGMLType.I32, GGMLType.I64, GGMLType.F64,
        ):
            return self.tensor_array(name).astype(dtype)
        flat = formats.dequantize(self.tensor_bytes(name), ti.ggml_type, ti.n_elems)
        return flat.reshape(ti.shape).astype(dtype)

    def close(self) -> None:
        if self._mm is not None:
            self._mm.close()
            self._mm = None
        if self._f is not None:
            self._f.close()
            self._f = None

    def __enter__(self) -> "GGUFFile":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class _Cursor:
    def __init__(self, mm: mmap.mmap):
        self.mm = mm
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.mm[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError("truncated GGUF file")
        self.pos += n
        return b

    def scalar(self, vt: GGUFValueType):
        fmt = _SCALAR_FMT[vt]
        (v,) = struct.unpack(fmt, self.read(struct.calcsize(fmt)))
        if vt == GGUFValueType.BOOL:
            return bool(v)
        return v

    def string(self) -> str:
        (n,) = struct.unpack("<Q", self.read(8))
        return self.read(n).decode("utf-8", errors="replace")

    def value(self, vt: GGUFValueType):
        if vt == GGUFValueType.STRING:
            return self.string()
        if vt == GGUFValueType.ARRAY:
            elem_t = GGUFValueType(struct.unpack("<I", self.read(4))[0])
            (count,) = struct.unpack("<Q", self.read(8))
            if elem_t in _SCALAR_NP and elem_t != GGUFValueType.BOOL:
                npty = _SCALAR_NP[elem_t]
                nbytes = np.dtype(npty).itemsize * count
                arr = np.frombuffer(self.read(nbytes), dtype=npty)
                return arr
            return [self.value(elem_t) for _ in range(count)]
        return self.scalar(vt)


def read_gguf(path: str) -> GGUFFile:
    f = open(path, "rb")
    mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
    cur = _Cursor(mm)

    magic, version = struct.unpack("<II", cur.read(8))
    if magic != GGUF_MAGIC:
        raise ValueError(f"{path}: not a GGUF file (magic {magic:#x})")
    if version not in (2, 3):
        raise ValueError(f"{path}: unsupported GGUF version {version}")
    n_tensors, n_kv = struct.unpack("<QQ", cur.read(16))

    metadata: dict[str, object] = {}
    for _ in range(n_kv):
        key = cur.string()
        vt = GGUFValueType(struct.unpack("<I", cur.read(4))[0])
        metadata[key] = cur.value(vt)

    alignment = int(metadata.get("general.alignment", GGUF_DEFAULT_ALIGNMENT))

    tensors: dict[str, TensorInfo] = {}
    for _ in range(n_tensors):
        name = cur.string()
        (n_dims,) = struct.unpack("<I", cur.read(4))
        dims = struct.unpack(f"<{n_dims}Q", cur.read(8 * n_dims))
        ggml_ty = GGMLType(struct.unpack("<I", cur.read(4))[0])
        (offset,) = struct.unpack("<Q", cur.read(8))
        # GGUF dims are fastest-varying first; flip to numpy convention.
        shape = tuple(int(d) for d in reversed(dims))
        if ggml_ty not in GGML_BLOCK_INFO:
            raise ValueError(f"tensor {name}: unsupported ggml type {ggml_ty}")
        tensors[name] = TensorInfo(name=name, shape=shape, ggml_type=ggml_ty, offset=offset)

    data_offset = (cur.pos + alignment - 1) // alignment * alignment
    return GGUFFile(
        path=os.path.abspath(path),
        metadata=metadata,
        tensors=tensors,
        data_offset=data_offset,
        alignment=alignment,
        _mm=mm,
        _f=f,
    )
