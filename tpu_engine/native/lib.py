"""ctypes wrapper for the native host library (libteconvert.so).

Accelerates the model-load hot path (block extraction + kernel-layout
permutation) with a multithreaded C++ implementation; numpy fallback when
the library isn't built. Results are bit-identical to the numpy path
(tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

from ..gguf.constants import GGMLType
from ..quant.device_format import LAYOUTS

log = logging.getLogger("tpu_engine.native")

_LIB = None
_TRIED = False

_SO_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libteconvert.so")
_SRC_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "convert.cc")


def _needs_build() -> bool:
    """The library is never shipped prebuilt (it is gitignored); rebuild
    whenever the source is newer so a stale binary can't shadow convert.cc."""
    if not os.path.exists(_SO_PATH):
        return True
    try:
        return os.path.getmtime(_SRC_PATH) > os.path.getmtime(_SO_PATH)
    except OSError:
        return True


def _load() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("TPU_ENGINE_NATIVE", "1") == "0":
        log.info("native lib disabled via TPU_ENGINE_NATIVE=0")
        return None
    if _needs_build():
        try:  # build on first use (g++ is in the image)
            subprocess.run(
                ["make", "-B", "-C", os.path.dirname(_SO_PATH)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception as e:
            log.info("native lib unavailable (%s); using numpy fallback", e)
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.te_extract_device.restype = ctypes.c_int
        lib.te_extract_device.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.te_dequant.restype = ctypes.c_int
        lib.te_dequant.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int,
        ]
        _LIB = lib
    except OSError as e:
        log.info("native lib load failed (%s); using numpy fallback", e)
    return _LIB


def available() -> bool:
    return _load() is not None


def n_threads() -> int:
    return max(os.cpu_count() or 1, 1)


def extract_device(raw: np.ndarray, ty: GGMLType, n: int, k: int,
                   shards: int = 1):
    """Native fused extract+permute into the kernel layout.

    shards > 1 applies the kernel permutation per K-chunk so the result can
    shard along K for tensor parallelism (quant/device_format.py).
    Returns (qs, scale, bias) or None if the native path is unavailable.
    """
    lib = _load()
    if lib is None or ty not in LAYOUTS:
        return None
    lay = LAYOUTS[ty]
    raw = np.ascontiguousarray(raw, np.uint8)
    qs = np.empty((n, k // 2), np.uint8) if lay.kind == "nib4" else np.empty((n, k), np.int8)
    scale = np.empty((n, k // lay.group), np.float32)
    bias = np.empty((n, k // lay.group), np.float32) if lay.has_bias else None
    rc = lib.te_extract_device(
        int(ty),
        raw.ctypes.data_as(ctypes.c_void_p),
        n, k,
        qs.ctypes.data_as(ctypes.c_void_p),
        scale.ctypes.data_as(ctypes.c_void_p),
        bias.ctypes.data_as(ctypes.c_void_p) if bias is not None else None,
        n_threads(),
        shards,
    )
    if rc != 0:
        return None
    return qs, scale, bias


def dequant(raw: np.ndarray, ty: GGMLType, n: int, k: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw, np.uint8)
    out = np.empty((n, k), np.float32)
    rc = lib.te_dequant(
        int(ty), raw.ctypes.data_as(ctypes.c_void_p), n, k,
        out.ctypes.data_as(ctypes.c_void_p), n_threads(),
    )
    return out if rc == 0 else None
