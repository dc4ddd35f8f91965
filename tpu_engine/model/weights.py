"""Weight pytrees: quantized tensors on device + the matmul/gather ops.

The TPU-native analog of ggml's quantized tensors + mul_mat: weights stay
in the unified blockwise layout (quant/device_format.py) in HBM and are
dequantized inside the matmul (Pallas kernel on TPU, jnp reference path
elsewhere) — never materialized at full precision (SURVEY.md section 2b
"Quant formats": fused dequant+matmul, never materialize f16 weights).
"""

from __future__ import annotations

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
    """A (possibly) quantized 2D weight [N, K] (y = x @ W.T convention)."""

    qs: jax.Array  # dense weights, packed nibbles, or int8 values
    scale: jax.Array | None
    bias: jax.Array | None
    kind: str  # "dense" | "nib4" | "i8"
    group: int
    shape: tuple[int, int]

    def tree_flatten(self):
        return (self.qs, self.scale, self.bias), (self.kind, self.group, self.shape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        qs, scale, bias = children
        kind, group, shape = aux
        return cls(qs=qs, scale=scale, bias=bias, kind=kind, group=group, shape=shape)

    @property
    def bits_per_weight(self) -> float:
        n, k = self.shape
        total = self.qs.size * self.qs.dtype.itemsize
        if self.scale is not None:
            total += self.scale.size * self.scale.dtype.itemsize
        if self.bias is not None:
            total += self.bias.size * self.bias.dtype.itemsize
        return total * 8.0 / (n * k)


def qtensor_from_gguf(g: GGUFFile, name: str, dtype=jnp.float32) -> QTensor:
    ti = g.tensors[name]
    shape = ti.shape
    k = shape[-1]
    n = ti.n_elems // k
    if ti.ggml_type in LAYOUTS:
        dq = to_device_format(g.tensor_bytes(name), ti.ggml_type, (n, k))
        return QTensor(
            qs=jnp.asarray(dq.qs),
            scale=jnp.asarray(dq.scale),
            bias=jnp.asarray(dq.bias) if dq.bias is not None else None,
            kind=dq.layout.kind,
            group=dq.layout.group,
            shape=(n, k),
        )
    w = np.asarray(g.dequantize(name, np.float32)).reshape(n, k)
    return QTensor(
        qs=jnp.asarray(w, dtype), scale=None, bias=None, kind="dense", group=0, shape=(n, k)
    )


def dequant(qt: QTensor, dtype=jnp.float32) -> jax.Array:
    """Full dequantization (reference path / embeddings / tiny tensors)."""
    if qt.kind == "dense":
        return qt.qs.astype(dtype)
    n, k = qt.shape
    if qt.kind == "nib4":
        lo = qt.qs & 0x0F
        hi = qt.qs >> 4
        q = jnp.stack([lo, hi], axis=-1).reshape(n, k).astype(jnp.float32)
    else:
        q = qt.qs.astype(jnp.float32)
    w = q * jnp.repeat(qt.scale, qt.group, axis=-1)
    if qt.bias is not None:
        w = w + jnp.repeat(qt.bias, qt.group, axis=-1)
    return w.astype(dtype)


def _rows(qt: QTensor, ids: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Gather + dequantize rows (embedding lookup)."""
    if qt.kind == "dense":
        return qt.qs[ids].astype(dtype)
    n, k = qt.shape
    qs = qt.qs[ids]
    if qt.kind == "nib4":
        lo = qs & 0x0F
        hi = qs >> 4
        q = jnp.stack([lo, hi], axis=-1).reshape(*ids.shape, k).astype(jnp.float32)
    else:
        q = qs.astype(jnp.float32)
    w = q * jnp.repeat(qt.scale[ids], qt.group, axis=-1)
    if qt.bias is not None:
        w = w + jnp.repeat(qt.bias[ids], qt.group, axis=-1)
    return w.astype(dtype)


# Pallas kernel hook: set by kernels/dequant_matmul.py when running on TPU.
_PALLAS_QMATMUL = None


def set_pallas_qmatmul(fn) -> None:
    global _PALLAS_QMATMUL
    _PALLAS_QMATMUL = fn


def qmatmul(x: jax.Array, qt: QTensor) -> jax.Array:
    """y = x @ W.T with W quantized. x: [..., K] -> [..., N]."""
    if qt.kind == "dense":
        return x @ qt.qs.T.astype(x.dtype)
    if _PALLAS_QMATMUL is not None:
        return _PALLAS_QMATMUL(x, qt)
    w = dequant(qt, x.dtype)
    return x @ w.T


embed_rows = _rows
