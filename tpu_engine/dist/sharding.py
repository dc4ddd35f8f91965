"""Mesh + GSPMD shardings for multi-chip serving.

The reference has NO distributed backend (single-host shared library;
SURVEY.md section 2c): tensor parallelism is the TPU-native addition.
Design (scaling-book recipe): declare a (data, model) Mesh, annotate weight
and cache shardings with NamedSharding, and let XLA GSPMD insert the ICI
collectives inside the jitted step.

Megatron-style TP over the "model" axis:
  wq/wk/wv/w_gate/w_up : output features sharded   -> P("model", ...)
  wo/w_down            : input features sharded    -> P(None, "model")
                         (XLA inserts the all-reduce after the row matmul)
  token_embd/output    : vocab sharded             -> P("model", None)
  KV cache             : kv-heads sharded          -> P(None, "data", None, "model", None)
  slots (batch)        : sharded over "data"

Quantized tensors shard with their block structure: qs/scale/bias all shard
the same logical axis, so superblock scales always travel with their data
(BASELINE north-star requirement).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..kvcache.cache import KVCache
from ..model.weights import QTensor

# weight-name -> which logical axis of [N, K] is sharded
_COL_PARALLEL = {"wq", "wk", "wv", "w_gate", "w_up"}  # shard N (dim 0)
_ROW_PARALLEL = {"wo", "w_down"}  # shard K (dim 1)
_VOCAB_PARALLEL = {"token_embd", "output"}  # shard N (dim 0)


def make_mesh(n_data: int = 1, n_model: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_model is None:
        n_model = len(devices) // n_data
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def _divisible(dim: int, parts: int) -> bool:
    return parts > 0 and dim % parts == 0


def shard_qtensor(qt: QTensor, mesh: Mesh, role: str,
                  stacked: bool = False) -> QTensor:
    """Place a QTensor with the TP sharding for its role; falls back to
    replication when a dim doesn't divide the mesh axis. stacked: arrays
    carry a leading (replicated) layer axis."""
    n_model = mesh.shape["model"]
    n, k = qt.shape
    lead = (None,) if stacked else ()

    if role in _COL_PARALLEL or role in _VOCAB_PARALLEL:
        spec = (P(*lead, "model", None) if _divisible(n, n_model)
                else P(*lead, None, None))
    elif role in _ROW_PARALLEL:
        # every K-derived array (packed qs, per-group scale/bias) must divide
        group_ok = qt.kind == "dense" or (
            _divisible(k, n_model)
            and _divisible(qt.qs.shape[-1], n_model)
            and _divisible(qt.scale.shape[-1], n_model)
        )
        spec = (P(*lead, None, "model") if group_ok
                else P(*lead, None, None))
    else:
        spec = P(*lead, None, None)

    def put(arr, s):
        if arr is None:
            return None
        return jax.device_put(arr, NamedSharding(mesh, s))

    # Permuted (kernel-layout) tensors sharded along K split r-ranges in qs
    # but group-ranges in scale/bias — inconsistent partitions of the same
    # logical axis. Keep the small scale/bias arrays replicated there.
    sc_spec = spec
    if qt.perm and spec == P(*lead, None, "model"):
        sc_spec = P(*lead, None, None)
    return QTensor(
        qs=put(qt.qs, spec),
        scale=put(qt.scale, sc_spec) if qt.scale is not None else None,
        bias=put(qt.bias, sc_spec) if qt.bias is not None else None,
        kind=qt.kind,
        group=qt.group,
        shape=qt.shape,
        perm=qt.perm,
        perm_shards=qt.perm_shards,
        packed=qt.packed,
    )


def shard_weights(weights: dict, mesh: Mesh) -> dict:
    """Apply TP shardings to a loaded weight pytree."""
    repl = NamedSharding(mesh, P(None))

    def put_repl(x):
        return jax.device_put(x, repl)

    out = {
        "token_embd": shard_qtensor(weights["token_embd"], mesh, "token_embd"),
        "output_norm": put_repl(weights["output_norm"]),
        "layers": [],
    }
    out["output"] = (
        out["token_embd"]
        if weights["output"] is weights["token_embd"]
        else shard_qtensor(weights["output"], mesh, "output")
    )
    def shard_layer(lw, stacked: bool):
        slw = {}
        for name, t in lw.items():
            if isinstance(t, QTensor):
                slw[name] = shard_qtensor(t, mesh, name, stacked=stacked)
            elif name in ("bq", "bk", "bv"):
                n_model = mesh.shape["model"]
                ax = t.shape[-1] if stacked else t.shape[0]
                lead = (None,) if stacked else ()
                spec = (P(*lead, "model") if ax % n_model == 0
                        else P(*lead, None))
                slw[name] = jax.device_put(t, NamedSharding(mesh, spec))
            else:
                slw[name] = put_repl(t)
        return slw

    lws = weights["layers"]
    if isinstance(lws, dict):  # stacked (scanned) layout
        out["layers"] = shard_layer(lws, True)
    else:
        out["layers"] = [shard_layer(lw, False) for lw in lws]
    return out


def shard_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    """KV cache [L, S, KH, T, D]: slots on "data", kv-heads on "model"."""
    n_model = mesh.shape["model"]
    n_data = mesh.shape["data"]
    s, kh = cache.k.shape[1], cache.k.shape[2]
    head_ax = "model" if kh % max(n_model, 1) == 0 and n_model > 1 else None
    slot_ax = "data" if s % max(n_data, 1) == 0 and n_data > 1 else None
    spec = P(None, slot_ax, head_ax, None, None)
    sc_spec = P(None, slot_ax, head_ax, None)

    def put(arr, sp):
        return jax.device_put(arr, NamedSharding(mesh, sp)) if arr is not None else None

    return KVCache(
        k=put(cache.k, spec),
        v=put(cache.v, spec),
        lengths=put(cache.lengths, P(None)),
        k_scale=put(cache.k_scale, sc_spec),
        v_scale=put(cache.v_scale, sc_spec),
        kind=cache.kind,
        layout=cache.layout,
    )


def make_sharder(mesh: Mesh):
    """loader hook: load_model(..., sharder=make_sharder(mesh))."""
    name_to_role = {
        "attn_q.weight": "wq", "attn_k.weight": "wk", "attn_v.weight": "wv",
        "attn_output.weight": "wo", "ffn_gate.weight": "w_gate",
        "ffn_up.weight": "w_up", "ffn_down.weight": "w_down",
        "token_embd.weight": "token_embd", "output.weight": "output",
    }

    def sharder(name: str, qt: QTensor) -> QTensor:
        suffix = name.split(".", 2)[-1] if name.startswith("blk.") else name
        role = name_to_role.get(suffix, "")
        return shard_qtensor(qt, mesh, role)

    return sharder
