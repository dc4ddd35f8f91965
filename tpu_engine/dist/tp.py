"""Tensor parallelism with the Pallas kernels: shard_map + explicit psum.

The GSPMD path (dist/sharding.py) lets XLA partition the jitted step, but
XLA cannot partition a pallas_call — round 1's fused kernels silently fell
back to XLA dequant exactly when TP was on. This module runs the SAME
forward (model/llama._forward) inside jax.shard_map so every device
executes the Pallas fused dequant-matmul and flash-attention kernels on
its LOCAL shard, with the Megatron-style collectives written out by hand
(psum after the row-parallel wo/w_down matmuls, all-gather of the
vocab-sharded logits) riding the ICI.

Reference context: the reference has NO distributed backend at all
(/root/reference/CMakeLists.txt:33-57 links no comm library; SURVEY.md
section 2c) — TP is the TPU-native addition, first-class per BASELINE.md
config 5.

Sharding plan over a 1D ("model",) mesh of p devices:
  wq/wk/wv, w_gate/w_up : rows (output features) sharded  -> P("model", None)
  wo, w_down            : columns (input features) sharded -> P(None, "model")
                          with perm_shards=p quant layout (device_format)
                          so each K-shard is a self-consistent kernel
                          layout; partial outputs psum over "model"
  output (untied)       : vocab rows sharded -> P("model", None), logits
                          all-gathered after the head matmul
  token_embd            : replicated (gather stays local)
  KV cache              : kv-heads sharded -> P(None, None, "model", None, None)
  activations / slots   : replicated (slot parallelism stays host-side)
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.4.35 exposes shard_map at the top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from ..kvcache.cache import KVCache
from ..model.llama import _decode_loop, _forward
from ..model.weights import QTensor

log = logging.getLogger("tpu_engine.dist.tp")

AXIS = "model"

# weight-name suffix -> TP role (same split as dist/sharding.py)
_COL = {"wq", "wk", "wv", "w_gate", "w_up"}
_ROW = {"wo", "w_down"}
_GGUF_ROLE = {
    "attn_q.weight": "wq", "attn_k.weight": "wk", "attn_v.weight": "wv",
    "attn_output.weight": "wo", "ffn_gate.weight": "w_gate",
    "ffn_up.weight": "w_up", "ffn_down.weight": "w_down",
    "token_embd.weight": "token_embd", "output.weight": "output",
}


def tp_mesh(n_model: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if len(devices) < n_model:
        raise ValueError(f"tensor_parallel={n_model} but only "
                         f"{len(devices)} devices attached")
    return Mesh(np.asarray(devices[:n_model]), axis_names=(AXIS,))


def _role_of(name: str) -> str:
    suffix = name.split(".", 2)[-1] if name.startswith("blk.") else name
    return _GGUF_ROLE.get(suffix, "")


class TPSharder:
    """Loader hook: load_model(path, sharder=TPSharder(mesh)).

    perm_shards(name) tells the loader to build row-parallel tensors with
    the per-K-chunk kernel permutation; __call__ places each tensor with
    its TP sharding (a perf/HBM optimization — shard_map's in_specs define
    the logical slicing either way).
    """

    def __init__(self, mesh: Mesh, shard_vocab: bool = True):
        self.mesh = mesh
        self.p = mesh.shape[AXIS]
        self.shard_vocab = shard_vocab

    def perm_shards(self, name: str) -> int:
        return self.p if _role_of(name) in _ROW else 1

    def __call__(self, name: str, qt: QTensor) -> QTensor:
        role = _role_of(name)
        n, k = qt.shape
        if role in _COL and n % self.p == 0:
            spec = P(AXIS, None)
        elif role == "output" and self.shard_vocab and n % self.p == 0:
            spec = P(AXIS, None)
        elif role in _ROW and qt.perm_shards == self.p:
            spec = P(None, AXIS)
        elif role in _ROW and qt.kind == "dense" and k % self.p == 0:
            spec = P(None, AXIS)
        else:
            spec = P(None, None)

        def put(arr):
            if arr is None:
                return None
            return jax.device_put(arr, NamedSharding(self.mesh, spec))

        return QTensor(qs=put(qt.qs), scale=put(qt.scale), bias=put(qt.bias),
                       kind=qt.kind, group=qt.group, shape=qt.shape,
                       perm=qt.perm, perm_shards=qt.perm_shards,
                       packed=qt.packed)


def validate_tp(cfg, weights: dict, p: int) -> None:
    """Fail fast when the model cannot run this TP degree."""
    if cfg.n_head % p or cfg.n_kv_head % p:
        raise ValueError(
            f"tensor_parallel={p} requires n_head ({cfg.n_head}) and "
            f"n_kv_head ({cfg.n_kv_head}) divisible by it")
    lws = weights["layers"]
    lw0 = lws if isinstance(lws, dict) else lws[0]
    if "wqkv" in lw0 or "w_gateup" in lw0:
        raise ValueError("TP expects unfused projections; load the model "
                         "with sharder=TPSharder(mesh)")
    for nm in ("wo", "w_down"):
        qt = lw0[nm]
        if qt.kind != "dense" and qt.perm and qt.perm_shards != p:
            raise ValueError(
                f"{nm} has perm_shards={qt.perm_shards}, need {p}: load the "
                "model with sharder=TPSharder(mesh) so the kernel layout is "
                "chunked for TP")
        if qt.shape[1] % p:
            raise ValueError(f"{nm} K={qt.shape[1]} not divisible by p={p}")


def _weight_specs(weights: dict, p: int) -> dict:
    """PartitionSpec pytree mirroring the weights dict (one spec per
    QTensor node — qs/scale/bias all shard the same way thanks to the
    per-chunk permutation)."""
    col, row, repl2, repl1 = P(AXIS, None), P(None, AXIS), P(None, None), P(None)
    tied = weights["output"] is weights["token_embd"]
    out_qt = weights["output"]
    specs = {
        "token_embd": repl2,
        "output_norm": repl1,
        "output": repl2 if tied or out_qt.shape[0] % p else col,
    }

    def layer_spec(name, stacked: bool):
        # stacked layout carries a leading (replicated) layer axis
        lead = (None,) if stacked else ()
        if name in _COL:
            return P(*lead, AXIS, None)
        if name in _ROW:
            return P(*lead, None, AXIS)
        if name in ("bq", "bk", "bv"):
            return P(*lead, AXIS)
        return P(*lead, None)  # norms, bqkv-less extras

    lws = weights["layers"]
    if isinstance(lws, dict):  # stacked (scanned) layers
        specs["layers"] = {name: layer_spec(name, True) for name in lws}
    else:
        specs["layers"] = [
            {name: layer_spec(name, False) for name in lw} for lw in lws
        ]
    return specs


def _cache_specs(cache: KVCache) -> KVCache:
    """Spec pytree for the KV cache: kv-heads sharded on the model axis."""
    head = P(None, None, AXIS, None, None)
    sc = P(None, None, AXIS, None)
    return KVCache(
        k=head, v=head, lengths=P(None),
        k_scale=sc if cache.k_scale is not None else None,
        v_scale=sc if cache.v_scale is not None else None,
        kind=cache.kind,
    )


def shard_cache_tp(cache: KVCache, mesh: Mesh) -> KVCache:
    head = NamedSharding(mesh, P(None, None, AXIS, None, None))
    sc = NamedSharding(mesh, P(None, None, AXIS, None))
    repl = NamedSharding(mesh, P(None))

    def put(a, s):
        return jax.device_put(a, s) if a is not None else None

    return KVCache(k=put(cache.k, head), v=put(cache.v, head),
                   lengths=put(cache.lengths, repl),
                   k_scale=put(cache.k_scale, sc),
                   v_scale=put(cache.v_scale, sc), kind=cache.kind)


def make_tp_functions(mesh: Mesh, weights: dict, cfg):
    """(forward_step, decode_loop) drop-ins running inside shard_map.

    Signatures match model.llama.forward_step / decode_loop so the serving
    engine swaps them in unchanged (serve/engine.py).
    """
    p = mesh.shape[AXIS]
    validate_tp(cfg, weights, p)
    wspecs = _weight_specs(weights, p)
    repl = P()

    def fwd(weights, cache, tokens, slot_ids, active, cfg_, ga_n=1, ga_w=0,
            n_valid=None, collect_hidden=False, embd=None, rot_cache=False):
        cspecs = _cache_specs(cache)
        ga_n = jnp.asarray(ga_n, jnp.int32)
        ga_w = jnp.asarray(ga_w, jnp.int32)

        def body(w, c, t, s, a, gn, gw, nv, e):
            return _forward(w, c, t, s, a, cfg, ga_n=gn, ga_w=gw, n_valid=nv,
                            collect_hidden=collect_hidden, embd=e,
                            tp_axis=AXIS, rot_cache=rot_cache)

        pooled_spec = repl if collect_hidden else None
        sm = _shard_map(
            body, mesh=mesh,
            in_specs=(wspecs, cspecs, repl, repl, repl, repl, repl,
                      repl if n_valid is not None else None,
                      repl if embd is not None else None),
            out_specs=(repl, cspecs, pooled_spec),
            check_vma=False,
        )
        return sm(weights, cache, tokens, slot_ids, active, ga_n, ga_w,
                  n_valid, embd)

    def dloop(weights, cache, tokens, active, cfg_, samp_params, samp_state,
              n_inner, ga_n=1, ga_w=0, rot_cache=False):
        cspecs = _cache_specs(cache)
        ga_n = jnp.asarray(ga_n, jnp.int32)
        ga_w = jnp.asarray(ga_w, jnp.int32)
        pspecs = jax.tree.map(lambda _: repl, samp_params)
        sspecs = jax.tree.map(lambda _: repl, samp_state)

        def body(w, c, t, a, sp, st, gn, gw):
            return _decode_loop(w, c, t, a, cfg, sp, st, n_inner,
                                ga_n=gn, ga_w=gw, tp_axis=AXIS,
                                rot_cache=rot_cache)

        sm = _shard_map(
            body, mesh=mesh,
            in_specs=(wspecs, cspecs, repl, repl, pspecs, sspecs, repl, repl),
            out_specs=(repl, repl, cspecs, sspecs),
            check_vma=False,
        )
        return sm(weights, cache, tokens, active, samp_params, samp_state,
                  ga_n, ga_w)

    fwd_jit = jax.jit(fwd, static_argnames=("cfg_", "collect_hidden",
                                            "rot_cache"),
                      donate_argnames=("cache",))
    dloop_jit = jax.jit(dloop, static_argnames=("cfg_", "n_inner",
                                                "rot_cache"),
                        donate_argnames=("cache", "samp_state"))
    return fwd_jit, dloop_jit
