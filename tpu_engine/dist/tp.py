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

Data parallelism over an optional leading "data" axis (BASELINE config 5's
dp x tp grid): weights stay replicated across "data" while the SLOT
dimension shards — each data-shard runs the full decode loop over its own
slots + KV cache + sampler rows, so batched decode scales with dp at zero
collective cost. Prefill rows arrive with arbitrary slot targets, so they
run replicated with non-owned rows masked inactive; each shard's logits
are masked to its owned rows and one [B, V] psum over "data" reassembles
the batch (tiny next to a prefill step). dp engages whenever the mesh
carries a "data" axis whose size divides the slot count.
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
DATA = "data"


def dp_degree(mesh: Mesh, n_slots: int) -> int:
    """Effective data-parallel degree: the mesh's "data" axis when it
    divides the slot count (else slots stay replicated)."""
    d = dict(mesh.shape).get(DATA, 1)
    return d if d > 1 and n_slots % d == 0 else 1

# weight-name suffix -> TP role (same split as dist/sharding.py)
_COL = {"wq", "wk", "wv", "w_gate", "w_up"}
_ROW = {"wo", "w_down"}
_GGUF_ROLE = {
    "attn_q.weight": "wq", "attn_k.weight": "wk", "attn_v.weight": "wv",
    "attn_output.weight": "wo", "ffn_gate.weight": "w_gate",
    "ffn_up.weight": "w_up", "ffn_down.weight": "w_down",
    "token_embd.weight": "token_embd", "output.weight": "output",
}


def tp_mesh(n_model: int, devices=None, n_data: int = 1) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if len(devices) < n_model * n_data:
        raise ValueError(f"tensor_parallel={n_model} x data_parallel="
                         f"{n_data} but only {len(devices)} devices attached")
    if n_data > 1:
        grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
        return Mesh(grid, axis_names=(DATA, AXIS))
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
    if p <= 1:
        return  # dp-only serving: weights replicated, nothing to split
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


def _cache_specs(cache: KVCache, dp: int = 1) -> KVCache:
    """Spec pytree for the KV cache: kv-heads sharded on the model axis;
    slots (and per-slot lengths) on the data axis when dp > 1."""
    sl = DATA if dp > 1 else None
    head = P(None, sl, AXIS, None, None)
    sc = P(None, sl, AXIS, None)
    return KVCache(
        k=head, v=head, lengths=P(sl),
        k_scale=sc if cache.k_scale is not None else None,
        v_scale=sc if cache.v_scale is not None else None,
        kind=cache.kind,
        layout=cache.layout,
    )


def canon_spec(mesh: Mesh, s: P) -> P:
    """GSPMD-canonical form of a PartitionSpec: size-1 mesh axes drop to
    None and trailing Nones strip. Committed placements must use this form
    so a jitted step's OUTPUT cache (which XLA reports canonicalized) has
    the same sharding as the initial placement — otherwise the second call
    silently recompiles (ADVICE r3, serve/ops.py warm_compile)."""
    shape = dict(mesh.shape)
    parts = [p if (p is not None and shape.get(p, 1) > 1) else None
             for p in s]
    while parts and parts[-1] is None:
        parts.pop()
    return P(*parts)


def shard_cache_tp(cache: KVCache, mesh: Mesh) -> KVCache:
    dp = dp_degree(mesh, cache.k.shape[1])
    specs = _cache_specs(cache, dp)

    def put(a, s):
        if a is None:
            return None
        return jax.device_put(a, NamedSharding(mesh, canon_spec(mesh, s)))

    return KVCache(k=put(cache.k, specs.k), v=put(cache.v, specs.v),
                   lengths=put(cache.lengths, specs.lengths),
                   k_scale=put(cache.k_scale, specs.k_scale),
                   v_scale=put(cache.v_scale, specs.v_scale),
                   kind=cache.kind, layout=cache.layout)


def place_aux_weights(weights: dict, mesh: Mesh) -> dict:
    """Place the NON-QTensor weight leaves (norm vectors, attention biases)
    on the mesh with their shard_map specs. TPSharder only sees QTensors
    (it is a loader hook on quantized tensors), so without this the aux
    arrays stay committed to device 0 — live dispatch tolerates the mix,
    but AOT warm-compile (serve/ops.py warm_compile) bakes per-arg
    shardings and refuses args committed to different device sets."""
    import dataclasses

    p = dict(mesh.shape).get(AXIS, 1)
    specs = _weight_specs(weights, p)
    repl = NamedSharding(mesh, P())

    def put(x, s):
        if isinstance(x, QTensor):
            if len(x.qs.sharding.device_set) > 1:
                return x  # already mesh-placed by TPSharder
            # dp-only loads skip TPSharder: replicate onto the mesh
            def pq(a):
                return None if a is None else jax.device_put(a, repl)

            return dataclasses.replace(
                x, qs=pq(x.qs), scale=pq(x.scale), bias=pq(x.bias))
        if getattr(x, "sharding", None) == NamedSharding(mesh, s):
            # already placed (multi-host: device_put to a multi-process
            # sharding is a COLLECTIVE — a second placement pass on the
            # leader only would desync the followers' op sequence)
            return x
        return jax.device_put(x, NamedSharding(mesh, s))

    out = {k: put(v, specs.get(k, P())) for k, v in weights.items()
           if k not in ("layers", "output")}
    out["output"] = (out["token_embd"]
                     if weights["output"] is weights["token_embd"]
                     else put(weights["output"], specs["output"]))
    lws, lsp = weights["layers"], specs["layers"]
    if isinstance(lws, dict):
        out["layers"] = {k: put(v, lsp[k]) for k, v in lws.items()}
    else:
        out["layers"] = [{k: put(v, sp[k]) for k, v in lw.items()}
                         for lw, sp in zip(lws, lsp)]
    return out


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
        dp = dp_degree(mesh, cache.lengths.shape[0])
        cspecs = _cache_specs(cache, dp)
        ga_n = jnp.asarray(ga_n, jnp.int32)
        ga_w = jnp.asarray(ga_w, jnp.int32)

        def body(w, c, t, s, a, gn, gw, nv, e):
            if dp > 1:
                # prefill rows target arbitrary slots: every data-shard
                # runs the batch, but only the shard owning a row's slot
                # lets it write (active mask) or contribute logits. Slot s
                # lives on shard s // S_local (static slot partition).
                s_local_n = c.lengths.shape[0]  # local slots on this shard
                base = jax.lax.axis_index(DATA).astype(jnp.int32) * s_local_n
                owned = (s >= base) & (s < base + s_local_n)
                # non-owned rows get an OUT-OF-BOUNDS local slot: their
                # lengths scatter drops (JAX OOB-scatter semantics) instead
                # of colliding with an owned row's update, and their cache
                # reads clamp to garbage that the masks discard
                s = jnp.where(owned, s - base, s_local_n)
                a = a & owned
            logits, c2, pooled = _forward(
                w, c, t, s, a, cfg, ga_n=gn, ga_w=gw, n_valid=nv,
                collect_hidden=collect_hidden, embd=e,
                tp_axis=AXIS, rot_cache=rot_cache)
            if dp > 1:
                # reassemble the batch: each row is owned by exactly one
                # data-shard; mask the rest to 0 and sum over "data"
                logits = jax.lax.psum(
                    jnp.where(owned[:, None], logits, 0.0), DATA)
                if pooled is not None:
                    m = owned.reshape((-1,) + (1,) * (pooled.ndim - 1))
                    pooled = jax.lax.psum(jnp.where(m, pooled, 0.0), DATA)
            return logits, c2, pooled

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
              n_inner, ga_n=1, ga_w=0, rot_cache=False, gbank=None):
        dp = dp_degree(mesh, cache.lengths.shape[0])
        cspecs = _cache_specs(cache, dp)
        ga_n = jnp.asarray(ga_n, jnp.int32)
        ga_w = jnp.asarray(ga_w, jnp.int32)
        if dp > 1:
            # batched decode is embarrassingly data-parallel: slots, their
            # sampler rows and their outputs all shard the leading S axis
            def bshard(a):
                return P(DATA, *([None] * (a.ndim - 1)))

            tok_spec = act_spec = P(DATA)
            pspecs = jax.tree.map(bshard, samp_params)
            sspecs = jax.tree.map(bshard, samp_state)
            toks_out, last_out = P(DATA, None), P(DATA)
        else:
            tok_spec = act_spec = repl
            pspecs = jax.tree.map(lambda _: repl, samp_params)
            sspecs = jax.tree.map(lambda _: repl, samp_state)
            toks_out = last_out = repl
        # grammar tables are shared lookup state: replicated on every shard
        gspecs = (jax.tree.map(lambda _: repl, gbank)
                  if gbank is not None else None)

        def body(w, c, t, a, sp, st, gn, gw, gb):
            return _decode_loop(w, c, t, a, cfg, sp, st, n_inner,
                                ga_n=gn, ga_w=gw, tp_axis=AXIS,
                                rot_cache=rot_cache, gbank=gb)

        sm = _shard_map(
            body, mesh=mesh,
            in_specs=(wspecs, cspecs, tok_spec, act_spec, pspecs, sspecs,
                      repl, repl, gspecs),
            out_specs=(toks_out, last_out, cspecs, sspecs),
            check_vma=False,
        )
        return sm(weights, cache, tokens, active, samp_params, samp_state,
                  ga_n, ga_w, gbank)

    fwd_jit = jax.jit(fwd, static_argnames=("cfg_", "collect_hidden",
                                            "rot_cache"),
                      donate_argnames=("cache",))
    dloop_jit = jax.jit(dloop, static_argnames=("cfg_", "n_inner",
                                                "rot_cache"),
                        donate_argnames=("cache", "samp_state"))
    return fwd_jit, dloop_jit
