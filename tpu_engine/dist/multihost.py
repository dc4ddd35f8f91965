"""Multi-host serving runtime: one logical scheduler, N processes.

The reference has NO distributed backend (single-host shared library;
/root/reference/CMakeLists.txt:33-57 links no comm library — SURVEY.md
section 2c). This is the TPU-native addition that BASELINE.md config 5
(70B sharded across a pod slice) requires.

Design (SURVEY.md section 7 "Multi-host continuous batching"): every host
must execute the SAME jitted computation each step so the GSPMD/shard_map
collectives line up. Host 0 runs the full serving engine (slots, queues,
stop-words, scheduling); its per-step decisions — already funneled through
the engine's device-op layer (serve/ops.py) — are published as compact
descriptors over a broadcast channel, and every follower process replays
the identical op sequence against its own weight/KV shards:

    host 0:  InferenceEngine -> BroadcastOps.step(...)  ──┐
                                                          ├── broadcast
    host k:  serve_follower(): recv -> EngineOps.step(...)┘   (DCN/gloo)

The channel is jax.experimental.multihost_utils.broadcast_one_to_all (a
device collective), so ops are naturally ordered and every process stays
in lockstep. Result pulls (tokens, logits rows) are process-local on
host 0 — outputs are fully replicated, so no collective is needed to read
them.

Bring-up/testing: run N processes on one machine with the CPU backend
(XLA_FLAGS=--xla_force_host_platform_device_count=K per process) — see
tests/test_multihost.py and scripts/multihost_demo.py.
"""

from __future__ import annotations

import logging
import pickle
import struct

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger("tpu_engine.dist.multihost")


def initialize(coordinator_address: str, num_processes: int,
               process_id: int, platform: str | None = None,
               local_device_count: int | None = None) -> None:
    """jax.distributed bring-up. Call BEFORE any other jax use.

    platform="cpu" + local_device_count=K gives a K-virtual-device CPU
    process (simulation); on real TPU pods both are None (the runtime
    discovers local chips)."""
    import os

    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{local_device_count}").strip()
    if platform is not None:
        jax.config.update("jax_platforms", platform)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    log.info("multihost up: process %d/%d, %d global devices",
             jax.process_index(), num_processes, len(jax.devices()))


class OpChannel:
    """Ordered broadcast of picklable op descriptors from process 0.

    Two collectives per op (8-byte length, then the exact-size payload) so
    arbitrary-size descriptors work without a fixed buffer cap."""

    def publish(self, obj) -> None:
        from jax.experimental import multihost_utils

        payload = pickle.dumps(obj)
        multihost_utils.broadcast_one_to_all(
            np.frombuffer(struct.pack("<q", len(payload)), np.uint8).copy())
        multihost_utils.broadcast_one_to_all(
            np.frombuffer(payload, np.uint8).copy())

    def recv(self):
        from jax.experimental import multihost_utils

        head = multihost_utils.broadcast_one_to_all(np.zeros(8, np.uint8))
        (n,) = struct.unpack("<q", bytes(np.asarray(head)))
        buf = multihost_utils.broadcast_one_to_all(np.zeros(n, np.uint8))
        return pickle.loads(bytes(np.asarray(buf)))


# ops that mutate shared device state and therefore must replay everywhere;
# pulls are process-local and deliberately absent
_REPLAYED = ("step", "dloop", "sample_first", "trim", "seq_cp",
             "shift_compact", "clear_all", "set_grammar_bank")


def _state_checksum(ops):
    """Tiny replicated summary of the shared device state; every process
    computes it on its own shards (a cross-host reduction for sharded
    cache axes), so equal values mean the replay stayed in lockstep."""
    import jax.numpy as jnp

    c = ops.cache
    s = jnp.sum(c.k.astype(jnp.float32)) + jnp.sum(c.v.astype(jnp.float32))
    return np.asarray([float(s), float(jnp.sum(c.lengths))], np.float64)


def verify_state(ops, channel: "OpChannel") -> bool:
    """Leader-side: ask every process for a state checksum and compare."""
    from jax.experimental import multihost_utils

    channel.publish(("checksum", (), {}))
    local = _state_checksum(ops)
    allv = np.asarray(multihost_utils.process_allgather(local))
    ok = bool(np.allclose(allv, allv[0]))
    if not ok:
        log.error("multihost state diverged: %r", allv)
    return ok


def _broadcast_ops_factory(channel: OpChannel):
    """ops_factory for InferenceEngine on host 0: publish-then-execute."""
    from ..serve.ops import EngineOps

    class BroadcastOps(EngineOps):
        def _publish(self, op, args, kwargs):
            channel.publish((op, args, kwargs))

        def step(self, tokens, slot_ids, active, n_valid=None,
                 collect_hidden=False, embd=None):
            self._publish("step",
                          (np.asarray(tokens), np.asarray(slot_ids),
                           np.asarray(active)),
                          {"n_valid": None if n_valid is None
                           else np.asarray(n_valid),
                           "collect_hidden": collect_hidden,
                           "embd": None if embd is None else np.asarray(embd)})
            return super().step(tokens, slot_ids, active, n_valid=n_valid,
                                collect_hidden=collect_hidden, embd=embd)

        def dloop(self, n_inner, active, reset=None):
            self._publish("dloop", (n_inner, np.asarray(active)),
                          {"reset": reset})
            return super().dloop(n_inner, active, reset=reset)

        def sample_first(self, logits, by_slot, prevs, seed, gstate=None):
            # logits are process-local device state produced by the
            # broadcast `step`; every process re-derives them identically,
            # so only the host-side sampling inputs travel
            self._publish("sample_first", (by_slot, prevs, int(seed)),
                          {"gstate": None if gstate is None
                           else np.asarray(gstate)})
            return super().sample_first(logits, by_slot, prevs, seed,
                                        gstate=gstate)

        def set_grammar_bank(self, mask, trans, row_off=None):
            # row-range patch: only the written rows travel the channel
            self._publish("set_grammar_bank",
                          (np.asarray(mask), np.asarray(trans)),
                          {"row_off": row_off})
            super().set_grammar_bank(mask, trans, row_off=row_off)

        def trim(self, slot, n):
            self._publish("trim", (int(slot), int(n)), {})
            super().trim(slot, n)

        def seq_cp(self, src, dst):
            self._publish("seq_cp", (int(src), int(dst)), {})
            super().seq_cp(src, dst)

        def shift_compact(self, slot, n_keep, n_discard):
            self._publish("shift_compact",
                          (int(slot), int(n_keep), int(n_discard)), {})
            super().shift_compact(slot, n_keep, n_discard)

        def clear_all(self):
            self._publish("clear_all", (), {})
            super().clear_all()

        def shutdown(self):
            self._publish("shutdown", (), {})

    return BroadcastOps


def _build_mesh(tp_size: int):
    from . import tp as _tp

    return _tp.tp_mesh(tp_size)


def _build_state(config: dict, with_cache: bool = True):
    """Deterministic model/step-fn construction shared by every process.

    CRITICAL: device_put to a multi-process sharding is itself a collective
    (jax asserts cross-process consistency), so the leader and followers
    must issue the SAME device-placement sequence in the SAME order. The
    leader therefore builds the cache inside InferenceEngine (with_cache=
    False here); followers build it here — both end up with exactly one
    weight-placement sequence followed by one cache-placement sequence."""
    from ..kvcache.cache import new_cache
    from ..model.llama import decode_loop, forward_step
    from ..model.loader import load_model
    from . import tp as _tp

    tp_size = config["tensor_parallel"]
    mesh = _build_mesh(tp_size)
    lm = load_model(config["model_path"], sharder=_tp.TPSharder(mesh))
    if tp_size > 1:
        # aux-weight placement is itself a device_put sequence (collective
        # under multi-process shardings): run it HERE on every process, in
        # the same order; the engine's own call then finds everything
        # placed and issues nothing
        lm.weights = _tp.place_aux_weights(lm.weights, mesh)
        step_fn, dloop_fn = _tp.make_tp_functions(mesh, lm.weights, lm.cfg)
    else:
        step_fn, dloop_fn = forward_step, decode_loop
    if not with_cache:
        return lm, mesh, None, step_fn, dloop_fn
    from ..kvcache.cache import default_layout

    cache = new_cache(
        lm.cfg.n_layer, config["n_parallel"], config["slot_ctx"],
        lm.cfg.n_kv_head, lm.cfg.head_dim,
        dtype=np.dtype(config["kv_dtype"]),
        kind=config["cache_type"],
        # every process must pick the SAME layout (deterministic policy)
        layout=default_layout(config["cache_type"], lm.cfg.head_dim),
    )
    if tp_size > 1:
        cache = _tp.shard_cache_tp(cache, mesh)
    return lm, mesh, cache, step_fn, dloop_fn


def start_leader(model_path: str, tensor_parallel: int, n_ctx: int = 2048,
                 n_parallel: int = 1, cache_type: str | None = None,
                 channel: OpChannel | None = None, **engine_kw):
    """Host 0: publish the build config, then run the real engine with
    broadcasting ops. Returns the InferenceEngine."""
    assert jax.process_index() == 0, "leader must be process 0"
    from ..serve.engine import InferenceEngine

    channel = channel or OpChannel()
    config = {
        "model_path": model_path,
        "tensor_parallel": tensor_parallel,
        "n_parallel": n_parallel,
        "slot_ctx": max(n_ctx // n_parallel, 8),
        "kv_dtype": "float32",
        "cache_type": cache_type,
        "grp_attn_n": engine_kw.get("grp_attn_n", 1),
        "grp_attn_w": engine_kw.get("grp_attn_w", 512),
        "seed": int(np.random.SeedSequence().entropy % (1 << 31)),
    }
    channel.publish(("init", config))
    lm, mesh, _, _, _ = _build_state(config, with_cache=False)
    eng = InferenceEngine(
        lm, n_ctx=n_ctx, n_parallel=n_parallel, cache_type=cache_type,
        mesh=mesh if tensor_parallel > 1 else None,
        ops_factory=_broadcast_ops_factory(channel), **engine_kw)
    # all processes must use the same sampler seed for identical streams
    eng._dev_seed = config["seed"]
    return eng


def serve_follower(channel: OpChannel | None = None) -> None:
    """Follower process: build identical state, replay ops until shutdown."""
    assert jax.process_index() != 0, "process 0 is the leader"
    from ..serve.ops import EngineOps

    channel = channel or OpChannel()
    op, config = channel.recv()
    if op != "init":
        raise RuntimeError(f"expected init, got {op}")
    lm, mesh, cache, step_fn, dloop_fn = _build_state(config)
    ops = EngineOps(lm, lm.cfg, cache, step_fn, dloop_fn,
                    config["grp_attn_n"], config["grp_attn_w"], mesh)
    log.info("follower %d ready", jax.process_index())
    n_ops = 0
    while True:
        name, args, kwargs = channel.recv()
        if name == "shutdown":
            break
        if name == "checksum":
            from jax.experimental import multihost_utils

            multihost_utils.process_allgather(_state_checksum(ops))
            continue
        if name == "dloop" and kwargs.get("reset") is not None:
            kwargs["reset"] = dict(kwargs["reset"], seed=config["seed"])
        if name == "sample_first":
            # re-derive the logits locally: the preceding replayed `step`
            # left them as the follower's last step output
            by_slot, prevs, _ = args
            ops.sample_first(ops._last_step_logits, by_slot, prevs,
                             config["seed"], gstate=kwargs.get("gstate"))
            n_ops += 1
            continue
        if name not in _REPLAYED:
            raise RuntimeError(f"unexpected op {name}")
        getattr(ops, name)(*args, **kwargs)
        n_ops += 1
    log.info("follower %d done after %d ops", jax.process_index(), n_ops)
