"""Interleaved packed-vs-flat scale A/B in ONE process (real TPU).

Loads the 7B twice (flat layout, then TPU_ENGINE_PACKED_SCALES=1), keeps
both on device, and times alternating decode chunks — removes the 10%-ish
run-to-run tunnel drift that contaminates two-process A/Bs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from tpu_engine.utils.jaxinit import setup_compilation_cache

setup_compilation_cache(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".bench_cache", "xla"))

import jax
import jax.numpy as jnp

from tpu_engine.kernels import dequant_matmul, flash_attention

if jax.devices()[0].platform == "tpu":
    dequant_matmul.enable()
    flash_attention.enable()

PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                    ".bench_cache", "llama2-7b-q4_k_m-s0.gguf")
S, CTX_SLOT, CHUNK = 8, 512, 32


def main():
    from tpu_engine.kvcache.cache import new_cache
    from tpu_engine.model.llama import decode_loop
    from tpu_engine.model.loader import load_model
    from tpu_engine.sampling import SamplingParams
    from tpu_engine.sampling.device import new_state, params_from_host

    # arms: "name:ENV=V,ENV=V;name2:..." (default = packed-scales A/B)
    spec = os.environ.get(
        "AB2_ARMS", "flat:TPU_ENGINE_PACKED_SCALES=0;"
                    "packed:TPU_ENGINE_PACKED_SCALES=1")
    arms = {}
    for part in spec.split(";"):
        name, _, envs = part.partition(":")
        for kv in filter(None, envs.split(",")):
            k, _, v = kv.partition("=")
            os.environ[k] = v
        t0 = time.time()
        lm = load_model(PATH)
        print(f"[{name} load {time.time()-t0:.1f}s]", file=sys.stderr)
        cfg = lm.cfg
        cache = new_cache(cfg.n_layer, S, CTX_SLOT, cfg.n_kv_head,
                          cfg.head_dim, dtype=jnp.bfloat16, kind="f16")
        arms[name] = [lm.weights, cfg, cache,
                      params_from_host([SamplingParams(temperature=0.0)] * S),
                      new_state(S, seed=0), jnp.zeros((S,), jnp.int32)]

    act = jnp.ones((S,), bool)

    def chunk(arm):
        w, cfg, cache, params, st, tok = arm
        toks, last, cache, st = decode_loop(
            w, cache, tok, act, cfg, params, st, CHUNK, rot_cache=True)
        arm[2], arm[4], arm[5] = cache, st, last

    for name, arm in arms.items():
        for _ in range(4):
            chunk(arm)
        np.asarray(arm[5])

    times = {name: [] for name in arms}
    for rep in range(8):
        for name, arm in arms.items():
            t0 = time.time()
            chunk(arm)
            chunk(arm)
            np.asarray(arm[5])
            times[name].append((time.time() - t0) / 2)
    for name, ts in times.items():
        best = min(ts) / CHUNK * 1e3
        med = sorted(ts)[len(ts) // 2] / CHUNK * 1e3
        print(f"{name:6s}: best {best:.2f} ms/step, median {med:.2f} "
              f"({S*CHUNK/min(ts):.0f} tok/s best)")


if __name__ == "__main__":
    main()
