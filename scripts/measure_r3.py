"""Round-3 on-chip measurement batch (AOT-compiled to dodge the terminal's
slow live-compile path; see serve/ops.py warm_compile).

Measures, on the cached synthetic 7B Q4_K_M:
  1. decode_loop chunk step time (the serving hot loop)
  2. per-tensor fused dequant-matmul effective GB/s

Env knobs under test: TPU_ENGINE_PAD_NG, TPU_ENGINE_BATCH_APPEND.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from tpu_engine.utils.jaxinit import setup_compilation_cache

setup_compilation_cache(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".bench_cache", "xla"))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_engine.kernels import dequant_matmul as dm
from tpu_engine.kernels import flash_attention as fa

dm.enable()
fa.enable()

from tpu_engine.kvcache.cache import new_cache
from tpu_engine.model.llama import decode_loop
from tpu_engine.model.loader import load_model
from tpu_engine.sampling import SamplingParams
from tpu_engine.sampling.device import new_state, params_from_host
from tpu_engine.kernels.dequant_matmul import pallas_qmatmul

PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                    ".bench_cache", "llama2-7b-q4_k_m-s0.gguf")
S, T, N_INNER = 8, 512, 64


def sds(t):
    return jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), t)


def main():
    print(f"[pad_ng={os.environ.get('TPU_ENGINE_PAD_NG', '1')} "
          f"batch_append={os.environ.get('TPU_ENGINE_BATCH_APPEND', '0')}]",
          flush=True)
    t0 = time.time()
    lm = load_model(PATH)
    print(f"[load {time.time()-t0:.0f}s]", flush=True)

    # ---- 1. decode_loop chunk -------------------------------------------
    cache = new_cache(lm.cfg.n_layer, S, T, lm.cfg.n_kv_head, lm.cfg.head_dim)
    params = params_from_host([SamplingParams()] * S)
    state = new_state(S, seed=0)
    toks = jnp.zeros((S,), jnp.int32)
    act = jnp.ones((S,), bool)
    t0 = time.time()
    comp = decode_loop.lower(
        sds(lm.weights), sds(cache), sds(toks), sds(act), lm.cfg,
        sds(params), sds(state), N_INNER, ga_n=1, ga_w=0,
        rot_cache=True).compile()
    print(f"[dloop compile {time.time()-t0:.0f}s]", flush=True)
    t0 = time.time()
    out = comp(lm.weights, cache, toks, act, params, state, ga_n=1, ga_w=0)
    _ = np.asarray(out[0])
    print(f"[first exec {time.time()-t0:.0f}s]", flush=True)
    cache, state = out[2], out[3]
    best = 1e9
    for _i in range(3):
        t0 = time.time()
        out = comp(lm.weights, cache, toks, act, params, state,
                   ga_n=1, ga_w=0)
        _ = np.asarray(out[0])
        best = min(best, time.time() - t0)
        cache, state = out[2], out[3]
    per_step = best / N_INNER
    print(f"DLOOP: {per_step*1000:.2f} ms/step -> "
          f"{S/per_step:.0f} tok/s aggregate", flush=True)

    # ---- 2. per-tensor qmm ----------------------------------------------
    lw = lm.weights["layers"]

    def bench_qmm(name, reps=3):
        qt = lw[name]
        L = qt.qs.shape[0]
        k_log = qt.shape[1]
        x = jnp.ones((8, k_log), jnp.float32) * 0.01

        def run(x, qt):
            def body(c, li):
                y = pallas_qmatmul(x, qt, li)
                return c + jnp.sum(y[:, :8]), None
            s, _ = jax.lax.scan(body, 0.0, jnp.arange(L))
            return s

        comp = jax.jit(run).lower(sds(x), sds(qt)).compile()
        _ = np.asarray(comp(x, qt))
        best = 1e9
        for _i in range(reps):
            t0 = time.time()
            _ = np.asarray(comp(x, qt))
            best = min(best, time.time() - t0)
        per_call = best / L
        nbytes = (qt.qs.size * qt.qs.dtype.itemsize
                  + (qt.scale.size * 4 if qt.scale is not None else 0)
                  + (qt.bias.size * 4 if qt.bias is not None else 0)) / L
        print(f"QMM {name}: {per_call*1e6:.0f} us/layer, "
              f"{nbytes/1e6:.1f} MB -> {nbytes/per_call/1e9:.0f} GB/s "
              f"(k_pad={qt.k_pad})", flush=True)

    for name in ("wqkv", "wo", "w_gateup", "w_down"):
        bench_qmm(name)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
