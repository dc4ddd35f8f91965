"""Component microbenchmark for the decode step on real TPU.

Times each qmatmul shape, the attention kernel, the sampler, a full
forward_step, and a 32-step decode_loop chunk — to attribute the gap
between measured decode time and the HBM roofline.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_engine.utils.jaxinit import setup_compilation_cache

setup_compilation_cache(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".bench_cache", "xla"))

from tpu_engine.kernels import dequant_matmul, flash_attention

if jax.devices()[0].platform == "tpu":
    dequant_matmul.enable()
    flash_attention.enable()

from tpu_engine.kvcache.cache import new_cache
from tpu_engine.model.llama import decode_loop, forward_step
from tpu_engine.model.loader import load_model
from tpu_engine.model.weights import qmatmul

PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                    ".bench_cache", "tinyllama-1.1b-q4_k_m-s0.gguf")
S = 8
CTX_SLOT = 512  # per-slot cache len (bench: 4096 ctx / 8 slots)


def timeit(f, *args, n=30, **kw):
    r = f(*args, **kw)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args, **kw)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000  # ms


def main():
    lm = load_model(PATH)
    w, cfg = lm.weights, lm.cfg
    print(f"model: L={cfg.n_layer} E={cfg.n_embd} H={cfg.n_head} "
          f"KH={cfg.n_kv_head} D={cfg.head_dim} V={cfg.n_vocab}")
    l0 = w["layers"][0]

    total_mm = 0.0
    for name in ("wqkv", "wq", "wk", "wv", "wo", "w_gateup", "w_gate", "w_up",
                 "w_down"):
        if name not in l0:
            continue
        qt = l0[name]
        nn, kk = qt.shape
        x = jnp.ones((S, kk), jnp.bfloat16)
        ms = timeit(qmatmul, x, qt)
        qbytes = qt.qs.size * qt.qs.dtype.itemsize + qt.scale.size * 4 \
            + (qt.bias.size * 4 if qt.bias is not None else 0)
        bw = qbytes / (ms / 1000) / 1e9
        print(f"  qmm {name:10s} [{kk:5d}->{nn:5d}] {ms*1000:7.1f} us  "
              f"{bw:6.0f} GB/s  ({qbytes/1e6:.2f} MB)")
        total_mm += ms * cfg.n_layer

    qt = w["output"]
    nn, kk = qt.shape
    x = jnp.ones((S, kk), jnp.bfloat16)
    ms = timeit(qmatmul, x, qt)
    qbytes = qt.qs.size * qt.qs.dtype.itemsize + qt.scale.size * 4 \
        + (qt.bias.size * 4 if qt.bias is not None else 0)
    print(f"  qmm {'output':10s} [{kk:5d}->{nn:5d}] {ms*1000:7.1f} us  "
          f"{qbytes/(ms/1000)/1e9:6.0f} GB/s  ({qbytes/1e6:.2f} MB)")
    total_mm += ms
    print(f"  == all-layer matmul total {total_mm:.2f} ms/step")

    # full decode step through the engine step fn
    cache = new_cache(cfg.n_layer, S, CTX_SLOT, cfg.n_kv_head, cfg.head_dim,
                      dtype=jnp.bfloat16, kind="f16")
    toks = jnp.zeros((S, 1), jnp.int32)
    sids = jnp.arange(S, dtype=jnp.int32)
    act = jnp.ones((S,), bool)

    def step(c):
        logits, c2, _ = forward_step(w, c, toks, sids, act, cfg)
        return logits, c2

    # forward_step donates cache; time manually
    logits, cache = step(cache)
    jax.block_until_ready(logits)
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        logits, cache = step(cache)
    jax.block_until_ready(logits)
    step_ms = (time.perf_counter() - t0) / n * 1000
    print(f"  forward_step (decode, S={S})  {step_ms:.3f} ms")

    # decode_loop 32-step chunk
    from tpu_engine.sampling import SamplingParams
    from tpu_engine.sampling.device import new_state, params_from_host

    params = params_from_host([SamplingParams(temperature=0.0)] * S)
    st = new_state(S, seed=0)
    tok1 = jnp.zeros((S,), jnp.int32)
    out = decode_loop(w, cache, tok1, act, cfg, params, st, 32)
    jax.block_until_ready(out[0])
    toks_out, last, cache, st = out
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        toks_out, last, cache, st = decode_loop(
            w, cache, tok1, act, cfg, params, st, 32)
    jax.block_until_ready(toks_out)
    loop_ms = (time.perf_counter() - t0) / n * 1000
    print(f"  decode_loop 32 steps          {loop_ms:.2f} ms "
          f"({loop_ms/32:.3f} ms/step)")

    wbytes = lm.model_size_bytes
    print(f"  weights {wbytes/1e6:.1f} MB -> roofline "
          f"{wbytes/819e9*1000:.3f} ms/step @819GB/s")


if __name__ == "__main__":
    main()
