"""Microbench: flash decode attention at 7B shapes on real TPU.

Hypothesis test for the 105us/layer vs 39us DMA-floor gap: is the cost
dominated by the n_kb = T/Tblk grid iterations that are CLAMPED (no new
DMA, no compute) at low fill?  Sweep allocated T at fixed fill.
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

from tpu_engine.kernels.flash_attention import _decode_call
from tpu_engine.model.config import ModelConfig

B = 8
KH, G, D = 32, 1, 128   # llama2-7B MHA
L = 8  # enough layers to amortize; full 7B cache would not fit at T=4096

cfg = ModelConfig(
    arch="llama", n_layer=L, n_head=KH * G, n_kv_head=KH, n_embd=KH * G * D,
    head_dim=D, n_ff=11008, n_vocab=32000, n_ctx_train=4096, rope_dim=D,
    rms_eps=1e-5, rope_theta=10000.0, rope_type="neox",
)

ga = jnp.asarray([1, 0], jnp.int32)


def bench(T, fill, reps=30):
    key = jax.random.PRNGKey(0)
    k_all = jax.random.normal(key, (L, B, KH, T, D), jnp.bfloat16)
    v_all = jax.random.normal(key, (L, B, KH, T, D), jnp.bfloat16)
    q5 = jax.random.normal(key, (B, 1, KH, G, D), jnp.bfloat16)
    k_new = jax.random.normal(key, (B, KH, 1, D), jnp.bfloat16)
    v_new = jax.random.normal(key, (B, KH, 1, D), jnp.bfloat16)
    slots = jnp.arange(B, dtype=jnp.int32)
    starts = jnp.full((B,), fill, jnp.int32)
    win = jnp.asarray([0], jnp.int32)

    @jax.jit
    def step(q5, k_all, v_all):
        # chain over layers like the real decode step (li traced per layer)
        out = q5
        for li in range(L):
            out = _decode_call(
                out, k_new, v_new, k_all, v_all, None, None,
                li, slots, starts, win, ga,
                cfg=cfg, kind="f16", interpret=False, rotated=True,
            )
        return out

    step = lambda q, _f=step: _f(q, k_all, v_all)
    r = step(q5)
    r.block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        r = step(r)
    r.block_until_ready()
    dt = (time.time() - t0) / reps
    per_layer = dt / L * 1e6
    bytes_layer = 2 * B * KH * min(max(fill, 1), T) * D * 2  # K+V read, bf16
    # DMA floor counts only blocks actually touched (Tblk=128 granules)
    blk = 128
    touched = 2 * B * KH * (max((fill + blk - 1) // blk, 1) * blk) * D * 2
    print(f"T={T:5d} fill={fill:5d}: {per_layer:7.1f} us/layer  "
          f"(touched {touched/1e6:.2f} MB -> floor {touched/819e3:.1f} us)")
    return per_layer


if __name__ == "__main__":
    for T, fill in [(4096, 128), (512, 128), (256, 128), (4096, 512),
                    (4096, 1024), (1024, 1024), (4096, 4096)]:
        bench(T, fill)
