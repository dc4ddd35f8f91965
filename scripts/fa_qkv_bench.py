"""Microbench: flash decode attention with QUANTIZED KV on real TPU.

Measures the per-layer step cost of the q8_0/q4_0 stored-form decode
kernel vs f16, at 7B shapes.  Validates the lane-dim scale layout
(ks/vs stored [L,S,KH,T], fed to Pallas as [L,S,KH,1,T] so the T axis
rides the 128-lane dim and scale-block DMAs are contiguous).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from tpu_engine.utils.jaxinit import setup_compilation_cache

setup_compilation_cache(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".bench_cache", "xla"))

from tpu_engine.kernels.flash_attention import _decode_call
from tpu_engine.model.config import ModelConfig

B = 8
KH, G, D = 32, 1, 128   # llama2-7B MHA
L = 8

cfg = ModelConfig(
    arch="llama", n_layer=L, n_head=KH * G, n_kv_head=KH, n_embd=KH * G * D,
    head_dim=D, n_ff=11008, n_vocab=32000, n_ctx_train=4096, rope_dim=D,
    rms_eps=1e-5, rope_theta=10000.0, rope_type="neox",
)
ga = jnp.asarray([1, 0], jnp.int32)


def bench(kind, T, fill, reps=30):
    key = jax.random.PRNGKey(0)
    if kind == "f16":
        Dk = D
        cell = jnp.bfloat16
    elif kind == "q8_0":
        Dk = D
        cell = jnp.int8
    else:  # q4_0: packed nibbles, D/2 bytes
        Dk = D // 2
        cell = jnp.int8
    if cell == jnp.int8:
        k_all = jax.random.randint(key, (L, B, KH, T, Dk), -127, 127, jnp.int8)
        v_all = jax.random.randint(key, (L, B, KH, T, Dk), -127, 127, jnp.int8)
        ks = jnp.abs(jax.random.normal(key, (L, B, KH, T), jnp.float32)) * 0.01
        vs = ks
    else:
        k_all = jax.random.normal(key, (L, B, KH, T, Dk), jnp.bfloat16)
        v_all = jax.random.normal(key, (L, B, KH, T, Dk), jnp.bfloat16)
        ks = vs = None
    q5 = jax.random.normal(key, (B, 1, KH, G, D), jnp.bfloat16)
    k_new = jax.random.normal(key, (B, KH, 1, D), jnp.bfloat16)
    v_new = jax.random.normal(key, (B, KH, 1, D), jnp.bfloat16)
    slots = jnp.arange(B, dtype=jnp.int32)
    starts = jnp.full((B,), fill, jnp.int32)
    win = jnp.asarray([0], jnp.int32)

    @jax.jit
    def step(q5, k_all, v_all, ks, vs):
        out = q5
        for li in range(L):
            out = _decode_call(
                out, k_new, v_new, k_all, v_all, ks, vs,
                li, slots, starts, win, ga,
                cfg=cfg, kind=kind, interpret=False, rotated=True,
            )
        return out

    stepf = lambda q: step(q, k_all, v_all, ks, vs)
    r = stepf(q5)
    r.block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        r = stepf(r)
    r.block_until_ready()
    dt = (time.time() - t0) / reps
    per_layer = dt / L * 1e6
    blk = 128
    nblk = max((fill + blk - 1) // blk, 1)
    touched = 2 * B * KH * nblk * blk * Dk  # cell bytes
    if ks is not None:
        touched += 2 * B * KH * nblk * blk * 4  # f32 scales
    print(f"{kind:5s} T={T:5d} fill={fill:5d}: {per_layer:7.1f} us/layer  "
          f"(touched {touched/1e6:.2f} MB -> floor {touched/819e3:.1f} us)")
    return per_layer


if __name__ == "__main__":
    kinds = sys.argv[1:] or ["f16", "q8_0", "q4_0"]
    for kind in kinds:
        for T, fill in [(512, 128), (4096, 128), (4096, 1024), (4096, 4096)]:
            bench(kind, T, fill)
