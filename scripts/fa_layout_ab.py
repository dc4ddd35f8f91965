"""A/B microbench on real TPU: flash-decode (and prefill) attention over
the "td" [KH, T, D] vs transposed "dt" [KH, D, T] KV cache layouts
(kvcache/cache.py KVCache.layout), across the shapes that matter:
TinyLlama-class D=64 (the PARITY.md round-4 half-tile pathology) and
7B-class D=128, for f16 / q8_0 / q4_0 KV kinds, at long fill."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from tpu_engine.utils.jaxinit import setup_compilation_cache

setup_compilation_cache(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".bench_cache", "xla"))

from tpu_engine.kernels.flash_attention import _decode_call, _decode_call_t
from tpu_engine.kvcache.cache import quantize_kv_rows
from tpu_engine.model.config import ModelConfig

ga = jnp.asarray([1, 0], jnp.int32)


def mk(B, KH, G, D, L, T, kind, layout):
    key = jax.random.PRNGKey(0)
    k = jax.random.normal(key, (L, B, KH, T, D), jnp.float32)
    v = jax.random.normal(key, (L, B, KH, T, D), jnp.float32)
    ks = vs = None
    if kind in ("q8_0", "q4_0"):
        kc, ks = quantize_kv_rows(k, kind)
        vc, vs = quantize_kv_rows(v, kind)
    else:
        kc, vc = k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    if layout == "dt":
        kc, vc = jnp.swapaxes(kc, -1, -2), jnp.swapaxes(vc, -1, -2)
    q5 = jax.random.normal(key, (B, 1, KH, G, D), jnp.bfloat16)
    kn = jax.random.normal(key, (B, KH, 1, D), jnp.bfloat16)
    vn = jax.random.normal(key, (B, KH, 1, D), jnp.bfloat16)
    return q5, kn, vn, jax.device_put(kc), jax.device_put(vc), ks, vs


def bench(name, B, KH, G, D, L, T, fill, kind, reps=30):
    slots = jnp.arange(B, dtype=jnp.int32)
    starts = jnp.full((B,), fill, jnp.int32)
    win = jnp.asarray([0], jnp.int32)
    out = {}
    for layout in ("td", "dt"):
        q5, kn, vn, kc, vc, ks, vs = mk(B, KH, G, D, L, T, kind, layout)
        cfg = ModelConfig(
            arch="llama", n_layer=L, n_head=KH * G, n_kv_head=KH,
            n_embd=KH * G * D, head_dim=D, n_ff=4 * D * KH, n_vocab=32000,
            n_ctx_train=4096, rope_dim=D, rms_eps=1e-5, rope_theta=10000.0,
            rope_type="neox",
        )
        fn = _decode_call_t if layout == "dt" else _decode_call

        @jax.jit
        def step(q5, kc, vc, ks, vs):
            o = q5
            for li in range(L):
                o = fn(o, kn, vn, kc, vc, ks, vs, li, slots, starts, win, ga,
                       cfg=cfg, kind=kind, interpret=False, rotated=True)
            return o

        r = step(q5, kc, vc, ks, vs)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(reps):
            r = step(q5, kc, vc, ks, vs)
        jax.block_until_ready(r)
        us_layer = (time.time() - t0) / reps / L * 1e6
        out[layout] = us_layer
        print(f"{name:34s} {layout}: {us_layer:8.1f} us/layer", flush=True)
    print(f"{name:34s} dt/td speedup: {out['td']/out['dt']:.2f}x", flush=True)


if __name__ == "__main__":
    # TinyLlama-class: KH=4, G=8, D=64 (cfg3's shape), fill 2048
    for kind in ("f16", "q8_0", "q4_0"):
        bench(f"tiny D=64 {kind} T=2560 fill=2048", B=8, KH=4, G=8, D=64,
              L=8, T=2560, fill=2048, kind=kind)
    # 7B-class: KH=32, G=1, D=128, modest fill (the headline decode regime)
    for kind in ("f16", "q8_0"):
        bench(f"7B D=128 {kind} T=4096 fill=256", B=8, KH=32, G=1, D=128,
              L=4, T=4096, fill=256, kind=kind)
        bench(f"7B D=128 {kind} T=4096 fill=4000", B=8, KH=32, G=1, D=128,
              L=4, T=4096, fill=4000, kind=kind)


def bench_dma(name, B, KH, G, D, L, T, fill, kind, reps=30):
    from tpu_engine.kernels.flash_attention import _decode_call_dma

    slots = jnp.arange(B, dtype=jnp.int32)
    starts = jnp.full((B,), fill, jnp.int32)
    win = jnp.asarray([0], jnp.int32)
    q5, kn, vn, kc, vc, ks, vs = mk(B, KH, G, D, L, T, kind, "dt")
    cfg = ModelConfig(
        arch="llama", n_layer=L, n_head=KH * G, n_kv_head=KH,
        n_embd=KH * G * D, head_dim=D, n_ff=4 * D * KH, n_vocab=32000,
        n_ctx_train=4096, rope_dim=D, rms_eps=1e-5, rope_theta=10000.0,
        rope_type="neox",
    )

    @jax.jit
    def step(q5, kc, vc, ks, vs):
        o = q5
        for li in range(L):
            o = _decode_call_dma(o, kn, vn, kc, vc, ks, vs, li, slots,
                                 starts, win, cfg=cfg, kind=kind,
                                 interpret=False)
        return o

    r = step(q5, kc, vc, ks, vs)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = step(q5, kc, vc, ks, vs)
    jax.block_until_ready(r)
    us_layer = (time.time() - t0) / reps / L * 1e6
    print(f"{name:34s} dma: {us_layer:8.1f} us/layer", flush=True)


if os.environ.get("AB_DMA") == "1":
    for kind in ("f16", "q8_0", "q4_0"):
        bench_dma(f"tiny D=64 {kind} T=2560 fill=2048", B=8, KH=4, G=8, D=64,
                  L=8, T=2560, fill=2048, kind=kind)
        bench_dma(f"tiny D=64 {kind} T=2560 fill=128", B=8, KH=4, G=8, D=64,
                  L=8, T=2560, fill=128, kind=kind)
    for kind in ("f16", "q8_0"):
        bench_dma(f"7B D=128 {kind} T=4096 fill=256", B=8, KH=32, G=1, D=128,
                  L=4, T=4096, fill=256, kind=kind)
        bench_dma(f"7B D=128 {kind} T=4096 fill=4000", B=8, KH=32, G=1,
                  D=128, L=4, T=4096, fill=4000, kind=kind)
        bench_dma(f"7B D=128 {kind} T=512 fill=128", B=8, KH=32, G=1,
                  D=128, L=4, T=512, fill=128, kind=kind)
