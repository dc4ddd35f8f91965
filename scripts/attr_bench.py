"""Scan-amortized attribution of decode-step time (run on real TPU).

Each component is timed inside a lax.scan with a sequential dependence so
dispatch overhead amortizes and XLA can't hoist the work out of the loop.
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
from tpu_engine.model.llama import _ATTN_IMPL, forward_step
from tpu_engine.model import llama as L
from tpu_engine.model.loader import load_model
from tpu_engine.model.weights import qmatmul

PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                    ".bench_cache", "tinyllama-1.1b-q4_k_m-s0.gguf")
S = 8
N = 64  # scan length


def scan_time(fn, x0, n=N, reps=3):
    """fn: x -> x (same shape/dtype); returns ms per iteration."""
    stepped = jax.jit(lambda x: jax.lax.scan(
        lambda c, _: (fn(c), None), x, None, length=n)[0])
    r = stepped(x0)
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        r = stepped(x0)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0))
    return best / n * 1000


def main():
    lm = load_model(PATH)
    w, cfg = lm.weights, lm.cfg
    lws = w["layers"]
    if isinstance(lws, dict):  # stacked (scanned) layout: take layer 0
        from tpu_engine.model.weights import QTensor, layer_slice
        l0 = {k: (layer_slice(v, 0) if isinstance(v, QTensor) else v[0])
              for k, v in lws.items()}
    else:
        l0 = lws[0]
    E = cfg.n_embd
    print(f"model: L={cfg.n_layer} E={E} V={cfg.n_vocab}; scan N={N}")

    x0 = jnp.ones((S, E), jnp.bfloat16) * 0.01
    results = {}

    def mk_mm(qt, k_in):
        def f(x):
            y = qmatmul(x[:, :k_in], qt)
            return jnp.tanh(y[:, :E]).astype(jnp.bfloat16) * 0.1 + x[:, :E] * 0.0
        return f

    for name in ("wqkv", "wo", "w_gateup", "w_down"):
        if name not in l0:
            continue
        qt = l0[name]
        nn, kk = qt.shape
        xin = jnp.ones((S, max(kk, E)), jnp.bfloat16) * 0.01

        def f(x, qt=qt, kk=kk):
            y = qmatmul(x[:, :kk].astype(jnp.bfloat16), qt)
            pad = x.shape[1] - min(y.shape[1], x.shape[1])
            yy = jnp.tanh(y[:, : x.shape[1]]).astype(jnp.bfloat16)
            if pad > 0:
                yy = jnp.concatenate(
                    [yy, jnp.zeros((S, pad), jnp.bfloat16)], axis=1)
            return yy * 0.1

        ms = scan_time(f, xin)
        qbytes = qt.qs.size * qt.qs.dtype.itemsize + qt.scale.size * 4 \
            + (qt.bias.size * 4 if qt.bias is not None else 0)
        results[name] = (ms, qbytes)
        print(f"  {name:10s} [{kk:5d}->{nn:5d}] {ms*1000:8.1f} us/it  "
              f"{qbytes/(ms/1000)/1e9:6.0f} GB/s  ({qbytes/1e6:.2f} MB)")

    qt = w["output"]
    nn, kk = qt.shape
    def f_out(x):
        y = qmatmul(x, qt)  # [S, V]
        return jnp.tanh(y[:, :E]).astype(jnp.bfloat16) * 0.1
    ms = scan_time(f_out, x0)
    qbytes = qt.qs.size * qt.qs.dtype.itemsize + qt.scale.size * 4
    results["output"] = (ms, qbytes)
    print(f"  {'output':10s} [{kk:5d}->{nn:5d}] {ms*1000:8.1f} us/it  "
          f"{qbytes/(ms/1000)/1e9:6.0f} GB/s  ({qbytes/1e6:.2f} MB)")

    per_layer = sum(results[n][0] for n in results if n != "output")
    total_mm = per_layer * cfg.n_layer + results["output"][0]
    print(f"  == matmul total {total_mm:.3f} ms/step")

    # attention (per layer): flash decode over the slot cache
    cache = new_cache(cfg.n_layer, S, 512, cfg.n_kv_head, cfg.head_dim,
                      dtype=jnp.bfloat16, kind="f16")
    cache = cache.__class__(cache.k, cache.v,
                            jnp.full((S,), 256, jnp.int32),
                            cache.k_scale, cache.v_scale, cache.kind)
    sids = jnp.arange(S, dtype=jnp.int32)
    nv = jnp.ones((S,), jnp.int32)
    ga_n = jnp.asarray(1, jnp.int32)
    ga_w = jnp.asarray(0, jnp.int32)

    def attn_f(q):
        # q: [S, 1, H, D]
        q_pos = cache.lengths[sids][:, None]
        k_new = jnp.zeros((S, cfg.n_kv_head, 1, cfg.head_dim), jnp.bfloat16)
        o = L._ATTN_IMPL(q, cache, 0, sids, q_pos, nv, k_new, k_new, cfg,
                         ga_n, ga_w)
        return jnp.tanh(o) * 0.5 + q * 0.0

    q0 = jnp.ones((S, 1, cfg.n_head, cfg.head_dim), jnp.bfloat16) * 0.01
    ms_attn = scan_time(attn_f, q0)
    print(f"  attention/layer (T=512 cache, len 256) {ms_attn*1000:8.1f} us/it "
          f"-> {ms_attn*cfg.n_layer:.3f} ms/step")

    # sampler
    from tpu_engine.sampling import SamplingParams
    from tpu_engine.sampling.device import new_state, params_from_host, sample_step
    params = params_from_host([SamplingParams(temperature=0.0)] * S)
    st = new_state(S, seed=0)

    def samp_f(logits):
        tok, st2 = sample_step(logits, params, st)
        return logits + tok[:, None].astype(jnp.float32) * 0.0

    lg0 = jnp.ones((S, cfg.n_vocab), jnp.float32)
    ms_samp = scan_time(samp_f, lg0)
    print(f"  sample_step {ms_samp*1000:8.1f} us/it")

    # KV append (isolated): emulate append_step cost
    from tpu_engine.kvcache.cache import append_step
    rows = jnp.ones((cfg.n_layer, S, cfg.n_kv_head, 1, cfg.head_dim), jnp.bfloat16)

    def app_f(c):
        st_ = c.lengths[sids]
        c2 = append_step(c, rows, rows, sids, st_, nv, jnp.ones((S,), bool))
        return c2.__class__(c2.k, c2.v, c.lengths, c2.k_scale, c2.v_scale, c2.kind)

    stepped = jax.jit(lambda c: jax.lax.scan(
        lambda cc, _: (app_f(cc), None), c, None, length=N)[0]
        if False else None)
    # simpler: time append inside a scan over the cache carry
    def app_scan(c):
        def body(cc, _):
            return app_f(cc), None
        return jax.lax.scan(body, c, None, length=N)[0]
    app_j = jax.jit(app_scan, donate_argnums=0)
    c1 = app_j(cache)
    jax.block_until_ready(c1.k)
    t0 = time.perf_counter()
    c2 = app_j(c1)
    jax.block_until_ready(c2.k)
    ms_app = (time.perf_counter() - t0) / N * 1000
    print(f"  kv append_step {ms_app*1000:8.1f} us/it")

    est = total_mm + ms_attn * cfg.n_layer + ms_samp + ms_app
    print(f"  == estimated step {est:.3f} ms (measured in-loop ~4.9 ms)")
    print(f"  roofline {lm.model_size_bytes/819e9*1000:.3f} ms/step")


if __name__ == "__main__":
    main()
