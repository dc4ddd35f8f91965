"""Per-op device-time attribution of the cfg3 decode regime (real TPU):
TinyLlama Q4_K_M weights, q8_0 KV (transposed "dt" layout), fill ~2048.

Usage: python scripts/profile_cfg3.py [fill] [kv_kind] [layout]
"""

import glob
import os
import re
import sys
import tempfile
import time
from collections import defaultdict

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

PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                    ".bench_cache", "tinyllama-1.1b-q4_k_m-s0.gguf")
S = 8
CTX_SLOT = 2560
CHUNK = 32

FILL = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
KIND = sys.argv[2] if len(sys.argv) > 2 else "q8_0"
LAYOUT = sys.argv[3] if len(sys.argv) > 3 else "dt"


def main():
    from tpu_engine.kvcache.cache import new_cache
    from tpu_engine.model.llama import decode_loop
    from tpu_engine.model.loader import load_model
    from tpu_engine.sampling import SamplingParams
    from tpu_engine.sampling.device import new_state, params_from_host

    lm = load_model(PATH)
    w, cfg = lm.weights, lm.cfg
    cache = new_cache(cfg.n_layer, S, CTX_SLOT, cfg.n_kv_head, cfg.head_dim,
                      kind=KIND, layout=LAYOUT)
    # pretend fill: lengths say FILL (cells are zeros — same DMA traffic)
    cache.lengths = jnp.full((S,), FILL, jnp.int32)
    act = jnp.ones((S,), bool)
    params = params_from_host([SamplingParams(temperature=0.0)] * S)
    st = new_state(S, seed=0)
    tok1 = jnp.zeros((S,), jnp.int32)

    for _ in range(2):  # compile + warm
        cache.lengths = jnp.full((S,), FILL, jnp.int32)
        toks_out, last, cache, st = decode_loop(
            w, cache, tok1, act, cfg, params, st, CHUNK, rot_cache=True)
    jax.block_until_ready(toks_out)

    REPS = 5
    cache.lengths = jnp.full((S,), FILL, jnp.int32)
    _ = np.asarray(last)  # drain the queue before timing
    t0 = time.time()
    for _i in range(REPS):
        cache.lengths = jnp.full((S,), FILL, jnp.int32)
        toks_out, last, cache, st = decode_loop(
            w, cache, tok1, act, cfg, params, st, CHUNK, rot_cache=True)
    _ = np.asarray(last)  # force full completion (D2H)
    wall = (time.time() - t0) / REPS
    print(f"wall {wall*1e3:.1f} ms for {CHUNK} steps = "
          f"{wall/CHUNK*1e3:.2f} ms/step -> {S*CHUNK/wall:.0f} tok/s "
          f"(fill={FILL} kind={KIND} layout={LAYOUT})")

    tmp = tempfile.mkdtemp(prefix="prof_")
    cache.lengths = jnp.full((S,), FILL, jnp.int32)
    with jax.profiler.trace(tmp):
        toks_out, last, cache, st = decode_loop(
            w, cache, tok1, act, cfg, params, st, CHUNK, rot_cache=True)
        jax.block_until_ready(toks_out)

    files = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
    from jax.profiler import ProfileData

    xs = ProfileData.from_file(files[0])
    tot = defaultdict(float)
    cnt = defaultdict(int)
    device_total = 0.0
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                tot[ev.name] += ev.duration_ns / 1e6
                cnt[ev.name] += 1
                device_total += ev.duration_ns / 1e6
    print(f"device total {device_total:.2f} ms "
          f"({device_total/CHUNK:.3f} ms/step)")
    for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{ms:9.3f} ms  x{cnt[name]:<5d} {name[:120]}")


if __name__ == "__main__":
    main()
