"""Raw decode-chunk timing at the bench 7B config (real TPU).

Times the jitted 32-step decode_loop (the headline bench's hot path)
directly — no engine/scheduling noise — so kernel-level A/B experiments
(e.g. TPU_ENGINE_PACKED_SCALES=0/1) compare cleanly:

  TPU_ENGINE_PACKED_SCALES=0 python scripts/decode_ab.py
  TPU_ENGINE_PACKED_SCALES=1 python scripts/decode_ab.py
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

from tpu_engine.kernels import dequant_matmul, flash_attention

if jax.devices()[0].platform == "tpu":
    dequant_matmul.enable()
    flash_attention.enable()

PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                    ".bench_cache",
                    os.environ.get("AB_GGUF", "llama2-7b-q4_k_m-s0.gguf"))
S = int(os.environ.get("AB_SLOTS", "8"))
CTX_SLOT = int(os.environ.get("AB_CTX", "512"))
CHUNK = int(os.environ.get("AB_CHUNK", "32"))
KIND = os.environ.get("AB_KV", "f16")


def main():
    from tpu_engine.kvcache.cache import new_cache
    from tpu_engine.model.llama import decode_loop
    from tpu_engine.model.loader import load_model
    from tpu_engine.sampling import SamplingParams
    from tpu_engine.sampling.device import new_state, params_from_host

    t0 = time.time()
    lm = load_model(PATH)
    w, cfg = lm.weights, lm.cfg
    print(f"[load {time.time()-t0:.1f}s; packed_scales="
          f"{os.environ.get('TPU_ENGINE_PACKED_SCALES', '0')}]",
          file=sys.stderr)
    cache = new_cache(cfg.n_layer, S, CTX_SLOT, cfg.n_kv_head, cfg.head_dim,
                      dtype=jnp.bfloat16, kind=KIND)
    act = jnp.ones((S,), bool)
    params = params_from_host([SamplingParams(temperature=0.0)] * S)
    st = new_state(S, seed=0)
    tok = jnp.zeros((S,), jnp.int32)

    def chunk(cache, tok, st):
        toks, last, cache, st = decode_loop(
            w, cache, tok, act, cfg, params, st, CHUNK, rot_cache=True)
        return last, cache, st

    import numpy as _np

    # warm-up: compile + advance fill to ~128 so attention reads real blocks
    for _ in range(4):
        tok, cache, st = chunk(cache, tok, st)
    _np.asarray(tok)  # value pull: block_until_ready alone returns early
    # on the axon remote runtime for donated-buffer chains

    reps = 6
    t0 = time.time()
    for _ in range(reps):
        tok, cache, st = chunk(cache, tok, st)
    _np.asarray(tok)  # chunks chain through tok: one pull settles all reps
    dt = (time.time() - t0) / reps
    per_step = dt / CHUNK * 1e3
    agg = S * CHUNK / dt
    wb = lm.model_size_bytes
    floor = wb / 819e9 * 1e3
    print(f"chunk{CHUNK} x{reps}: {dt*1e3:.1f} ms -> {per_step:.2f} ms/step "
          f"({agg:.0f} tok/s aggregate; weight-read floor {floor:.2f} ms/step)")


if __name__ == "__main__":
    main()
