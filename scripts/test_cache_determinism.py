"""Is the persistent-cache key stable across processes for our executables?

Run twice; the second run should print the SAME file list and a fast time.
Usage: python scripts/test_cache_determinism.py [pallas|xla]
"""

import os, sys, time

mode = sys.argv[1] if len(sys.argv) > 1 else "pallas"
cachedir = f"/tmp/cache_det_{mode}"
import jax

jax.config.update("jax_compilation_cache_dir", cachedir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tests.models import build_test_gguf  # noqa: E402

path = "/tmp/cache_det_tiny.gguf"
if not os.path.exists(path):
    build_test_gguf(path, quant="q4_k_m")

if mode == "pallas":
    from tpu_engine.kernels import dequant_matmul, flash_attention

    dequant_matmul.enable()
    flash_attention.enable()

from tpu_engine.model.loader import load_model  # noqa: E402
from tpu_engine.model.llama import forward_step  # noqa: E402
from tpu_engine.kvcache.cache import new_cache  # noqa: E402

lm = load_model(path)
cfg = lm.cfg
cache = new_cache(cfg.n_layer, 2, 64, cfg.n_kv_head, cfg.head_dim,
                  dtype=jnp.bfloat16, kind="f16")
t0 = time.time()
logits, cache, _ = forward_step(
    lm.weights, cache, jnp.zeros((2, 8), jnp.int32),
    jnp.arange(2, dtype=jnp.int32), jnp.ones((2,), bool), cfg,
    n_valid=jnp.full((2,), 8, jnp.int32))
np.asarray(logits)
print(f"forward compile+run: {time.time()-t0:.1f}s", flush=True)
names = sorted(os.listdir(cachedir))
print(len(names), "entries")
for n in names:
    print(" ", n[:80])
