"""Dump the lowered StableHLO of forward_step (pallas on) for diffing."""

import os, sys

out = sys.argv[1]
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from tests.models import build_test_gguf

path = "/tmp/cache_det_tiny.gguf"
if not os.path.exists(path):
    build_test_gguf(path, quant="q4_k_m")

from tpu_engine.kernels import dequant_matmul, flash_attention

dequant_matmul.enable()
flash_attention.enable()

from tpu_engine.model.loader import load_model
from tpu_engine.model.llama import forward_step
from tpu_engine.kvcache.cache import new_cache

lm = load_model(path)
cfg = lm.cfg
cache = new_cache(cfg.n_layer, 2, 64, cfg.n_kv_head, cfg.head_dim,
                  dtype=jnp.bfloat16, kind="f16")
lowered = forward_step.lower(
    lm.weights, cache, jnp.zeros((2, 8), jnp.int32),
    jnp.arange(2, dtype=jnp.int32), jnp.ones((2,), bool), cfg,
    n_valid=jnp.full((2,), 8, jnp.int32))
with open(out, "w") as f:
    f.write(lowered.as_text())
print("wrote", out, flush=True)
