import os, sys, time
cachedir = "/root/repo/.bench_cache/xla_cache"
import jax
jax.config.update("jax_compilation_cache_dir", cachedir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp

t0 = time.time()
f = jax.jit(lambda x: sum(jnp.sin(x @ x) for _ in range(30)))
x = jnp.ones((1024, 1024), jnp.bfloat16)
jax.block_until_ready(f(x))
print(f"compile+run: {time.time()-t0:.2f}s", flush=True)
os.system(f"ls -la {cachedir} 2>/dev/null | head -5")
