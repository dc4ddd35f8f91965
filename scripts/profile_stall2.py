"""Stall profiling round 2: fully-synced per-exec timings.

Every iteration pulls a FRESH tiny output to host (real fence). Compares
donated vs non-donated big-buffer executions, and buffer-size scaling.
"""

import time
import numpy as np
import jax
import jax.numpy as jnp

dev = jax.devices()[0]
print("platform:", dev.platform, dev, flush=True)


def bench(label, mk_state, step, n=6):
    state = mk_state()
    state = step(state)          # compile + warm
    np.asarray(state[-1])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        state = step(state)
        np.asarray(state[-1])    # fresh tiny output -> real fence
        ts.append((time.perf_counter() - t0) * 1000)
    print(f"{label}: {['%.0f' % x for x in ts]} ms", flush=True)


SHAPE = (22, 8, 4, 4096, 64)  # ~369 MB bf16 (bench-like cache)
SMALL = (22, 8, 4, 512, 64)   # ~46 MB


def mk(shape):
    return lambda: (jax.block_until_ready(jnp.zeros(shape, jnp.bfloat16)),
                    jax.block_until_ready(jnp.zeros((8, 32), jnp.int32)))


f_nodon = jax.jit(lambda b, t: (b * 1.00001, t + 1))
f_don = jax.jit(lambda b, t: (b * 1.00001, t + 1), donate_argnums=(0,))
bench("no-donate 369MB", mk(SHAPE), lambda s: f_nodon(*s))
bench("donate    369MB", mk(SHAPE), lambda s: f_don(*s))

f_nodon2 = jax.jit(lambda b, t: (b * 1.00001, t + 1))
f_don2 = jax.jit(lambda b, t: (b * 1.00001, t + 1), donate_argnums=(0,))
bench("no-donate  46MB", mk(SMALL), lambda s: f_nodon2(*s))
bench("donate     46MB", mk(SMALL), lambda s: f_don2(*s))

f_don3 = jax.jit(lambda a, b, t: (a * 1.00001, b * 1.00001, t + 1),
                 donate_argnums=(0, 1))


def mk3():
    return (jax.block_until_ready(jnp.zeros(SMALL, jnp.bfloat16)),
            jax.block_until_ready(jnp.zeros(SMALL, jnp.bfloat16)),
            jax.block_until_ready(jnp.zeros((8, 32), jnp.int32)))


bench("donate 2x 46MB", mk3, lambda s: f_don3(*s))

# scan-of-8 inside one exec (decode_loop shape) vs 8 separate execs
def scanstep(b, t):
    def body(c, _):
        bb, tt = c
        return (bb * 1.00001, tt + 1), tt
    (b, t), _ = jax.lax.scan(body, (b, t), None, length=8)
    return b, t


f_scan = jax.jit(scanstep, donate_argnums=(0,))
bench("donate 369MB scan8-in-1", mk(SHAPE), lambda s: f_scan(*s))
