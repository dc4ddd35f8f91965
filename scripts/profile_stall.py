"""Round-2 profiling: isolate the ~2s inter-chunk stall seen in BENCH_r01.

Measures, on the real device:
  1. H2D latency of a tiny np array (jnp.asarray)
  2. dispatch+complete latency of a trivial jitted fn on device args
  3. dispatch latency of a big donated-buffer execution, repeated
  4. D2H pull latency of a tiny output
"""

import time
import numpy as np
import jax
import jax.numpy as jnp

dev = jax.devices()[0]
print("platform:", dev.platform, dev)


def t(label, fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1000)
    print(f"{label}: {['%.1f' % x for x in ts]} ms")
    return ts


# 1. tiny H2D
a = np.zeros((8,), bool)
t("tiny H2D (bool[8])", lambda: jax.block_until_ready(jnp.asarray(a)))

# 2. trivial jit on device arg
x = jax.block_until_ready(jnp.zeros((8, 32), jnp.int32))
f = jax.jit(lambda v: v + 1)
jax.block_until_ready(f(x))
t("trivial jit dispatch+done", lambda: jax.block_until_ready(f(x)))

# 3. donated big-buffer execution (mimic decode_loop: big cache donated,
#    small outputs)
big = jax.block_until_ready(jnp.zeros((22, 8, 4, 4096, 64), jnp.bfloat16))
print("big buffer MB:", big.size * 2 / 1e6)


@jax.jit
def step(big, tok):
    big = big * 1.00001
    return big, tok + 1


state = [big, x]


def run_donated():
    b, tk = step(state[0], state[1])
    state[0], state[1] = b, tk
    jax.block_until_ready(tk)


jax.block_until_ready(step(state[0], state[1])[1])  # compile (no donation here)
state[0] = jax.block_until_ready(jnp.zeros((22, 8, 4, 4096, 64), jnp.bfloat16))


@jax.jit
def step_d(big, tok):
    big = big * 1.00001
    return big, tok + 1


step_d = jax.jit(lambda big, tok: (big * 1.00001, tok + 1), donate_argnums=(0,))
state = [jax.block_until_ready(jnp.zeros((22, 8, 4, 4096, 64), jnp.bfloat16)), x]
jax.block_until_ready(step_d(state[0], state[1])[1])


def run_d():
    b, tk = step_d(state[0], state[1])
    state[0], state[1] = b, tk
    jax.block_until_ready(tk)


state[0] = jax.block_until_ready(jnp.zeros((22, 8, 4, 4096, 64), jnp.bfloat16))
t("donated big-buffer exec", run_d, n=8)

# 4. chain without pulling: dispatch N steps back-to-back then pull once
state[0] = jax.block_until_ready(jnp.zeros((22, 8, 4, 4096, 64), jnp.bfloat16))


def run_chain():
    for _ in range(8):
        b, tk = step_d(state[0], state[1])
        state[0], state[1] = b, tk
    jax.block_until_ready(state[1])


t("8 donated execs chained, 1 sync", run_chain, n=4)

# 5. D2H pull of tiny output
y = jax.block_until_ready(f(x))
t("tiny D2H (np.asarray of [8,32] i32)", lambda: np.asarray(y))

# 6. H2D of a fresh tiny array every call mixed with exec (the engine's
#    active-mask pattern)
def run_mixed():
    act = jnp.asarray(np.ones((8,), bool))
    b, tk = step_d(state[0], state[1])
    state[0], state[1] = b, tk
    jax.block_until_ready(tk)


t("exec + fresh tiny H2D each call", run_mixed, n=8)
