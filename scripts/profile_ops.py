"""Per-op device-time attribution of a 7B decode chunk (real TPU).

Loads the bench 7B GGUF, runs the jitted 32-step decode_loop under
jax.profiler, parses the XSpace proto, and prints the top device ops by
total time.

Usage:
  python scripts/profile_ops.py            # packed scales (default)
  TPU_ENGINE_PACKED_SCALES=0 python scripts/profile_ops.py
"""

import glob
import re
import os
import sys
import tempfile
from collections import defaultdict

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
                    ".bench_cache", "llama2-7b-q4_k_m-s0.gguf")
S = 8
CTX_SLOT = 512
CHUNK = 32


def main():
    from tpu_engine.kvcache.cache import new_cache
    from tpu_engine.model.llama import decode_loop
    from tpu_engine.model.loader import load_model
    from tpu_engine.sampling import SamplingParams
    from tpu_engine.sampling.device import new_state, params_from_host

    lm = load_model(PATH)
    w, cfg = lm.weights, lm.cfg
    from tpu_engine.kvcache.cache import default_layout
    cache = new_cache(cfg.n_layer, S, CTX_SLOT, cfg.n_kv_head, cfg.head_dim,
                      dtype=jnp.bfloat16, kind=os.environ.get("PROF_KV", "f16"),
                      layout=default_layout(os.environ.get("PROF_KV", "f16"),
                                            cfg.head_dim))
    act = jnp.ones((S,), bool)
    params = params_from_host([SamplingParams(temperature=0.0)] * S)
    st = new_state(S, seed=0)
    tok1 = jnp.zeros((S,), jnp.int32)

    # warm-up: compile + advance fill to ~128 so attention reads real blocks
    for _ in range(4):
        toks_out, last, cache, st = decode_loop(
            w, cache, tok1, act, cfg, params, st, CHUNK, rot_cache=True)
    jax.block_until_ready(toks_out)

    tmp = tempfile.mkdtemp(prefix="prof_")
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
                name = ev.name
                dur = ev.duration_ns / 1e6  # ms
                tot[name] += dur
                cnt[name] += 1
                device_total += dur

    packed = os.environ.get("TPU_ENGINE_PACKED_SCALES", "1") != "0"
    print(f"\n== packed={packed} chunk={CHUNK} steps: device total "
          f"{device_total:.2f} ms ({device_total/CHUNK:.3f} ms/step) ==")
    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:30]
    for name, ms in rows:
        print(f"{ms:9.3f} ms  x{cnt[name]:<5d} {name[:110]}")

    # aggregate by op class (sync compute only: custom-call/fusion)
    classes = defaultdict(float)
    for name, ms in tot.items():
        m = re.match(r"%?([a-zA-Z\-_.]+?)[.\d]*\s*=", name) or \
            re.match(r"%?([a-zA-Z\-_.]+)", name)
        op = m.group(1) if m else name[:20]
        body = name.split("=", 1)[1] if "=" in name else name
        if "custom-call" in body:
            op = "custom-call:" + ("qmm" if "dequant" in body or "s8[" in body
                                   or "u8[" in body else "?")
        classes[op] += ms
    qmm = defaultdict(float)
    qmmc = defaultdict(int)
    for name, ms in tot.items():
        body = name.split("=", 1)[1] if "=" in name else name
        if "custom-call" in body and ("s8[" in body or "u8[" in body):
            import re as _re
            mm = _re.findall(r"[su]8\[(\d+),(\d+)\]", body)
            key = mm[0] if mm else ("?", "?")
            qmm[key] += ms
            qmmc[key] += cnt[name]
    print("\n-- qmm by qs shape --")
    for key, ms in sorted(qmm.items(), key=lambda kv: -kv[1]):
        print(f"{ms:9.3f} ms  x{qmmc[key]:<6d} qs[{key[0]},{key[1]}]")
    print("\n-- by class --")
    for op, ms in sorted(classes.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{ms:9.3f} ms  {op}")


if __name__ == "__main__":
    main()
