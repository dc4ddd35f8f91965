"""Hardware smoke: run every KV-cache kind x preset for a few steps on the
attached chip, pulling after EVERY device op so a fault localizes to the
executable that raised it (TPU errors are async — without per-op pulls they
surface at an unrelated pull later; that is how the round-3 bench default
change shipped broken, see VERDICT r3 weak #1).

Usage:
    python scripts/hw_smoke.py                  # tinyllama, all KV kinds
    SMOKE_7B=1 python scripts/hw_smoke.py      # + llama2-7b (needs cache)
    SMOKE_KINDS=f16 python scripts/hw_smoke.py  # restrict kinds
    SMOKE_TP=1 python scripts/hw_smoke.py      # + mesh=(1,1) dist/tp.py path

Writes HW_SMOKE.json at the repo root: one entry per (preset, kind, op)
with ok/error. Exit code 0 only if everything passed.

The rule this enforces (VERDICT r3 next-round #1): no bench-default change
lands without a committed hardware log from this script.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def smoke_engine(lm, preset: str, kind: str, results: list,
                 mesh=None) -> bool:
    """Exercise every serving executable for one (preset, kind): bucketed
    prefill, [S,1] host-sampled step, device decode chunk, KV index ops.
    Returns True if all ops passed."""
    import numpy as np

    from tpu_engine.sampling import SamplingParams
    from tpu_engine.serve import InferenceEngine

    tag = f"{preset}/{kind}" + ("/tp" if mesh is not None else "")
    S = 8
    eng = InferenceEngine(
        lm, n_ctx=4096 if preset == "llama2-7b" else 2048, n_parallel=S,
        n_batch=512, prefill_buckets=(16,), cache_type=kind, mesh=mesh)
    ops = eng.ops
    ok_all = True

    def run(op_name: str, fn):
        nonlocal ok_all
        t0 = time.time()
        try:
            fn()
            results.append({"case": tag, "op": op_name, "ok": True,
                            "s": round(time.time() - t0, 2)})
            print(f"[ok]   {tag:28s} {op_name} ({time.time()-t0:.1f}s)",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — recorded, not fatal
            ok_all = False
            results.append({"case": tag, "op": op_name, "ok": False,
                            "error": f"{type(e).__name__}: {e}"})
            print(f"[FAIL] {tag:28s} {op_name}: {e}\n"
                  f"{traceback.format_exc()}", file=sys.stderr)

    try:
        slots = np.arange(S, dtype=np.int32)
        active = np.ones((S,), bool)

        def prefill():
            logits, _ = ops.step(
                np.full((S, 16), 3, np.int32), slots, active,
                n_valid=np.full((S,), 12, np.int32))
            ops.pull(logits)

        def single():
            logits, _ = ops.step(np.full((S, 1), 3, np.int32), slots, active)
            ops.pull(logits)

        def dchunk():
            toks = ops.dloop(8, active, reset={
                "pending": np.full((S,), 3, np.int32),
                "by_slot": [SamplingParams(temperature=0.0)] * S,
                "prevs": [[3]] * S, "seed": 0})
            ops.pull(toks)

        def dchunk_chain():  # reset=None path chains the device-held token
            ops.pull(ops.dloop(8, active, reset=None))

        def kv_ops():
            ops.seq_cp(0, 1)
            ops.shift_compact(0, 4, 8)
            ops.trim(0, 4)
            ops.pull(ops.cache.lengths)

        run("prefill16", prefill)
        run("single_step", single)
        run("decode_chunk8", dchunk)
        run("decode_chain8", dchunk_chain)
        run("kv_ops", kv_ops)
    finally:
        eng.shutdown()
    return ok_all


def main() -> int:
    import jax

    from tpu_engine.model.loader import load_model
    from tpu_engine.tools.synthetic import cached_synthetic
    from tpu_engine.utils.jaxinit import setup_compilation_cache

    setup_compilation_cache(os.path.join(_DIR, ".bench_cache", "xla"))
    platform = jax.devices()[0].platform
    if platform == "tpu":
        from tpu_engine.kernels import dequant_matmul, flash_attention

        dequant_matmul.enable()
        flash_attention.enable()

    kinds = tuple(os.environ.get("SMOKE_KINDS", "f32,f16,q8_0,q4_0").split(","))
    presets = ["tinyllama-1.1b"]
    if os.environ.get("SMOKE_7B", "0") == "1":
        presets.append("llama2-7b")

    cache_dir = os.path.join(_DIR, ".bench_cache")
    results: list[dict] = []
    ok = True
    for preset in presets:
        path = cached_synthetic(cache_dir, preset, "q4_k_m")
        lm = load_model(path)
        for kind in kinds:
            ok &= smoke_engine(lm, preset, kind, results)
        del lm

    if os.environ.get("SMOKE_TP", "0") == "1":
        # degenerate (1,1) mesh exercises the dist/tp.py shard_map path on
        # the single real chip (VERDICT r3 next-round #8)
        from jax.sharding import Mesh

        from tpu_engine.dist.tp import TPSharder

        path = cached_synthetic(cache_dir, "tinyllama-1.1b", "q4_k_m")
        mesh = Mesh(
            __import__("numpy").array(jax.devices()[:1]).reshape(1, 1),
            ("data", "model"))
        lm = load_model(path, sharder=TPSharder(mesh))
        ok &= smoke_engine(lm, "tinyllama-1.1b", "f32", results, mesh=mesh)

    out = {"platform": platform, "ok": bool(ok), "results": results,
           "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
    with open(os.path.join(_DIR, "HW_SMOKE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"hw_smoke_ok": bool(ok), "cases": len(results)}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
