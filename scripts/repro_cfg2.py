"""Localize the cfg2 warm-up device fault: tinyllama Q5_K_M, buckets
(16, 64, 256), f32 KV. Pull after EVERY op so the async error pins to the
executable that raised it."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402


def main() -> int:
    import jax

    from tpu_engine.model.loader import load_model
    from tpu_engine.sampling import SamplingParams
    from tpu_engine.serve import InferenceEngine
    from tpu_engine.tools.synthetic import cached_synthetic
    from tpu_engine.utils.jaxinit import setup_compilation_cache

    setup_compilation_cache(os.path.join(_DIR, ".bench_cache", "xla"))
    if jax.devices()[0].platform == "tpu":
        from tpu_engine.kernels import dequant_matmul, flash_attention

        dequant_matmul.enable()
        flash_attention.enable()

    quant = os.environ.get("REPRO_QUANT", "q5_k_m")
    buckets = tuple(int(b) for b in
                    os.environ.get("REPRO_BUCKETS", "16,64,256").split(","))
    path = cached_synthetic(os.path.join(_DIR, ".bench_cache"),
                            "tinyllama-1.1b", quant)
    lm = load_model(path)
    eng = InferenceEngine(lm, n_ctx=4096, n_parallel=8, n_batch=512,
                          prefill_buckets=buckets,
                          cache_type=os.environ.get("REPRO_KV", "f32"))
    ops = eng.ops
    S = 8
    slots = np.arange(S, dtype=np.int32)
    active = np.ones((S,), bool)
    try:
        for b in buckets:
            for rows in (1, S):
                t0 = time.time()
                logits, _ = ops.step(
                    np.full((rows, b), 3, np.int32), slots[:rows],
                    active[:rows], n_valid=np.full((rows,), b - 2, np.int32))
                ops.pull(logits)
                print(f"[ok] prefill[{rows}x{b}] {time.time()-t0:.1f}s",
                      flush=True)
        for chunk in (128, 64, 16):
            t0 = time.time()
            toks = ops.dloop(chunk, active, reset={
                "pending": np.full((S,), 3, np.int32),
                "by_slot": [SamplingParams(temperature=0.0)] * S,
                "prevs": [[3]] * S, "seed": 0})
            ops.pull(toks)
            print(f"[ok] dloop[{S}x{chunk}] {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        logits, _ = ops.step(np.zeros((S, 1), np.int32), slots,
                             np.zeros((S,), bool))
        ops.pull(logits)
        print(f"[ok] single[{S}x1] {time.time()-t0:.1f}s", flush=True)
    finally:
        eng.shutdown()
    print("[all ok]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
