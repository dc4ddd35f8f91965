"""Perplexity gate at scale (BASELINE.md quality gate, VERDICT r2 item 5).

Runs the f32-vs-Q4_K_M (and f16-KV vs q8_0/q4_0-KV) perplexity comparison
on the TinyLlama-1.1B-architecture synthetic — the deepest model whose f32
weights fit this chip's HBM (7B f32 is 27 GB; the 16 GB v5e cannot hold
it) — and writes PPL_r{N}.json at the repo root.

Methodology note: with no network egress there are no real WikiText-2
weights or text in this environment, so the gate measures the QUANTIZATION
error of our pipeline on seeded-random weights over deterministic pseudo-
text: both runs see identical tokens, identical eval code, and weights
that differ ONLY by Q4_K_M quantization — the delta isolates exactly what
llama.cpp's published k-quant Δppl isolates (its Q4_K_M band on WikiText-2
is ~0.05 ppl on ~5.9, i.e. <1% relative; random-weight models are more
quantization-sensitive than trained ones, so the gate here is a few
percent).

Usage: python scripts/ppl_gate.py [--round N] [--ctx 512]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def pseudo_text(n_words: int = 24000, seed: int = 5) -> str:
    import random

    from tpu_engine.tools.synthetic import _WORDS

    rng = random.Random(seed)
    return " ".join(rng.choice(_WORDS) for _ in range(n_words))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=3)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--preset", default="tinyllama-1.1b")
    ap.add_argument("--with-7b", action="store_true",
                    help="add the 7B-scale set (base q8_0; f32 7B "
                         "exceeds the 16 GB chip)")
    args = ap.parse_args()

    from tpu_engine.utils.jaxinit import setup_compilation_cache

    setup_compilation_cache(os.path.join(_DIR, ".bench_cache", "xla"))
    import jax

    if jax.devices()[0].platform == "tpu":
        from tpu_engine.kernels import dequant_matmul, flash_attention

        dequant_matmul.enable()
        flash_attention.enable()

    from tpu_engine.model.loader import load_model
    from tpu_engine.tools.perplexity import compute_ppl
    from tpu_engine.tools.synthetic import cached_synthetic

    cache_dir = os.path.join(_DIR, ".bench_cache")
    text = pseudo_text()

    def prog(i, n, p):
        print(f"  [{i}/{n}] ppl {p:.4f}", file=sys.stderr)

    results = {}
    for quant, kv in (("f32", "f16"), ("q4_k_m", "f16"),
                      ("q4_k_m", "q8_0"), ("q4_k_m", "q4_0")):
        t0 = time.time()
        path = cached_synthetic(cache_dir, args.preset, quant)
        lm = load_model(path)
        ppl, n, _ = compute_ppl(lm, text, n_ctx=args.ctx, progress=prog,
                                kv_kind=kv)
        key = f"{quant}+kv_{kv}"
        results[key] = {"ppl": round(ppl, 5), "tokens": n,
                        "wall_s": round(time.time() - t0, 1)}
        print(f"[{key}: ppl {ppl:.5f} over {n} tokens, "
              f"{time.time()-t0:.0f}s]", file=sys.stderr)
        del lm

    base = results["f32+kv_f16"]["ppl"]
    q4 = results["q4_k_m+kv_f16"]["ppl"]
    out = {
        "metric": f"ppl_delta_q4_k_m_vs_f32_{args.preset}",
        "value": round(100.0 * (q4 - base) / base, 4),
        "unit": "percent",
        "vs_baseline": round(q4 / base, 6),
        "detail": results,
        "ctx": args.ctx,
        "methodology": "seeded synthetic weights + deterministic pseudo-text"
                       " (no egress); llama.cpp WikiText-2 Q4_K_M band is"
                       " <1% relative on trained weights",
    }

    if args.with_7b:
        # 7B scale (round-4 verdict #4): f32 7B is 27 GB and cannot fit
        # the 16 GB v5e, so the base is q8_0 — the level llama.cpp itself
        # treats as indistinguishable from f16 on WikiText-2
        r7 = {}
        for quant, kv in (("q8_0", "f16"), ("q4_k_m", "f16"),
                          ("q4_k_m", "q8_0"), ("q4_k_m", "q4_0")):
            t0 = time.time()
            path7 = cached_synthetic(cache_dir, "llama2-7b", quant)
            lm = load_model(path7)
            ppl, n, _ = compute_ppl(lm, text, n_ctx=args.ctx, progress=prog,
                                    kv_kind=kv)
            key = f"{quant}+kv_{kv}"
            r7[key] = {"ppl": round(ppl, 5), "tokens": n,
                       "wall_s": round(time.time() - t0, 1)}
            print(f"[7b {key}: ppl {ppl:.5f} over {n} tokens, "
                  f"{time.time()-t0:.0f}s]", file=sys.stderr)
            del lm
        b7 = r7["q8_0+kv_f16"]["ppl"]
        q47 = r7["q4_k_m+kv_f16"]["ppl"]
        out["detail_7b"] = r7
        out["value_7b_pct_vs_q8_0"] = round(100.0 * (q47 - b7) / b7, 4)
    path = os.path.join(_DIR, f"PPL_r{args.round:02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("metric", "value", "unit", "vs_baseline")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
