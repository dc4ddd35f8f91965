"""Perplexity evaluation over a text file (the BASELINE.md quality gate).

Methodology (mirrors llama.cpp's `perplexity` tool, which the reference
relies on upstream for its k-quant quality claims): tokenize the whole
text, split into non-overlapping chunks of --ctx tokens, run each chunk
through the model with a fresh cache, and accumulate token NLL over the
SECOND half of every chunk (the first half is causal burn-in, so early
low-context positions don't dominate). ppl = exp(mean NLL).

The quality gate compares ppl of a quantized GGUF against the f16/f32
GGUF of the same weights: the delta must stay within llama.cpp's reported
k-quant delta for the same bit-width (BASELINE.md).

Usage:
    python -m tpu_engine.tools.perplexity MODEL.gguf -t FILE.txt
        [--ctx 512] [--cpu] [--json]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time


def compute_ppl(lm, text: str, n_ctx: int = 512, progress=None,
                kv_kind: str = "f16"):
    """Returns (ppl, n_tokens_scored, mean_nll). kv_kind: KV cache storage
    (f16 | q8_0 | q4_0) — the q8_0/q4_0 quality gate runs the same eval
    with a quantized cache."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..kvcache.cache import new_cache
    from ..model.llama import forward_step

    cfg, tok = lm.cfg, lm.tokenizer
    ids = tok.encode(text, add_special=True, parse_special=False)
    n_chunks = len(ids) // n_ctx
    if n_chunks == 0:
        raise ValueError(
            f"text too short: {len(ids)} tokens < ctx {n_ctx}")

    out_qt = lm.weights["output"]

    @jax.jit
    def chunk_nll(hidden, targets):
        # hidden [T, E] f32, targets [T] int32 -> per-position NLL [T]
        from ..model.weights import qmatmul

        logits = qmatmul(hidden.astype(jnp.bfloat16), out_qt).astype(jnp.float32)
        if cfg.final_logit_softcap > 0:
            c = cfg.final_logit_softcap
            logits = jnp.tanh(logits / c) * c
        lse = jax.nn.logsumexp(logits, axis=-1)
        tgt = jnp.take_along_axis(logits, targets[:, None], axis=-1)[:, 0]
        return lse - tgt

    from ..kvcache.cache import default_layout

    total_nll = 0.0
    total_n = 0
    first = n_ctx // 2  # score the second half of each chunk
    # Evaluate in SUB-CHUNKS so later sub-chunks attend the STORED cache:
    # a single full-window forward never reads stored KV (deferred append
    # — attention sees the window's own rows in-flight), which made the
    # q8_0/q4_0 rows of the quality gate vacuously equal to f16. Windows
    # are BATCHED 8 per forward so the (dominant) weight reads amortize.
    sub = min(128, n_ctx)
    B = min(8, n_chunks)
    for bi in range(0, n_chunks, B):
        rows = [ids[ci * n_ctx : (ci + 1) * n_ctx]
                for ci in range(bi, min(bi + B, n_chunks))]
        while len(rows) < B:  # ragged tail: pad with a repeat, score 0 rows
            rows.append(rows[0])
        n_real = min(B, n_chunks - bi)
        cache = new_cache(cfg.n_layer, B, n_ctx, cfg.n_kv_head, cfg.head_dim,
                          dtype=jnp.bfloat16, kind=kv_kind,
                          layout=default_layout(kv_kind, cfg.head_dim))
        hs = []
        for off in range(0, n_ctx, sub):
            toks = jnp.asarray([r[off:off + sub] for r in rows], jnp.int32)
            _, cache, hidden = forward_step(
                lm.weights, cache, toks,
                jnp.arange(B, dtype=jnp.int32), jnp.ones((B,), bool), cfg,
                collect_hidden="all",
            )
            hs.append(hidden)
        hidden = jnp.concatenate(hs, axis=1)  # [B, n_ctx, E]
        for r in range(n_real):
            # position p's hidden predicts token p+1
            h = hidden[r, first - 1 : n_ctx - 1]
            tgts = jnp.asarray(rows[r][first:], jnp.int32)
            nll = np.asarray(chunk_nll(h, tgts))
            total_nll += float(nll.sum())
            total_n += nll.shape[0]
        if progress:
            progress(min(bi + B, n_chunks), n_chunks,
                     math.exp(total_nll / total_n))
    return math.exp(total_nll / total_n), total_n, total_nll / total_n


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="tpu_engine perplexity eval")
    ap.add_argument("model")
    ap.add_argument("-t", "--text", required=True, help="plain-text eval file")
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--json", action="store_true",
                    help="print one BENCH-style JSON line")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ..model.loader import load_model

    t0 = time.time()
    lm = load_model(args.model)
    print(f"[load {time.time()-t0:.1f}s]", file=sys.stderr)
    with open(args.text, encoding="utf-8") as f:
        text = f.read()

    def prog(i, n, run_ppl):
        print(f"[{i}/{n}] ppl so far {run_ppl:.4f}", file=sys.stderr)

    ppl, n, nll = compute_ppl(lm, text, n_ctx=args.ctx, progress=prog)
    if args.json:
        print(json.dumps({
            "metric": "perplexity", "value": round(ppl, 4), "unit": "ppl",
            "tokens": n, "ctx": args.ctx, "model": args.model,
        }))
    else:
        print(f"perplexity: {ppl:.4f} over {n} tokens (ctx {args.ctx})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
