"""One-shot generation CLI (no server): load GGUF, prefill, stream tokens.

Usage:
    python -m tpu_engine.tools.chat MODEL.gguf -p "prompt" [-n 64] [--temp 0.8]
        [--cpu] [--seed N] [--greedy]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="tpu_engine one-shot generation")
    ap.add_argument("model")
    ap.add_argument("-p", "--prompt", default="Hello")
    ap.add_argument("-n", "--n-predict", type=int, default=64)
    ap.add_argument("--temp", type=float, default=0.8)
    ap.add_argument("--greedy", action="store_true")
    ap.add_argument("--seed", type=int, default=-1)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--ctx", type=int, default=1024)
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ..kvcache.cache import new_cache
    from ..model.llama import forward_step
    from ..model.loader import load_model
    from ..sampling import Sampler, SamplingParams
    from ..tokenizer import StreamDetokenizer

    t0 = time.time()
    lm = load_model(args.model)
    cfg, tok = lm.cfg, lm.tokenizer
    print(
        f"[load {time.time()-t0:.2f}s] {cfg.arch} L={cfg.n_layer} E={cfg.n_embd} "
        f"H={cfg.n_head}/{cfg.n_kv_head} V={cfg.n_vocab} on {jax.devices()[0].platform}",
        file=sys.stderr,
    )

    ids = tok.encode(args.prompt)
    cache = new_cache(cfg.n_layer, 1, args.ctx, cfg.n_kv_head, cfg.head_dim)
    sampler = Sampler(
        SamplingParams(
            temperature=0.0 if args.greedy else args.temp,
            seed=None if args.seed < 0 else args.seed,
        ),
        cfg.n_vocab,
        eos_id=tok.eos_id,
    )
    for t in ids:
        sampler.accept(t, apply_grammar=False)

    t0 = time.time()
    logits, cache, _ = forward_step(
        lm.weights, cache, jnp.asarray([ids], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), cfg,
    )
    logits.block_until_ready()
    t_prefill = time.time() - t0

    detok = StreamDetokenizer(tok)
    n_gen = 0
    t0 = time.time()
    for _ in range(args.n_predict):
        token = sampler.sample(np.asarray(logits[0]))
        sampler.accept(token)
        n_gen += 1
        if tok.is_eog(token):
            break
        sys.stdout.write(detok.push(token))
        sys.stdout.flush()
        logits, cache, _ = forward_step(
            lm.weights, cache, jnp.asarray([[token]], jnp.int32),
            jnp.asarray([0], jnp.int32), jnp.asarray([True]), cfg,
        )
    t_decode = time.time() - t0
    sys.stdout.write(detok.flush() + "\n")
    print(
        f"[prefill {len(ids)} tok in {t_prefill*1000:.0f} ms "
        f"({len(ids)/max(t_prefill,1e-9):.1f} tok/s) | "
        f"decode {n_gen} tok in {t_decode*1000:.0f} ms "
        f"({n_gen/max(t_decode,1e-9):.1f} tok/s)]",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
