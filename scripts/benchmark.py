#!/usr/bin/env python3
"""Concurrent HTTP serving throughput harness.

Rebuild of the reference's scripts/benchmark.py (SURVEY.md section 4
"throughput bench": 40 async users x 10 rounds, 500 max_tokens,
n_parallel=32): drives a running tpu-engine server over
/v1/chat/completions with streaming and reports aggregate tokens/s.

Usage:
  python scripts/benchmark.py --base http://127.0.0.1:3928 \
      --model MODEL_ID [--users 40] [--rounds 10] [--max-tokens 500]
  (optionally --load PATH.gguf to load the model first)
"""

from __future__ import annotations

import argparse
import asyncio
import json
import statistics
import sys
import time
import urllib.request


async def one_request(base: str, model: str, max_tokens: int, user: int,
                      rnd: int, results: list) -> None:
    body = json.dumps({
        "model": model,
        "stream": True,
        "max_tokens": max_tokens,
        "messages": [{
            "role": "user",
            "content": f"Write a story about topic {user}-{rnd} with many details.",
        }],
    }).encode()

    def run():
        req = urllib.request.Request(
            base + "/v1/chat/completions", data=body,
            headers={"Content-Type": "application/json"}, method="POST")
        t0 = time.time()
        ttft = None
        n_tokens = 0
        with urllib.request.urlopen(req, timeout=1200) as r:
            for line in r:
                line = line.strip()
                if not line.startswith(b"data: "):
                    continue
                payload = line[6:]
                if payload == b"[DONE]":
                    break
                obj = json.loads(payload)
                for c in obj.get("choices", []):
                    if c.get("delta", {}).get("content"):
                        if ttft is None:
                            ttft = time.time() - t0
                        n_tokens += 1
        return {"tokens": n_tokens, "ttft": ttft or 0.0, "dur": time.time() - t0}

    res = await asyncio.get_event_loop().run_in_executor(None, run)
    results.append(res)


async def run_bench(args) -> dict:
    results: list = []
    t0 = time.time()
    for rnd in range(args.rounds):
        await asyncio.gather(*[
            one_request(args.base, args.model, args.max_tokens, u, rnd, results)
            for u in range(args.users)
        ])
        done = sum(r["tokens"] for r in results)
        print(f"[round {rnd + 1}/{args.rounds}] total tokens {done}", file=sys.stderr)
    wall = time.time() - t0
    total = sum(r["tokens"] for r in results)
    ttfts = sorted(r["ttft"] for r in results if r["ttft"])
    return {
        "total_tokens": total,
        "wall_s": round(wall, 2),
        "tokens_per_sec": round(total / wall, 2),
        "p50_ttft_ms": round(1000 * statistics.median(ttfts), 1) if ttfts else None,
        "p99_ttft_ms": round(1000 * ttfts[int(len(ttfts) * 0.99) - 1], 1) if ttfts else None,
        "requests": len(results),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="http://127.0.0.1:3928")
    ap.add_argument("--model", default="bench")
    ap.add_argument("--users", type=int, default=40)
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--max-tokens", type=int, default=500)
    ap.add_argument("--load", default=None, help="GGUF path: POST /loadmodel first")
    ap.add_argument("--n-parallel", type=int, default=32)
    ap.add_argument("--ctx-len", type=int, default=32000)
    args = ap.parse_args()

    if args.load:
        req = urllib.request.Request(
            args.base + "/loadmodel",
            data=json.dumps({
                "llama_model_path": args.load,
                "model": args.model,
                "ctx_len": args.ctx_len,
                "n_parallel": args.n_parallel,
            }).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=3600) as r:
            print(r.read().decode(), file=sys.stderr)

    out = asyncio.run(run_bench(args))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
