"""Serving wrapper for bidirectional embedding models (bert family).

The reference serves dedicated embedding models by loading them with
`model_type: embedding` and routing /v1/embeddings through the same engine
interface (.github/scripts/e2e-test-server.py phase 2; pooling applied via
llama_get_embeddings_seq, /root/reference/src/llama_server_context.cc:
1042-1058). This class exposes the same task surface as InferenceEngine
(request_completion / next_result / request_cancel / warm_up / shutdown)
but runs a single bidirectional encode per request — no slots, no decode
loop, no KV cache.

Requests encode synchronously on the calling thread (JAX dispatch is
thread-safe); prompt lengths are bucketed to powers of two so the jitted
encode compiles a handful of executables, not one per length.
"""

from __future__ import annotations

import math
import threading
import time

import jax.numpy as jnp
import numpy as np

from ..model.bert import encode
from ..model.loader import LoadedModel
from .types import CompletionParams, StopReason, TaskResult


class EncoderEngine:
    def __init__(self, lm: LoadedModel, n_ctx: int = 512, **_unused):
        self.lm = lm
        self.cfg = lm.cfg
        self.tokenizer = lm.tokenizer
        self.n_ctx = min(int(n_ctx), lm.cfg.n_ctx_train)
        self.failed = False
        self.n_requests = 0
        self.slots: list = []  # registry inventory probes iterate this
        self._results: dict[int, TaskResult] = {}
        self._next_id = 0
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)

    # -- engine surface ------------------------------------------------------
    def warm_up(self) -> None:
        """Compile the smallest bucket (reference WarmUpModel analog,
        llama_engine.cc:1247-1267)."""
        self._encode_ids([self.tokenizer.bos_id if self.tokenizer.bos_id >= 0
                          else 0, 1])

    def shutdown(self) -> None:
        pass

    def request_cancel(self, task_id: int) -> None:
        pass  # encodes are synchronous; nothing in flight to cancel

    def request_completion(self, params: CompletionParams) -> int:
        with self._lock:
            tid = self._next_id
            self._next_id += 1
            self.n_requests += 1
        result = self._run(tid, params)
        with self._cv:
            self._results[tid] = result
            self._cv.notify_all()
        return tid

    def next_result(self, task_id: int, timeout: float | None = None) -> TaskResult:
        deadline = time.time() + (timeout or 120.0)
        with self._cv:
            while task_id not in self._results:
                if not self._cv.wait(timeout=max(deadline - time.time(), 0.01)):
                    return TaskResult(task_id=task_id, error=True, stop=True,
                                      error_message="timeout")
            return self._results.pop(task_id)

    # -- internals -----------------------------------------------------------
    def _run(self, tid: int, params: CompletionParams) -> TaskResult:
        if not params.embedding:
            return TaskResult(
                task_id=tid, error=True, stop=True,
                error_message="This model is loaded for embeddings only "
                              "(model_type: embedding); chat completion is "
                              "not supported")
        t0 = time.time()
        if isinstance(params.prompt, str):
            ids = self.tokenizer.encode(params.prompt, add_special=True)
        else:
            ids = [int(t) for t in params.prompt]
        if not ids:
            ids = [self.tokenizer.bos_id if self.tokenizer.bos_id >= 0 else 0]
        ids = ids[: self.n_ctx]
        try:
            vec = self._encode_ids(ids)
        except Exception as e:  # noqa: BLE001 — per-request isolation
            self.failed = True
            return TaskResult(task_id=tid, error=True, stop=True,
                              error_message=f"encode failed: {e}")
        norm = float(np.linalg.norm(vec))
        if norm > 0:
            vec = vec / norm  # common_embd_normalize L2 (ref :1058)
        ms = (time.time() - t0) * 1000.0
        return TaskResult(
            task_id=tid, stop=True, stop_reason=StopReason.EOS,
            tokens_evaluated=len(ids),
            embedding=[float(x) for x in vec],
            timings={"prompt_n": len(ids), "prompt_ms": round(ms, 2)},
        )

    def _encode_ids(self, ids: list[int]) -> np.ndarray:
        bucket = min(max(8, 1 << math.ceil(math.log2(len(ids)))), self.n_ctx)
        bucket = max(bucket, len(ids))  # n_ctx not a power of two
        toks = np.zeros((1, bucket), np.int32)
        toks[0, : len(ids)] = ids
        out = encode(self.lm.weights, jnp.asarray(toks),
                     jnp.asarray([len(ids)], jnp.int32), self.cfg)
        return np.asarray(out)[0]
