"""Weekend-style multi-architecture e2e sweep over the HTTP surface.

TPU-native analog of the reference's scheduled model-matrix run
(/root/reference/.github/scripts/e2e-test-server-weekend.py:23-80): nine
model configs — each with its own chat template and stop words, matching
the reference's table verbatim — are served SEQUENTIALLY through one
server process: /loadmodel -> non-stream chat -> streamed chat (SSE
parse) -> /unloadmodel. Real checkpoints aren't available in CI (zero
egress), so each config maps onto a tiny synthetic GGUF of the matching
architecture (tests/models.py + tests/test_archs.py builders); what the
sweep validates is the per-arch graph, the template plumbing, stop-word
handling and the load/unload lifecycle — the same surfaces the reference
sweep exercises, minus output quality (random weights).

Run: python scripts/e2e_weekend.py   (CPU by default; any platform works)
"""

import json
import os
import socket
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# reference weekend table (e2e-test-server-weekend.py:23-80):
# name -> (arch_builder_key, stop_words, system_prompt, user_prompt, ai_prompt)
CONFIGS = [
    ("llama3", "llama3", ["<|end_of_text|>", "<|eot_id|>"],
     "<|begin_of_text|><|start_header_id|>system<|end_header_id|>\n\n",
     "<|eot_id|><|start_header_id|>user<|end_header_id|>\n\n",
     "<|eot_id|><|start_header_id|>assistant<|end_header_id|>\n\n"),
    ("llama3.1", "llama3", ["<|end_of_text|>", "<|eot_id|>", "<|eom_id|>"],
     "<|begin_of_text|><|start_header_id|>system<|end_header_id|>\n\n",
     "<|eot_id|><|start_header_id|>user<|end_header_id|>\n\n",
     "<|eot_id|><|start_header_id|>assistant<|end_header_id|>\n\n"),
    ("gemma", "gemma", ["<end_of_turn>", "<eos>"],
     "", "<start_of_turn>user\n", "<end_of_turn>\n<start_of_turn>model"),
    ("gemma2", "gemma2", ["<end_of_turn>", "<eos>"],
     "", "<start_of_turn>user\n", "<end_of_turn>\n<start_of_turn>model"),
    ("phi3", "phi3", ["<|end|>"],
     "", "<|user|>\n", "<|end|>\n<|assistant|>\n"),
    ("mistral", "llama", ["</s>"],
     "<s>", " [INST] ", " [/INST]"),
    ("openhermes-2.5", "llama", ["</s>"],
     "<|im_start|>system\n", "<|im_end|>\n<|im_start|>user\n",
     "<|im_end|>\n<|im_start|>assistant\n"),
    ("tinyllama", "llama", ["</s>"],
     "<|system|>\n", "<|user|>\n", "<|assistant|>"),
    ("qwen2", "qwen2", [],
     "<|im_start|>system\n", "<|im_end|>\n<|im_start|>user\n",
     "<|im_end|>\n<|im_start|>assistant"),
]


def _build(kind: str, path: str) -> None:
    from tests.models import build_test_gguf, tokenizer_metadata
    from tpu_engine.tools.convert import hf_llama_to_gguf

    if kind == "llama":
        build_test_gguf(path, "q8_0", seed=7)
        return
    if kind == "llama3":
        from tests.test_archs import VOCAB, tiny_llama_scaled

        hf = tiny_llama_scaled({"rope_type": "llama3", "factor": 8.0,
                                "low_freq_factor": 1.0,
                                "high_freq_factor": 4.0,
                                "original_max_position_embeddings": 16})
        hf_llama_to_gguf(hf, path, "q8_0", tokenizer_metadata(VOCAB),
                         name="llama3")
        return
    from tests import test_archs as ta

    builder = {"gemma": ta.tiny_gemma, "gemma2": ta.tiny_gemma2,
               "phi3": ta.tiny_phi3, "qwen2": ta.tiny_qwen2}[kind]
    hf_llama_to_gguf(builder(), path, "q8_0",
                     tokenizer_metadata(ta.VOCAB), name=kind)


def post(base, path, body, timeout=600.0):
    req = urllib.request.Request(
        base + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def sse_chat(base, body, timeout=600.0):
    req = urllib.request.Request(
        base + "/v1/chat/completions", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    chunks = []
    with urllib.request.urlopen(req, timeout=timeout) as r:
        ct = r.headers.get("Content-Type", "")
        assert ct.startswith("text/event-stream"), ct
        for line in r:
            line = line.strip()
            if not line.startswith(b"data: "):
                continue
            payload = line[len(b"data: "):]
            if payload == b"[DONE]":
                break
            chunks.append(json.loads(payload))
    return chunks


def main() -> int:
    import jax

    if os.environ.get("E2E_PLATFORM", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from tpu_engine.api.server import make_server

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    srv = make_server("127.0.0.1", port)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    tmp = tempfile.mkdtemp(prefix="weekend_")
    built: dict[str, str] = {}
    failures = []
    for name, kind, stops, sys_p, usr_p, ai_p in CONFIGS:
        t0 = time.time()
        try:
            if kind not in built:
                built[kind] = os.path.join(tmp, f"{kind}.gguf")
                _build(kind, built[kind])
            status, resp = post(base, "/loadmodel", {
                "llama_model_path": built[kind], "model": name,
                "ctx_len": 256, "n_parallel": 1,
                "system_prompt": sys_p, "user_prompt": usr_p,
                "ai_prompt": ai_p})
            assert status == 200, resp
            body = {"model": name, "max_tokens": 12, "temperature": 0,
                    "stop": stops,
                    "messages": [{"role": "user", "content": "hello"}]}
            status, resp = post(base, "/v1/chat/completions", body)
            assert status == 200, resp
            text = resp["choices"][0]["message"]["content"]
            assert isinstance(text, str)
            for w in stops:
                assert w not in text, f"stop word {w!r} leaked into output"
            chunks = sse_chat(base, dict(body, stream=True))
            assert chunks and chunks[-1]["choices"][0].get(
                "finish_reason") in ("stop", "length")
            status, resp = post(base, "/unloadmodel", {"model": name})
            assert status == 200, resp
            print(f"[ok] {name:16s} ({kind}) {time.time()-t0:.1f}s")
        except Exception as e:  # noqa: BLE001 — sweep reports per-model
            failures.append((name, str(e)))
            print(f"[FAIL] {name}: {e}")
    srv.shutdown()
    print(f"{len(CONFIGS) - len(failures)}/{len(CONFIGS)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
