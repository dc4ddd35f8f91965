"""End-to-end HTTP test mirroring the reference's e2e smoke flow
(.github/scripts/e2e-test-server.py: load chat model -> 2 streamed chat
completions -> embeddings from the LLM model -> unload -> load embedding
model -> embeddings -> unload; SURVEY.md section 4)."""

import base64
import json
import socket
import threading
import time
import urllib.request

import numpy as np
import pytest

from tests.models import build_test_gguf
from tpu_engine.api.server import make_server


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = tmp_path_factory.mktemp("srv")
    model_path = str(d / "tiny.gguf")
    build_test_gguf(model_path, "q8_0", seed=3)
    port = _free_port()
    srv = make_server("127.0.0.1", port)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", model_path
    srv.shutdown()
    srv.registry.unload_all()


def post(base, path, body, timeout=300.0):
    req = urllib.request.Request(
        base + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def get(base, path):
    with urllib.request.urlopen(base + path, timeout=60) as r:
        return r.status, json.loads(r.read())


def sse_chat(base, body, timeout=300.0):
    req = urllib.request.Request(
        base + "/v1/chat/completions", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    chunks = []
    with urllib.request.urlopen(req, timeout=timeout) as r:
        assert r.headers.get("Content-Type", "").startswith("text/event-stream")
        buf = b""
        for line in r:
            line = line.strip()
            if not line.startswith(b"data: "):
                continue
            payload = line[len(b"data: "):]
            if payload == b"[DONE]":
                break
            chunks.append(json.loads(payload))
    return chunks


def test_full_cortex_flow(server):
    base, model_path = server

    # 1) load model (reference e2e step 1)
    status, resp = post(base, "/loadmodel", {
        "llama_model_path": model_path,
        "model_alias": "tinyllama",
        "model": "tinyllama",
        "ctx_len": 256,
        "n_parallel": 2,
        "engine": "cortex.llamacpp",
    })
    assert status == 200, resp

    # 2) model status + models list
    status, resp = post(base, "/modelstatus", {"model": "tinyllama"})
    assert status == 200 and resp["model_loaded"]
    status, resp = get(base, "/models")
    assert status == 200
    assert resp["data"][0]["id"] == "tinyllama"
    assert int(resp["data"][0]["model_size"]) > 0

    # metrics exposition (beyond-reference observability)
    import urllib.request
    with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
        body = r.read().decode()
    assert "tpu_engine_models_loaded 1" in body
    assert 'tpu_engine_slots_busy{model="tinyllama"}' in body

    # 3) two streamed chat completions (reference runs 2)
    for i in range(2):
        chunks = sse_chat(base, {
            "model": "tinyllama",
            "stream": True,
            "max_tokens": 8,
            "temperature": 0,
            "messages": [{"role": "user", "content": f"hello world {i}"}],
            "stream_options": {"include_usage": True},
        })
        assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
        finishes = [c["choices"][0]["finish_reason"] for c in chunks if c["choices"]]
        assert finishes[-1] in ("stop", "length")
        usage = [c for c in chunks if c.get("usage")]
        assert usage and usage[-1]["usage"]["total_tokens"] > 0

    # 4) non-stream with logprobs
    status, resp = post(base, "/v1/chat/completions", {
        "model": "tinyllama",
        "max_tokens": 4,
        "temperature": 0,
        "logprobs": True,
        "top_logprobs": 3,
        "messages": [{"role": "user", "content": "hi"}],
    })
    assert status == 200
    choice = resp["choices"][0]
    assert resp["object"] == "chat.completion"
    assert resp["usage"]["completion_tokens"] > 0
    assert "logprobs" in choice and len(choice["logprobs"]["content"]) > 0
    assert len(choice["logprobs"]["content"][0]["top_logprobs"]) >= 3

    # 5) embeddings from the LLM model (reference e2e does exactly this)
    status, resp = post(base, "/v1/embeddings", {
        "model": "tinyllama",
        "input": ["hello world", "the quick brown fox"],
    })
    assert status == 200
    assert len(resp["data"]) == 2
    v = np.asarray(resp["data"][0]["embedding"])
    np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-4)

    # 5b) base64 encoding_format (reference llama_engine.cc:92-114)
    status, resp = post(base, "/v1/embeddings", {
        "model": "tinyllama", "input": "hello world", "encoding_format": "base64",
    })
    assert status == 200
    raw = base64.b64decode(resp["data"][0]["embedding"])
    v64 = np.frombuffer(raw, np.float32)
    np.testing.assert_allclose(np.linalg.norm(v64), 1.0, rtol=1e-4)

    # 6) token-array input form
    status, resp = post(base, "/v1/embeddings", {
        "model": "tinyllama", "input": [1, 5, 9],
    })
    assert status == 200 and len(resp["data"]) == 1

    # 7) wrong model id -> 409 (reference CheckModelLoaded)
    status, resp = post(base, "/v1/embeddings", {"model": "nope", "input": "x"})
    assert status == 409

    # 8) unload -> further status 409
    status, resp = post(base, "/unloadmodel", {"model": "tinyllama"})
    assert status == 200
    status, resp = post(base, "/modelstatus", {"model": "tinyllama"})
    assert status == 409

    # 9) load a REAL embedding model (reference e2e second phase loads
    # nomic-embed, a bert-family encoder, with model_type: embedding)
    from tests.test_bert import tiny_bert, wp_tokenizer_metadata
    from tpu_engine.tools.convert import hf_bert_to_gguf

    hf = tiny_bert()
    bert_path = model_path.replace("tiny.gguf", "bert.gguf")
    hf_bert_to_gguf(hf, bert_path, "f32", wp_tokenizer_metadata(),
                    pooling_type=1)
    status, resp = post(base, "/loadmodel", {
        "llama_model_path": bert_path,
        "model": "tinyembed",
        "model_type": "embedding",
        "n_parallel": 1,
        "ctx_len": 64,
    })
    assert status == 200, resp
    status, resp = post(base, "/v1/embeddings",
                        {"model": "tinyembed",
                         "input": "the quick brown fox"})
    assert status == 200
    got = np.asarray(resp["data"][0]["embedding"])
    np.testing.assert_allclose(np.linalg.norm(got), 1.0, rtol=1e-4)
    # cosine parity vs HF mean pooling + L2 (the bert graph end-to-end
    # through HTTP, WordPiece tokenization included)
    import torch
    from tpu_engine.tokenizer.tokenizer import Tokenizer
    ids = Tokenizer.from_gguf_metadata(wp_tokenizer_metadata()).encode(
        "the quick brown fox", add_special=True)
    with torch.no_grad():
        hid = hf(input_ids=torch.tensor([ids]),
                 attention_mask=torch.ones(1, len(ids), dtype=torch.long)
                 ).last_hidden_state[0].float().numpy()
    ref = hid.mean(axis=0)
    ref = ref / np.linalg.norm(ref)
    assert abs(float(got @ ref)) > 0.999
    # chat against the embedding model is a clean error, not a hang
    status, resp = post(base, "/v1/chat/completions", {
        "model": "tinyembed", "max_tokens": 4,
        "messages": [{"role": "user", "content": "x"}]})
    assert status == 500
    status, resp = post(base, "/unloadmodel", {"model": "tinyembed"})
    assert status == 200


def test_stream_logprobs_and_stopinferencing(server):
    """Streamed partials carry per-token logprobs when requested (reference
    SendPartialResponse completion_probabilities,
    llama_server_context.cc:933-949), finals carry timings; and
    /stopinferencing force-stops a stream mid-flight (reference
    llama_engine.cc:506-508,1278-1298)."""
    base, model_path = server
    status, resp = post(base, "/loadmodel", {
        "llama_model_path": model_path, "model": "streamy",
        "ctx_len": 256, "n_parallel": 2,
    })
    assert status == 200, resp

    # streamed logprobs
    chunks = sse_chat(base, {
        "model": "streamy", "stream": True, "max_tokens": 6,
        "temperature": 0, "logprobs": True, "top_logprobs": 2,
        "messages": [{"role": "user", "content": "count"}],
        "stream_options": {"include_usage": True},
    })
    lp_chunks = [c for c in chunks
                 if c["choices"] and c["choices"][0].get("logprobs")]
    assert lp_chunks, "no streamed chunk carried logprobs"
    ent = lp_chunks[0]["choices"][0]["logprobs"]["content"][0]
    assert len(ent["top_logprobs"]) >= 2 and isinstance(ent["logprob"], float)
    assert ent["bytes"] == list(ent["token"].encode("utf-8"))
    n_lp = sum(len(c["choices"][0]["logprobs"]["content"]) for c in lp_chunks)
    usage = [c for c in chunks if c.get("usage")][-1]["usage"]
    assert n_lp == usage["completion_tokens"]
    fin = [c for c in chunks if c["choices"] and c["choices"][0]["finish_reason"]]
    assert fin and fin[-1]["timings"]["predicted_n"] == usage["completion_tokens"]

    # /stopinferencing mid-stream: open the stream, read a chunk, stop
    req = urllib.request.Request(
        base + "/v1/chat/completions",
        data=json.dumps({
            "model": "streamy", "stream": True, "max_tokens": 200,
            "temperature": 0,
            "messages": [{"role": "user", "content": "go"}],
        }).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    n_content = 0
    t0 = time.time()
    with urllib.request.urlopen(req, timeout=300) as r:
        stopped = False
        for line in r:
            line = line.strip()
            if not line.startswith(b"data: "):
                continue
            payload = line[len(b"data: "):]
            if payload == b"[DONE]":
                break
            c = json.loads(payload)
            if c.get("choices") and c["choices"][0]["delta"].get("content"):
                n_content += 1
            if n_content == 2 and not stopped:
                stopped = True
                status, _ = post(base, "/stopinferencing", {"model": "streamy"})
                assert status == 200
    assert stopped and n_content < 150, n_content
    assert time.time() - t0 < 120

    status, _ = post(base, "/unloadmodel", {"model": "streamy"})
    assert status == 200


def test_load_errors(server):
    base, model_path = server
    status, resp = post(base, "/loadmodel", {"llama_model_path": "/nope.gguf",
                                             "model": "ghost"})
    assert status == 400
    status, resp = post(base, "/loadmodel", {})
    assert status == 400
    # chat against unloaded model
    status, resp = post(base, "/v1/chat/completions", {
        "model": "ghost", "messages": [{"role": "user", "content": "x"}]})
    assert status == 409
    # tensor_parallel="auto" with data_parallel > n_dev floors tp to 0:
    # must be a clean 400, not a degenerate zero-axis mesh (ADVICE r3)
    status, resp = post(base, "/loadmodel", {
        "llama_model_path": model_path, "model": "g2",
        "tensor_parallel": "auto", "data_parallel": 4096})
    assert status == 400
    assert "not a valid grid" in str(resp)


def test_multimodal_chat(server, tmp_path_factory):
    """mmproj load + image chat over HTTP: base64 data URL intake,
    [img-N] templating, decode-by-embedding (reference multimodal flow,
    llama_engine.cc:853-918)."""
    import base64 as b64

    from tests.test_clip import _png_bytes, tiny_hf_clip, write_mmproj

    base, model_path = server
    d = tmp_path_factory.mktemp("mm")
    # tiny llama n_embd must match the projector output
    from tpu_engine.model.loader import load_model

    n_embd = load_model(model_path).cfg.n_embd
    mm_path, _ = write_mmproj(str(d / "mmproj.gguf"), tiny_hf_clip(),
                              e_llm=n_embd)

    status, resp = post(base, "/loadmodel", {
        "model": "tinymm", "llama_model_path": model_path,
        "mmproj": mm_path, "ctx_len": 2048, "n_parallel": 1,
    })
    assert status == 200, resp
    data_url = "data:image/png;base64," + b64.b64encode(_png_bytes()).decode()
    status, resp = post(base, "/v1/chat/completions", {
        "model": "tinymm",
        "messages": [{"role": "user", "content": [
            {"type": "text", "text": "what is in "},
            {"type": "image_url", "image_url": {"url": data_url}},
        ]}],
        "max_tokens": 4, "temperature": 0.0,
    })
    assert status == 200, resp
    assert resp["choices"][0]["message"]["content"] is not None
    # 16 image tokens counted in usage
    assert resp["usage"]["prompt_tokens"] > 16
    status, resp = post(base, "/unloadmodel", {"model": "tinymm"})
    assert status == 200


def test_multimodal_mmproj_mismatch(server, tmp_path_factory):
    """Wrong-dim mmproj is rejected at load (reference
    llama_server_context.cc:217-230)."""
    from tests.test_clip import tiny_hf_clip, write_mmproj

    base, model_path = server
    d = tmp_path_factory.mktemp("mmbad")
    mm_path, _ = write_mmproj(str(d / "bad.gguf"), tiny_hf_clip(), e_llm=40)
    status, resp = post(base, "/loadmodel", {
        "model": "tinybad", "llama_model_path": model_path,
        "mmproj": mm_path,
    })
    assert status != 200
