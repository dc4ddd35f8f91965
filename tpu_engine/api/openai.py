"""OpenAI request/response adaptation + role-based prompt templating.

Rebuilds the reference's LlamaEngine request surface (SURVEY.md section 2a
"LlamaEngine", "ChatCompletionRequest"): defaults from
/root/reference/src/chat_completion_request.h:60-107, templating from
llama_engine.cc:816-918, default stop words from :925-929, SSE/usage/
logprobs shaping from :939-1112 and :124-178.
"""

from __future__ import annotations

import base64
import logging
import re
import time
from dataclasses import dataclass, field

from ..sampling import SamplingParams
from ..serve.types import CompletionParams, StopReason
from ..utils.text import random_id

log = logging.getLogger("tpu_engine.api")


@dataclass
class ModelPrompts:
    """Per-model role template strings (reference llama_engine.cc:662-669)."""

    user_prompt: str = "USER: "
    ai_prompt: str = "ASSISTANT: "
    system_prompt: str = "ASSISTANT's RULE: "
    pre_prompt: str = ""


_DATA_URL_RE = re.compile(r"data:image/[^;]+;base64,(.*)", re.DOTALL)


def _decode_image_url(url: str) -> bytes | None:
    """base64 data URL or local file path -> raw image bytes (reference
    llama_engine.cc:874-893, llama_utils.h:20-31 extractBase64 /
    processLocalImage; remote http URLs unsupported, as in the reference)."""
    if url.startswith("http"):
        log.info("remote image detected but not supported yet")
        return None
    m = _DATA_URL_RE.match(url)
    if m:
        try:
            return base64.b64decode(m.group(1))
        except Exception:
            return None
    try:
        with open(url, "rb") as f:
            return f.read()
    except OSError:
        return None


def flatten_content(content, images: list | None = None) -> str:
    """Flatten OpenAI content arrays; images become 0-based [img-N]
    markers and their decoded bytes are appended to `images` (reference
    llama_engine.cc:853-918)."""
    if isinstance(content, str):
        return content
    if isinstance(content, list):
        out = []
        for part in content:
            if not isinstance(part, dict):
                continue
            if part.get("type") == "text":
                out.append(part.get("text", ""))
            elif part.get("type") == "image_url":
                url = part.get("image_url", {})
                url = url.get("url", "") if isinstance(url, dict) else str(url)
                data = _decode_image_url(url)
                if data is not None and images is not None:
                    out.append(f"[img-{len(images)}]")
                    images.append(data)
        return "".join(out)
    return str(content) if content is not None else ""


def apply_template(messages: list, prompts: ModelPrompts,
                   images: list | None = None) -> str:
    """Role-based prompt assembly (reference llama_engine.cc:816-918)."""
    out = prompts.pre_prompt
    for msg in messages:
        role = msg.get("role", "user")
        content = flatten_content(msg.get("content"), images)
        if role == "user":
            prefix = prompts.user_prompt
        elif role == "assistant":
            prefix = prompts.ai_prompt
        elif role == "system":
            prefix = prompts.system_prompt
        else:
            prefix = ""
        out += prefix + content
    out += prompts.ai_prompt
    return out


def parse_chat_request(body: dict, prompts: ModelPrompts,
                       caching_enabled: bool = True) -> tuple[CompletionParams, dict]:
    """OpenAI chat request -> CompletionParams (+ response meta).

    Defaults mirror chat_completion_request.h:60-107.
    """
    sp = SamplingParams(
        temperature=float(body.get("temperature", 0.8)),
        top_p=float(body.get("top_p", 0.95)),
        top_k=int(body.get("top_k", 40)),
        min_p=float(body.get("min_p", 0.05)),
        typical_p=float(body.get("typ_p", body.get("typical_p", 1.0))),
        repeat_last_n=int(body.get("repeat_last_n", 64)),
        repeat_penalty=float(body.get("repeat_penalty", 1.1)),
        frequency_penalty=float(body.get("frequency_penalty", 0.0)),
        presence_penalty=float(body.get("presence_penalty", 0.0)),
        mirostat=int(body.get("mirostat", 0)),
        mirostat_tau=float(body.get("mirostat_tau", 5.0)),
        mirostat_eta=float(body.get("mirostat_eta", 0.1)),
        seed=int(body["seed"]) if "seed" in body and body["seed"] is not None else None,
        dynatemp_range=float(body.get("dynatemp_range", 0.0)),
        dynatemp_exponent=float(body.get("dynatemp_exponent", 1.0)),
        ignore_eos=bool(body.get("ignore_eos", False)),
        grammar=str(body.get("grammar", "")),
    )

    # logprobs / top_logprobs / n_probs reconciliation
    # (chat_completion_request.h:149-157)
    n_probs = int(body.get("n_probs", 0))
    if bool(body.get("logprobs", False)):
        top_logprobs = int(body.get("top_logprobs", 0) or 0)
        n_probs = max(n_probs, top_logprobs, 1)
    sp.n_probs = n_probs

    # logit_bias: OpenAI object {token_id: bias} or array form
    # (chat_completion_request.h:94-106)
    lb = body.get("logit_bias")
    if isinstance(lb, dict):
        sp.logit_bias = {int(k): float(v) for k, v in lb.items()}
    elif isinstance(lb, list):
        sp.logit_bias = {int(t): float(v) for t, v in lb if True}

    messages = body.get("messages", [])
    images: list = []
    prompt = apply_template(messages, prompts, images)

    stops = [str(s) for s in (body.get("stop") or [])]
    # default stop words (reference llama_engine.cc:925-929)
    stops.append("<|im_end|>")
    if prompts.user_prompt.strip():
        stops.append(prompts.user_prompt.rstrip())

    json_schema = None
    rf = body.get("response_format")
    if isinstance(rf, dict):
        ty = rf.get("type")
        if ty == "json_schema":
            js = rf.get("json_schema", {})
            json_schema = js.get("schema", js) or {}
        elif ty == "json_object":
            json_schema = rf.get("schema", {}) or {}

    params = CompletionParams(
        prompt=prompt,
        n_predict=int(body.get("max_tokens", 500)),
        stream=bool(body.get("stream", False)),
        stop=stops,
        sampling=sp,
        cache_prompt=caching_enabled,
        n_keep=int(body.get("n_keep", 0)),
        json_schema=json_schema,
        images=images,
    )
    # shared KV system prefix ({"prompt": ...} object or plain string;
    # reference ProcessSystemPromptData, llama_server_context.cc:668-680)
    sys_p = body.get("system_prompt")
    if isinstance(sys_p, dict):
        params.system_prompt = str(sys_p.get("prompt", ""))
    elif isinstance(sys_p, str):
        params.system_prompt = sys_p
    meta = {
        "model": str(body.get("model", "unknown")),
        "include_usage": bool((body.get("stream_options") or {}).get("include_usage", False)),
        "n": max(int(body.get("n", 1)), 1),
        "logprobs_requested": bool(body.get("logprobs", False)) or n_probs > 0,
    }
    return params, meta


# -- response shaping ---------------------------------------------------------

def _finish_reason(r) -> str:
    return "stop" if r.stop_reason in (StopReason.EOS, StopReason.WORD) else "length"


def _logprobs_content(probs: list, tok=None) -> dict:
    """OpenAI logprobs block with UTF-8 byte arrays
    (reference llama_engine.cc:124-178)."""
    content = []
    for entry in probs:
        top = entry["top"]
        if not top:
            continue
        sel = top[0]
        content.append({
            "token": sel["piece"],
            "logprob": sel["logprob"],
            "bytes": list(sel["piece"].encode("utf-8")),
            "top_logprobs": [
                {
                    "token": t["piece"],
                    "logprob": t["logprob"],
                    "bytes": list(t["piece"].encode("utf-8")),
                }
                for t in top
            ],
        })
    return {"content": content}


def chat_completion_response(results: list, meta: dict) -> dict:
    """Non-stream response, n-choices fan-out (reference :1044-1112)."""
    created = int(time.time())
    rid = "chatcmpl-" + random_id()
    choices = []
    prompt_tokens = 0
    completion_tokens = 0
    for i, r in enumerate(results):
        choice = {
            "index": i,
            "message": {"role": "assistant", "content": r.text},
            "finish_reason": _finish_reason(r),
        }
        if meta.get("logprobs_requested") and r.probs:
            choice["logprobs"] = _logprobs_content(r.probs)
        choices.append(choice)
        prompt_tokens = max(prompt_tokens, r.tokens_evaluated)
        completion_tokens += r.tokens_predicted
    return {
        "id": rid,
        "object": "chat.completion",
        "created": created,
        "model": meta.get("model", "unknown"),
        "system_fingerprint": "fp_tpu_engine",
        "choices": choices,
        "usage": {
            "prompt_tokens": prompt_tokens,
            "completion_tokens": completion_tokens,
            "total_tokens": prompt_tokens + completion_tokens,
        },
        "timings": results[0].timings if results else {},
    }


def chat_chunk(rid: str, model: str, delta_content: str | None,
               finish_reason: str | None, role: bool = False,
               probs: list | None = None,
               timings: dict | None = None) -> dict:
    """One SSE chunk (reference :958-1009). When the request asked for
    logprobs, partial results carry the delta's per-token probabilities
    (reference SendPartialResponse completion_probabilities,
    llama_server_context.cc:933-949) in the OpenAI streaming shape."""
    delta: dict = {}
    if role:
        delta["role"] = "assistant"
    if delta_content is not None:
        delta["content"] = delta_content
    choice: dict = {"index": 0, "delta": delta, "finish_reason": finish_reason}
    if probs:
        choice["logprobs"] = _logprobs_content(probs)
    out = {
        "id": rid,
        "object": "chat.completion.chunk",
        "created": int(time.time()),
        "model": model,
        "system_fingerprint": "fp_tpu_engine",
        "choices": [choice],
    }
    if timings:
        out["timings"] = timings
    return out


def usage_chunk(rid: str, model: str, prompt_tokens: int, completion_tokens: int) -> dict:
    return {
        "id": rid,
        "object": "chat.completion.chunk",
        "created": int(time.time()),
        "model": model,
        "system_fingerprint": "fp_tpu_engine",
        "choices": [],
        "usage": {
            "prompt_tokens": prompt_tokens,
            "completion_tokens": completion_tokens,
            "total_tokens": prompt_tokens + completion_tokens,
        },
    }


def embedding_response(embeddings: list, meta: dict, n_prompt_tokens: int,
                       base64_format: bool = False) -> dict:
    """Reference: HandleEmbeddingImpl response (llama_engine.cc:1206-1219)."""
    from ..utils.text import floats_to_base64

    data = []
    for i, emb in enumerate(embeddings):
        data.append({
            "embedding": floats_to_base64(emb) if base64_format else emb,
            "index": i,
            "object": "embedding",
        })
    return {
        "data": data,
        "model": meta.get("model", "unknown"),
        "object": "list",
        "usage": {"prompt_tokens": n_prompt_tokens, "total_tokens": n_prompt_tokens},
    }
