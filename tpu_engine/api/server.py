"""HTTP server: cortex lifecycle + OpenAI inference endpoints.

Rebuilds the reference's example server + engine HTTP surface
(SURVEY.md section 1 L6; routes at /root/reference/examples/server/server.cc:253-261):

  POST   /loadmodel            POST /unloadmodel      POST /modelstatus
  GET    /models               DELETE /destroy
  POST   /v1/chat/completions  (SSE streaming + stream_options.include_usage)
  POST   /v1/embeddings        (string | [string] | [tokens] | [[tokens]])

Python stdlib ThreadingHTTPServer replaces httplib/dylib: the engine is a
library in-process, the serving process is this module (the dylib C-ABI
decoupling of the reference maps to the Python package boundary).

Run:  python -m tpu_engine.api.server --host 127.0.0.1 --port 3928
"""

from __future__ import annotations

import argparse
import json
import logging
import socket
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ..sampling import SamplingParams
from ..serve.registry import EngineRegistry, get_model_id
from ..serve.types import CompletionParams
from ..utils.text import random_id
from .openai import (
    chat_chunk,
    chat_completion_response,
    embedding_response,
    parse_chat_request,
    usage_chunk,
)

log = logging.getLogger("tpu_engine.api")


class EngineServer:
    def __init__(self):
        self.registry = EngineRegistry()


def _json_bytes(obj) -> bytes:
    return json.dumps(obj).encode("utf-8")


class Handler(BaseHTTPRequestHandler):
    server_version = "tpu-engine/0.1"
    protocol_version = "HTTP/1.1"
    registry: EngineRegistry = None  # type: ignore[assignment]

    def log_message(self, fmt, *args):  # route through our logger
        log.debug("%s " + fmt, self.client_address[0], *args)

    # -- helpers -------------------------------------------------------------
    def _body(self) -> dict | None:
        """Parsed JSON body, or None (400 already sent) when malformed."""
        length = int(self.headers.get("Content-Length", 0) or 0)
        if length == 0:
            return {}
        raw = self.rfile.read(length)
        try:
            obj = json.loads(raw)
        except json.JSONDecodeError:
            self._send_json({"error": "invalid JSON body"}, 400)
            return None
        if not isinstance(obj, dict):
            self._send_json({"error": "JSON body must be an object"}, 400)
            return None
        return obj

    def _send_json(self, obj, status: int = 200) -> None:
        data = _json_bytes(obj)
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _send_text(self, body: str, ctype: str = "text/plain") -> None:
        data = body.encode()
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        try:
            self.wfile.write(data)
            self.wfile.flush()
        except (BrokenPipeError, ConnectionResetError, socket.error):
            pass

    def _start_sse(self) -> None:
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.send_header("Cache-Control", "no-cache")
        self.send_header("Transfer-Encoding", "chunked")
        self.end_headers()

    def _sse(self, payload: str) -> bool:
        data = f"data: {payload}\n\n".encode("utf-8")
        chunk = f"{len(data):x}\r\n".encode() + data + b"\r\n"
        try:
            self.wfile.write(chunk)
            self.wfile.flush()
            return True
        except (BrokenPipeError, ConnectionResetError, socket.error):
            return False

    def _end_sse(self) -> None:
        try:
            self.wfile.write(b"0\r\n\r\n")
            self.wfile.flush()
        except (BrokenPipeError, ConnectionResetError, socket.error):
            pass

    # -- routing -------------------------------------------------------------
    def do_GET(self):
        if self.path == "/models":
            data = self.registry.list_models()
            self._send_json({"data": data, "object": "list"})
        elif self.path in ("/", "/health", "/healthz"):
            self._send_json({"status": "ok"})
        elif self.path == "/metrics":
            # Prometheus text exposition of the serving counters (neither
            # the reference nor upstream ships this; SURVEY.md section 5
            # lists observability as a gap worth exceeding)
            self._send_text(self.registry.metrics_text(),
                            "text/plain; version=0.0.4")
        else:
            self._send_json({"error": "not found"}, 404)

    def do_DELETE(self):
        if self.path == "/destroy":
            self._send_json({"message": "Program is exitting, goodbye!"})
            threading.Thread(target=self.server.shutdown, daemon=True).start()
        else:
            self._send_json({"error": "not found"}, 404)

    def do_POST(self):
        try:
            if self.path == "/loadmodel":
                self._handle_loadmodel()
            elif self.path == "/unloadmodel":
                self._handle_unloadmodel()
            elif self.path == "/modelstatus":
                self._handle_modelstatus()
            elif self.path == "/stopinferencing":
                self._handle_stop_inferencing()
            elif self.path == "/v1/chat/completions":
                self._handle_chat()
            elif self.path == "/v1/embeddings":
                self._handle_embeddings()
            else:
                self._send_json({"error": "not found"}, 404)
        except (BrokenPipeError, ConnectionResetError):
            pass
        except Exception as e:  # per-request isolation
            log.exception("request failed")
            try:
                self._send_json({"error": str(e)}, 500)
            except Exception:
                pass

    # -- lifecycle endpoints ---------------------------------------------------
    def _handle_loadmodel(self):
        body = self._body()
        if body is None:
            return
        ok, msg = self.registry.load_model(body)
        if ok:
            self._send_json({"status": {"is_done": True}, "message": msg})
        else:
            self._send_json({"error": msg}, 400)

    def _handle_unloadmodel(self):
        body = self._body()
        if body is None:
            return
        model_id = get_model_id(body)
        ok, msg = self.registry.unload_model(model_id)
        self._send_json({"message": msg} if ok else {"error": msg}, 200 if ok else 400)

    def _handle_modelstatus(self):
        body = self._body()
        if body is None:
            return
        model_id = get_model_id(body)
        st = self.registry.model_status(model_id)
        if st is None:
            self._send_json({"model_loaded": False,
                             "message": f"Model {model_id} has not been loaded"}, 409)
        else:
            self._send_json(st)

    def _handle_stop_inferencing(self):
        """Reference ABI verb StopInferencing (enginei.h:54-62,
        llama_engine.cc:506-508,1278-1298): flag the model so in-flight
        streams cancel at their next result poll."""
        body = self._body()
        if body is None:
            return
        model_id = get_model_id(body)
        if self.registry.check_loaded(model_id) is None:
            self._send_json({
                "error": f"Model {model_id} has not been loaded"}, 409)
            return
        self.registry.stop_inferencing(model_id)
        self._send_json({"message": f"Stopping inference of model {model_id}"})

    # -- inference endpoints ----------------------------------------------------
    def _handle_chat(self):
        body = self._body()
        if body is None:
            return
        model_id = get_model_id(body)
        entry = self.registry.check_loaded(model_id)
        if entry is None:
            self._send_json({
                "error": f"Model {model_id} has not been loaded, "
                         "please load model into cortex.llamacpp"}, 409)
            return
        self.registry.n_chats += 1
        params, meta = parse_chat_request(body, entry.prompts,
                                          caching_enabled=entry.opts["caching_enabled"])
        if entry.opts.get("grammar") and not params.sampling.grammar:
            params.sampling.grammar = entry.opts["grammar"]
        engine = entry.engine

        if params.stream:
            self._stream_chat(engine, params, meta, entry)
            return

        n = meta["n"]
        task_ids = [engine.request_completion(params) for _ in range(n)]
        finals = []
        for tid in task_ids:
            while True:
                r = engine.next_result(tid)
                if r.error:
                    self._send_json({"error": r.error_message}, 500)
                    return
                if r.stop:
                    finals.append(r)
                    break
        self._send_json(chat_completion_response(finals, meta))

    def _stream_chat(self, engine, params: CompletionParams, meta: dict, entry):
        tid = engine.request_completion(params)
        rid = "chatcmpl-" + random_id()
        model = meta["model"]
        self._start_sse()
        self._sse(json.dumps(chat_chunk(rid, model, "", None, role=True)))
        prompt_tokens = completion_tokens = 0
        while True:
            if self.registry.should_stop(entry.model_id):
                self.registry.clear_stop(entry.model_id)
                engine.request_cancel(tid)
            r = engine.next_result(tid)
            if r.error:
                self._sse(json.dumps({"error": r.error_message}))
                break
            prompt_tokens = r.tokens_evaluated
            completion_tokens = r.tokens_predicted
            want_probs = meta.get("logprobs_requested")
            if r.stop:
                if r.text:
                    self._sse(json.dumps(chat_chunk(
                        rid, model, r.text, None,
                        probs=r.probs if want_probs else None)))
                finish = "stop" if r.stop_reason.value in ("eos", "word") else "length"
                self._sse(json.dumps(chat_chunk(rid, model, None, finish,
                                                timings=r.timings)))
                if meta["include_usage"]:
                    self._sse(json.dumps(usage_chunk(rid, model, prompt_tokens,
                                                     completion_tokens)))
                break
            alive = self._sse(json.dumps(chat_chunk(
                rid, model, r.text, None,
                probs=r.probs if want_probs else None)))
            if not alive:
                # client disconnected -> force-stop (reference server.cc:136-158)
                engine.request_cancel(tid)
                while True:
                    r2 = engine.next_result(tid, timeout=30.0)
                    if r2.stop or r2.error:
                        break
                return
        self._sse("[DONE]")
        self._end_sse()

    def _handle_embeddings(self):
        body = self._body()
        if body is None:
            return
        model_id = get_model_id(body)
        entry = self.registry.check_loaded(model_id)
        if entry is None:
            self._send_json({
                "error": f"Model {model_id} has not been loaded, "
                         "please load model into cortex.llamacpp"}, 409)
            return
        engine = entry.engine
        inp = body.get("input", body.get("prompt", ""))
        # input forms (reference llama_engine.cc:1134-1203)
        prompts: list = []
        if isinstance(inp, str):
            prompts = [inp]
        elif isinstance(inp, list):
            if inp and all(isinstance(x, int) for x in inp):
                prompts = [inp]
            else:
                prompts = list(inp)
        task_ids = []
        for p in prompts:
            cp = CompletionParams(prompt=p, embedding=True, n_predict=0,
                                  sampling=SamplingParams(), cache_prompt=False)
            task_ids.append(engine.request_completion(cp))
        embeddings = []
        total_tokens = 0
        for tid in task_ids:
            r = engine.next_result(tid)
            if r.error:
                self._send_json({"error": r.error_message}, 500)
                return
            embeddings.append(r.embedding or [])
            total_tokens += r.tokens_evaluated
        is_b64 = body.get("encoding_format", "float") == "base64"
        self._send_json(embedding_response(
            embeddings, {"model": body.get("model", model_id)}, total_tokens,
            base64_format=is_b64))


def make_server(host: str, port: int) -> ThreadingHTTPServer:
    registry = EngineRegistry()

    class BoundHandler(Handler):
        pass

    BoundHandler.registry = registry
    srv = ThreadingHTTPServer((host, port), BoundHandler)
    srv.registry = registry  # type: ignore[attr-defined]
    return srv


def main(argv=None) -> int:
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=3928)
    ap.add_argument("--log-level", default="INFO")
    ap.add_argument("--log-file", default="",
                    help="write logs to a circular (line-capped) file, like "
                         "the reference's FileLogger")
    ap.add_argument("--max-log-lines", type=int, default=100_000)
    ap.add_argument("--platform", default=os.environ.get("TPU_ENGINE_PLATFORM", ""),
                    help="force a JAX platform (e.g. cpu); needed because "
                         "some containers preimport jax before JAX_PLATFORMS "
                         "is read")
    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    logging.basicConfig(level=args.log_level.upper(),
                        format="%(asctime)s %(levelname)s %(name)s %(message)s")
    srv = make_server(args.host, args.port)
    if args.log_file:
        srv.registry.set_file_logger(  # type: ignore[attr-defined]
            args.max_log_lines, args.log_file)
    log.info("tpu-engine server listening on %s:%d", args.host, args.port)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.registry.unload_all()  # type: ignore[attr-defined]
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
