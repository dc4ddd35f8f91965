"""Multi-model engine registry — the LlamaEngine analog.

Rebuilds the reference's model lifecycle (SURVEY.md section 2a "LlamaEngine";
/root/reference/src/llama_engine.cc): /loadmodel JSON -> engine options
(:547-732), model registry keyed by model id (llama_engine.h:68-85),
warm-up (:1247-1267), status/inventory (:447-504), force-stop set
(:1278-1298).
"""

from __future__ import annotations

import logging
import os
import threading
import time

import jax.numpy as jnp

from ..api.openai import ModelPrompts
from ..model.loader import LoadedModel, load_model
from .engine import InferenceEngine
from .types import CompletionParams

log = logging.getLogger("tpu_engine.registry")

# KV cache types the reference accepts (llama_engine.cc:25-47: f16/q8_0/q4_0)
VALID_KV_TYPES = {"f16", "q8_0", "q4_0"}


def get_model_id(body: dict) -> str:
    """Reference: llama_utils::GetModelId (llama_utils.h:153-177):
    model -> model_alias -> basename(llama_model_path|model_path)."""
    for key in ("model", "model_alias"):
        v = body.get(key)
        if v:
            return str(v)
    for key in ("llama_model_path", "model_path"):
        v = body.get(key)
        if v:
            base = os.path.basename(str(v))
            return base[:-5] if base.endswith(".gguf") else base
    return ""


class ModelEntry:
    def __init__(self, model_id: str, engine: InferenceEngine, model: LoadedModel,
                 prompts: ModelPrompts, opts: dict):
        self.model_id = model_id
        self.engine = engine
        self.model = model
        self.prompts = prompts
        self.opts = opts
        self.start_time = time.time()
        self.vram_bytes = model.model_size_bytes  # device-resident weights
        self.ram_bytes = 0


class EngineRegistry:
    """Thread-safe model_id -> engine map (reference server_map_,
    llama_engine.h:84-85)."""

    def __init__(self):
        self._models: dict[str, ModelEntry] = {}
        self._lock = threading.Lock()
        self._force_stop: set[str] = set()  # reference fsi_mtx_/force-stop set
        self.n_chats = 0
        self.start_time = time.time()

    # -- lifecycle -----------------------------------------------------------
    def load_model(self, body: dict) -> tuple[bool, str]:
        """Reference: LoadModel/LoadModelImpl (llama_engine.cc:363-423,547-732)."""
        model_id = get_model_id(body)
        if not model_id:
            return False, "No model id found in request"
        with self._lock:
            if model_id in self._models:
                # reference behavior: warn + success (llama_engine.cc:371-380)
                return True, f"Model {model_id} already loaded"
        path = body.get("llama_model_path") or body.get("model_path")
        if not path or not os.path.exists(path):
            return False, f"Model path does not exist: {path}"

        # log knobs (reference EngineLoadOption, enginei.h:15-25: log path,
        # max log lines, log level — consumable at load time here since we
        # have no separate engine-dylib Load step)
        if body.get("log_path"):
            self.set_file_logger(int(body.get("max_log_lines", 100_000)),
                                 str(body["log_path"]))
        if body.get("log_level"):
            self.set_log_level(str(body["log_level"]))

        cache_type = str(body.get("cache_type", "f16")).lower()
        if cache_type not in VALID_KV_TYPES:
            log.warning("unsupported cache_type %s, using f16", cache_type)
            cache_type = "f16"
        import jax as _jax

        if _jax.devices()[0].platform == "tpu":
            # fused dequant+matmul is unconditionally the right choice on
            # TPU (falls back internally for shapes it can't tile)
            from ..kernels import dequant_matmul as _dm

            _dm.enable()
        # default ON for TPU: the Pallas kernels are strictly faster than
        # XLA attention here (the reference defaults false for CUDA
        # edge-case reasons that don't apply)
        flash_attn = bool(body.get("flash_attn", True))
        if cache_type != "f16":
            # reference force-enables flash attention for quantized KV
            # (llama_engine.cc:639-647)
            flash_attn = True
        if flash_attn:
            import jax

            if jax.devices()[0].platform == "tpu":
                from ..kernels import flash_attention as _fa

                _fa.enable()
            else:
                log.info("flash_attn requested on %s: keeping XLA attention"
                         " (Pallas kernels are TPU-targeted)",
                         jax.devices()[0].platform)

        n_ctx = int(body.get("ctx_len", 2048))
        n_parallel = int(body.get("n_parallel", 1))
        model_type = str(body.get("model_type", "llm"))
        is_embedding = bool(body.get("embedding", model_type == "embedding"))

        # tensor parallelism across the attached chips (TPU-native addition;
        # the reference is single-device — SURVEY.md section 2c). The Pallas
        # kernels run per-shard via shard_map (dist/tp.py).
        tp_req = body.get("tensor_parallel", 1)
        dp_size = int(body.get("data_parallel", 1))  # slot-sharded replicas
        import jax as _jx
        n_dev = len(_jx.devices())
        tp_size = (n_dev // max(dp_size, 1) if str(tp_req) == "auto"
                   else int(tp_req))
        if tp_size < 1 or dp_size < 1:
            # "auto" with data_parallel > n_dev floors to 0, which would
            # otherwise slip past the product guard (0 > n_dev is false)
            # and build a zero-size "model" mesh axis
            return False, (f"tensor_parallel={tp_size} x data_parallel="
                           f"{dp_size} is not a valid grid for {n_dev} "
                           f"attached devices")
        mesh = None
        if tp_size > 1 or dp_size > 1:
            from ..dist import tp as _tp

            if tp_size * dp_size > n_dev:
                return False, (f"tensor_parallel={tp_size} x data_parallel="
                               f"{dp_size} but only {n_dev} devices attached")
            if dp_size > 1 and n_parallel % dp_size:
                return False, (f"data_parallel={dp_size} requires n_parallel "
                               f"({n_parallel}) divisible by it")
            mesh = _tp.tp_mesh(tp_size, n_data=dp_size)
            lm = load_model(str(path),
                            sharder=_tp.TPSharder(mesh) if tp_size > 1
                            else None)
            try:
                _tp.validate_tp(lm.cfg, lm.weights, tp_size)
            except ValueError as e:
                return False, str(e)
        else:
            lm = load_model(str(path))

        # multimodal: mmproj clip model (reference LoadModel,
        # llama_server_context.cc:182-242)
        clip = None
        mmproj = body.get("mmproj")
        if mmproj:
            if not os.path.exists(str(mmproj)):
                return False, f"mmproj path does not exist: {mmproj}"
            from ..clipvit.model import load_clip

            try:
                clip = load_clip(str(mmproj))
            except Exception as e:
                return False, f"unable to load clip model: {e}"
            if clip.n_embd_out != lm.cfg.n_embd:
                return False, (
                    f"embedding dim of the multimodal projector "
                    f"({clip.n_embd_out}) is not equal to that of the LLM "
                    f"({lm.cfg.n_embd}); use the matching mmproj file")
            # images need room (reference :195-205: >=2048; llava-1.6 4096)
            min_ctx = 4096 if clip.cfg.is_anyres else 2048
            if n_ctx < min_ctx:
                n_ctx = min_ctx

        if not lm.cfg.causal:
            # bidirectional embedding model (bert family — the reference's
            # nomic-embed flow): dedicated encoder engine, no decode loop
            from .encoder import EncoderEngine

            engine = EncoderEngine(lm, n_ctx=n_ctx)
            try:
                engine.warm_up()
            except Exception as e:
                return False, f"warm-up failed: {e}"
            prompts = ModelPrompts()
            opts = {
                "caching_enabled": False,
                "model_type": "embedding",
                "embedding": True,
                "grammar": "",
                "ctx_len": engine.n_ctx,
                "n_parallel": 1,
            }
            entry = ModelEntry(model_id, engine, lm, prompts, opts)
            entry.load_body = dict(body)
            with self._lock:
                self._models[model_id] = entry
            log.info("embedding model %s loaded (pooling=%s)",
                     model_id, lm.cfg.pooling_type)
            return True, f"Model {model_id} loaded successfully"

        # knob parity with the reference's LoadModelImpl
        # (llama_engine.cc:569-570,610,618,649-650): n_ubatch maps to our
        # prefill bucket cap (the jitted-chunk analog of ggml's micro-
        # batch); ngl / use_mmap / mlock are device-memory knobs with no
        # TPU meaning (weights are always device-resident; PARITY.md §2c)
        # — acknowledged and logged, never silently dropped.
        n_batch = int(body.get("n_batch", 2048))
        n_ubatch = int(body.get("n_ubatch", n_batch))
        for knob in ("ngl", "use_mmap", "mlock"):
            if knob in body:
                log.info("load knob %s=%r acknowledged: not applicable on "
                         "TPU (weights are device-resident)",
                         knob, body[knob])

        engine = InferenceEngine(
            lm,
            n_ctx=n_ctx,
            n_parallel=n_parallel,
            n_batch=min(n_batch, n_ubatch),
            cont_batching=bool(body.get("cont_batching", True)),
            ctx_shift=bool(body.get("ctx_shift", True)),
            grp_attn_n=int(body.get("grp_attn_n", 1)),
            grp_attn_w=int(body.get("grp_attn_w", 512)),
            cache_type=cache_type,
            clip=clip,
            mesh=mesh,
        )
        prompts = ModelPrompts(
            user_prompt=str(body.get("user_prompt", "USER: ")),
            ai_prompt=str(body.get("ai_prompt", "ASSISTANT: ")),
            system_prompt=str(body.get("system_prompt", "ASSISTANT's RULE: ")),
            pre_prompt=str(body.get("pre_prompt", "")),
        )
        grammar_file = str(body.get("grammar_file", ""))
        grammar_text = ""
        if grammar_file:
            try:
                with open(grammar_file) as f:
                    grammar_text = f.read()
            except OSError as e:
                return False, f"cannot read grammar_file: {e}"

        opts = {
            "caching_enabled": bool(body.get("caching_enabled", True)),
            "model_type": model_type,
            "embedding": is_embedding,
            "grammar": grammar_text,
            "ctx_len": n_ctx,
            "n_parallel": n_parallel,
        }
        entry = ModelEntry(model_id, engine, lm, prompts, opts)
        entry.load_body = dict(body)  # preemption-tolerant reload recipe
        with self._lock:
            self._models[model_id] = entry
        if model_type == "llm":
            try:
                engine.warm_up()
            except Exception as e:  # warm-up failure is fatal for the load
                with self._lock:
                    self._models.pop(model_id, None)
                engine.shutdown()
                return False, f"warm-up failed: {e}"
        log.info("model %s loaded", model_id)
        return True, f"Model {model_id} loaded successfully"

    def unload_model(self, model_id: str) -> tuple[bool, str]:
        with self._lock:
            entry = self._models.pop(model_id, None)
        if entry is None:
            return False, f"Model {model_id} has not been loaded"
        entry.engine.shutdown()
        return True, f"Model {model_id} unloaded successfully"

    def get(self, model_id: str) -> ModelEntry | None:
        with self._lock:
            return self._models.get(model_id)

    def check_loaded(self, model_id: str) -> ModelEntry | None:
        """Reference: CheckModelLoaded (llama_engine.cc:1225-1245), plus
        preemption tolerance (SURVEY.md section 5 TPU addition): an engine
        marked failed (device lost / repeated runtime errors) is torn down
        and the model reloaded from its GGUF before serving."""
        entry = self.get(model_id)
        if entry is not None and getattr(entry.engine, "failed", False):
            log.warning("engine for %s failed; reloading model", model_id)
            body = getattr(entry, "load_body", None)
            with self._lock:
                self._models.pop(model_id, None)
            try:
                entry.engine.shutdown()
            except Exception:
                pass
            if not body:
                return None
            ok, msg = self.load_model(body)
            if not ok:
                log.error("preemption reload of %s failed: %s", model_id, msg)
                return None
            return self.get(model_id)
        return entry

    def metrics_text(self) -> str:
        """Prometheus text exposition of the serving counters (beyond the
        reference, which only has no_of_requests_/no_of_chats_ internals —
        llama_engine.h:90-91)."""
        import time as _t

        with self._lock:
            total_requests = sum(
                e.engine.n_requests for e in self._models.values())
        lines = [
            "# TYPE tpu_engine_requests_total counter",
            f"tpu_engine_requests_total {total_requests}",
            "# TYPE tpu_engine_chats_total counter",
            f"tpu_engine_chats_total {self.n_chats}",
            "# TYPE tpu_engine_uptime_seconds gauge",
            f"tpu_engine_uptime_seconds {_t.time() - self.start_time:.1f}",
            "# TYPE tpu_engine_models_loaded gauge",
        ]
        with self._lock:
            entries = list(self._models.values())
        lines.append(f"tpu_engine_models_loaded {len(entries)}")
        lines.append("# TYPE tpu_engine_slots_busy gauge")
        lines.append("# TYPE tpu_engine_engine_requests_total counter")
        for e in entries:
            busy = sum(1 for sl in e.engine.slots if sl.is_processing())
            lines.append(
                f'tpu_engine_slots_busy{{model="{e.model_id}"}} {busy}')
            lines.append(
                f'tpu_engine_engine_requests_total{{model="{e.model_id}"}} '
                f"{e.engine.n_requests}")
        return "\n".join(lines) + "\n"

    def model_status(self, model_id: str) -> dict | None:
        entry = self.get(model_id)
        if entry is None:
            return None
        return {
            "model_loaded": True,
            "model_data": {
                "frame_count": 0,
                "ctx_len": entry.opts["ctx_len"],
                "n_parallel": entry.opts["n_parallel"],
            },
        }

    def list_models(self) -> list[dict]:
        """Reference: GetModels (llama_engine.cc:447-504) incl. the custom
        ram/vram patch (patches/0001-Add-API-query-buffer-size.patch)."""
        out = []
        with self._lock:
            entries = list(self._models.values())
        for e in entries:
            out.append({
                "id": e.model_id,
                "engine": "tpu-engine",
                "start_time": int(e.start_time * 1000),
                "vram": str(e.vram_bytes),
                "ram": str(e.ram_bytes),
                "object": "model",
                "model_size": str(e.model.model_size_bytes),
            })
        return out

    def unload_all(self) -> None:
        with self._lock:
            entries = list(self._models.values())
            self._models.clear()
        for e in entries:
            e.engine.shutdown()

    # -- force stop (reference llama_engine.cc:506-508, 1278-1298) ----------
    def set_file_logger(self, max_lines: int, path: str) -> None:
        """EngineI::SetFileLogger analog (/root/reference/base/cortex-common/
        enginei.h:64-66): route all tpu_engine logs into a circular
        (line-capped) file, replacing any previous file handler."""
        from ..utils.logger import CircularFileHandler

        root = logging.getLogger("tpu_engine")
        for h in list(root.handlers):
            if isinstance(h, CircularFileHandler):
                root.removeHandler(h)
                h.close()
        handler = CircularFileHandler(path, max_lines or 100_000)
        handler.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s %(name)s %(message)s"))
        root.addHandler(handler)
        log.info("file logger -> %s (max %d lines)", path, max_lines)

    def set_log_level(self, level: str) -> None:
        """EngineI::SetLogLevel analog (enginei.h:67)."""
        logging.getLogger("tpu_engine").setLevel(level.upper())

    def stop_inferencing(self, model_id: str) -> None:
        self._force_stop.add(model_id)

    def should_stop(self, model_id: str) -> bool:
        return model_id in self._force_stop

    def clear_stop(self, model_id: str) -> None:
        self._force_stop.discard(model_id)
