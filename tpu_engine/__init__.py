"""tpu_engine — a TPU-native quantized-inference serving engine.

Built from scratch in JAX/XLA/Pallas with the capability set of
janhq/cortex.llamacpp (see SURVEY.md for the reference analysis):
GGUF loading, block-quant (k-quant) weights with fused dequant+matmul
Pallas kernels, flash attention with quantized KV cache, a slot-based
continuous-batching serving runtime, and an OpenAI-compatible HTTP API.

Layering (TPU-native redesign of reference layers L1..L6,
SURVEY.md section 1):
  gguf/       GGUF v3 container parsing/writing          (ref L1: GGUF)
  quant/      block-quant formats, reference dequant      (ref L1: ggml quants)
  kernels/    Pallas TPU kernels (dequant-matmul, flash)  (ref L0/L1: ggml backends)
  model/      Llama-family forward graph as jitted fns    (ref L2: llama.cpp core)
  kvcache/    slot-paged KV arrays with seq ops           (ref L2: llama_kv_cache_*)
  tokenizer/  SPM + BPE from GGUF metadata                (ref L2: llama vocab)
  sampling/   penalty/top-k/top-p/... sampler chain       (ref L2: common_sampler)
  grammar/    GBNF + JSON-schema constrained decoding     (ref L2: llama grammar)
  serve/      slots, scheduler, continuous batching       (ref L3: llama_server_context)
  api/        OpenAI + cortex lifecycle HTTP endpoints    (ref L4-L6: llama_engine + server)
  dist/       mesh / GSPMD shardings / multi-host         (new: TPU-first parallelism)
  native/     C++ host library for load-path hot ops      (ref: native runtime pieces)
"""

__version__ = "0.1.0"
