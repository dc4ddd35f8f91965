"""Model hyperparameters parsed from GGUF metadata.

Replaces the hparam loading llama.cpp performs inside
common_init_from_params (reference call site
/root/reference/src/llama_server_context.cc:207; SURVEY.md section 2b).
Architecture support targets the reference's weekend e2e matrix
(.github/scripts/e2e-test-server-weekend.py: llama3/3.1, gemma/gemma2,
phi3, mistral, openhermes, tinyllama, qwen2).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np


# Architectures that share the llama compute graph (RMSNorm/RoPE/GQA/SwiGLU).
LLAMA_LIKE = {"llama", "mistral", "qwen2", "stablelm", "tinyllama"}
# Bidirectional encoder families (embedding models — the reference's
# nomic-embed flow, /root/reference/Makefile:6): LayerNorm+bias graph,
# non-causal attention, pooled output (model/bert.py).
ENCODER_ARCHS = {"bert", "nomic-bert"}
KNOWN_ARCHS = LLAMA_LIKE | {"gemma", "gemma2", "phi3"} | ENCODER_ARCHS

# llama.cpp pooling-type enum (llama.h llama_pooling_type; consumed by the
# reference at llama_server_context.cc:1042-1058)
POOLING_TYPES = {0: "last", 1: "mean", 2: "cls", 3: "last", 4: "cls"}


@dataclass(eq=False)  # identity hash/eq: each loaded model owns one config,
class ModelConfig:     # which jit treats as a static argument
    arch: str
    n_layer: int
    n_embd: int
    n_head: int
    n_kv_head: int
    head_dim: int
    n_ff: int
    n_vocab: int
    n_ctx_train: int
    rms_eps: float
    rope_theta: float
    rope_dim: int
    rope_type: str  # "norm" (interleaved pairs) | "neox" (split halves)
    act: str = "silu"  # "silu" | "gelu"
    qkv_bias: bool = False
    tie_embeddings: bool = False
    embedding_scale: float = 1.0  # gemma scales embeddings by sqrt(n_embd)
    attn_logit_softcap: float = 0.0  # gemma2
    final_logit_softcap: float = 0.0  # gemma2
    post_norms: bool = False  # gemma2 post-attention/post-ffn norms
    # sliding-window attention: window size (0 = disabled) applied on
    # even-indexed layers when swa_alternate (gemma2's local/global pattern)
    sliding_window: int = 0
    swa_alternate: bool = False
    rope_scaling: float = 1.0  # linear/yarn factor (freq_scale = 1/factor)
    # rope scaling flavor: "none" | "linear" | "yarn". llama-3.1-style
    # per-frequency factor curves arrive as the rope_freqs.weight tensor
    # (loaded into rope_freqs by model/loader.py) — llama.cpp divides each
    # inverse frequency by its factor; so do we.
    rope_scaling_type: str = "none"
    rope_orig_ctx: int = 0  # rope.scaling.original_context_length
    yarn_attn_factor: float = 1.0  # rope.scaling.attn_factor
    yarn_beta_fast: float = 32.0  # correction-range betas (llama.cpp defaults)
    yarn_beta_slow: float = 1.0
    rope_freqs: tuple = ()  # per-pair divisors from rope_freqs.weight
    # attention logit scale; 0 -> the default 1/sqrt(head_dim). gemma2-27b
    # scales queries by 1/sqrt(n_embd/n_head)=1/sqrt(144) instead (llama.cpp
    # keys this off MODEL_27B; HF query_pre_attn_scalar=144)
    attn_scale: float = 0.0
    # encoder families (bert/nomic-bert): bidirectional attention, LayerNorm
    # with bias instead of RMSNorm, pooled embedding output
    causal: bool = True
    pooling_type: str = "mean"  # mean | cls | last
    n_type_vocab: int = 0  # token-type embedding rows (bert)
    extra: dict = field(default_factory=dict)

    def attention_scale(self) -> float:
        return self.attn_scale if self.attn_scale > 0 else self.head_dim ** -0.5

    @property
    def gqa_groups(self) -> int:
        return self.n_head // self.n_kv_head

    @classmethod
    def from_gguf_metadata(cls, md: dict) -> "ModelConfig":
        arch = str(md.get("general.architecture", "llama"))

        def g(key, default=None):
            v = md.get(f"{arch}.{key}", default)
            return v

        if arch in ENCODER_ARCHS:
            return cls._encoder_from_gguf(arch, md)
        n_embd = int(g("embedding_length"))
        n_head = int(g("attention.head_count"))
        n_kv_head = int(g("attention.head_count_kv", n_head))
        head_dim = int(g("attention.key_length", n_embd // n_head))
        rope_dim = int(g("rope.dimension_count", head_dim))
        # rope convention: llama-family GGUFs store Wq/Wk permuted for the
        # interleaved ("norm") rotation; neox-lineage archs use split halves.
        rope_type = "neox" if arch in ("qwen2", "stablelm", "phi3", "gemma", "gemma2") else "norm"
        cfg = cls(
            arch=arch,
            n_layer=int(g("block_count")),
            n_embd=n_embd,
            n_head=n_head,
            n_kv_head=n_kv_head,
            head_dim=head_dim,
            n_ff=int(g("feed_forward_length")),
            n_vocab=len(md["tokenizer.ggml.tokens"]) if "tokenizer.ggml.tokens" in md
            else int(g("vocab_size")),
            n_ctx_train=int(g("context_length", 2048)),
            rms_eps=float(g("attention.layer_norm_rms_epsilon", 1e-5)),
            rope_theta=float(g("rope.freq_base", 10000.0)),
            rope_dim=rope_dim,
            rope_type=rope_type,
            act="gelu" if arch.startswith("gemma") else "silu",
            qkv_bias=arch == "qwen2",
            embedding_scale=float(n_embd) ** 0.5 if arch.startswith("gemma") else 1.0,
            attn_logit_softcap=float(g("attn_logit_softcapping", 0.0)) if arch == "gemma2" else 0.0,
            final_logit_softcap=float(g("final_logit_softcapping", 0.0)) if arch == "gemma2" else 0.0,
            post_norms=arch == "gemma2",
        )
        scale = md.get(f"{arch}.rope.scaling.factor")
        if scale:
            cfg.rope_scaling = float(scale)
        stype = md.get(f"{arch}.rope.scaling.type")
        if stype:
            cfg.rope_scaling_type = str(stype)
        elif scale:
            cfg.rope_scaling_type = "linear"
        cfg.rope_orig_ctx = int(
            g("rope.scaling.original_context_length", 0) or 0)
        af = g("rope.scaling.attn_factor")
        if af:
            cfg.yarn_attn_factor = float(af)
        sw = g("attention.sliding_window")
        if sw:
            cfg.sliding_window = int(sw)
            cfg.swa_alternate = arch == "gemma2"
        # explicit query scale wins; else the gemma2-27b shape (n_embd 4608)
        # uses 1/sqrt(n_embd/n_head) like llama.cpp's MODEL_27B switch
        # pooling for /v1/embeddings: explicit metadata wins; a causal LLM
        # without it matches the reference's effective behavior — pooling
        # NONE falls back to the last token's hidden state
        # (llama_get_embeddings_ith, llama_server_context.cc:1042-1045)
        pt = g("pooling_type")
        cfg.pooling_type = (POOLING_TYPES.get(int(pt), "mean")
                            if pt is not None else "last")
        qpas = g("attention.query_pre_attn_scalar")
        if qpas:
            cfg.attn_scale = float(qpas) ** -0.5
        elif arch == "gemma2" and n_embd == 4608:
            cfg.attn_scale = (n_embd / n_head) ** -0.5
        return cfg

    @classmethod
    def _encoder_from_gguf(cls, arch: str, md: dict) -> "ModelConfig":
        """bert / nomic-bert encoder hparams (the reference's embedding-model
        families; nomic-embed via /root/reference/Makefile:6). LayerNorm
        epsilon reuses the rms_eps field; rope fields only matter for
        nomic-bert (bert uses learned position embeddings)."""

        def g(key, default=None):
            return md.get(f"{arch}.{key}", default)

        n_embd = int(g("embedding_length"))
        n_head = int(g("attention.head_count"))
        eps = g("attention.layer_norm_epsilon",
                g("attention.layer_norm_rms_epsilon", 1e-12))
        pooling = POOLING_TYPES.get(int(g("pooling_type", 1) or 1), "mean")
        return cls(
            arch=arch,
            n_layer=int(g("block_count")),
            n_embd=n_embd,
            n_head=n_head,
            n_kv_head=n_head,
            head_dim=n_embd // n_head,
            n_ff=int(g("feed_forward_length")),
            n_vocab=len(md["tokenizer.ggml.tokens"])
            if "tokenizer.ggml.tokens" in md else int(g("vocab_size")),
            n_ctx_train=int(g("context_length", 512)),
            rms_eps=float(eps),
            rope_theta=float(g("rope.freq_base", 10000.0)),
            rope_dim=n_embd // n_head,
            rope_type="neox",
            act="gelu",
            causal=False,
            pooling_type=pooling,
            n_type_vocab=int(g("attention.token_type_count", 2) or 2),
        )

    def rope_freq_table(self) -> tuple[tuple, float]:
        """(inv_freq [rope_dim//2] as a tuple of floats, mscale).

        The effective per-pair inverse frequencies with ALL rope scaling
        folded in — the single source the model graph, the flash-attention
        rope tables, and shift_compact's re-rope all read:

        - llama-3.1 factor curves: rope_freqs.weight divides each frequency
          (upstream ggml freq_factors semantics; the reference serves
          llama3.1 via its weekend matrix,
          /root/reference/.github/scripts/e2e-test-server-weekend.py:30-35).
        - linear: every frequency multiplied by freq_scale = 1/factor.
        - yarn: NTK-by-parts — frequencies below the beta_fast correction
          dim stay extrapolated, above beta_slow fully interpolated, ramped
          between (ggml rope_yarn math); cos/sin magnitudes scale by
          mscale = attn_factor * (1 + 0.1 ln(factor)).

        Since angles are linear in position, interpolation folds into the
        frequency table once; mscale is the only other output.
        """
        cached = self.extra.get("_rope_table")
        if cached is not None:
            return cached
        half = self.rope_dim // 2
        inv = self.rope_theta ** (
            -np.arange(half, dtype=np.float64) / half)
        if self.rope_freqs:
            inv = inv / np.asarray(self.rope_freqs, np.float64)
        mscale = 1.0
        stype = self.rope_scaling_type
        if stype == "yarn" and self.rope_scaling != 1.0 and self.rope_orig_ctx:
            fs = 1.0 / self.rope_scaling
            # correction dims (ggml rope_yarn_corr_dims): dim below which
            # wavelengths complete >= beta rotations inside the original ctx
            def corr(beta):
                return (self.rope_dim
                        * math.log(self.rope_orig_ctx / (beta * 2 * math.pi))
                        / (2 * math.log(self.rope_theta)))
            low = max(0.0, math.floor(corr(self.yarn_beta_fast)))
            high = min(self.rope_dim - 1.0, math.ceil(corr(self.yarn_beta_slow)))
            i0 = np.arange(half, dtype=np.float64) * 2
            ramp_mix = 1.0 - np.minimum(
                1.0, np.maximum(0.0, (i0 / 2 - low) / max(high - low, 0.001)))
            # theta = interp*(1-mix) + extrap*mix, linear in pos
            inv = inv * (fs * (1.0 - ramp_mix) + ramp_mix)
            mscale = self.yarn_attn_factor * (
                1.0 + 0.1 * math.log(self.rope_scaling))
        elif self.rope_scaling != 1.0:
            inv = inv / self.rope_scaling
        out = (tuple(float(x) for x in inv.astype(np.float32)), float(mscale))
        self.extra["_rope_table"] = out
        return out

    def layer_window(self, li: int) -> int:
        """Sliding window for layer li (0 = global). gemma2 alternates:
        even-indexed layers are local (matches HF Gemma2 is_sliding)."""
        if self.sliding_window <= 0:
            return 0
        if self.swa_alternate and li % 2 == 1:
            return 0
        return self.sliding_window
