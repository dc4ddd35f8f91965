"""BERT-family encoder forward: the embedding-model graph.

TPU-native rebuild of the capability behind the reference's dedicated
embedding models (nomic-embed-text, /root/reference/Makefile:6; loaded as
`model_type: embedding` by .github/scripts/e2e-test-server.py phase 2, and
pooled via llama_get_embeddings_seq with the model's pooling type,
/root/reference/src/llama_server_context.cc:1042-1058).

Two arch variants, as in upstream llama.cpp:
  - "bert": learned absolute position embeddings, token-type embeddings,
    post-norm LayerNorm(+bias) blocks, biased projections, GELU FFN.
  - "nomic-bert": rope (neox) instead of position embeddings, SwiGLU FFN
    (gate|up), otherwise the same LayerNorm skeleton.

Encoding is a single bidirectional pass over a right-padded [B, T] batch —
no KV cache, no decode loop. Pooling (mean/cls/last) happens in-graph; the
serving layer L2-normalizes, matching the reference's
common_embd_normalize (llama_server_context.cc:1058).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .llama import NEG_INF, apply_rope, rope_cos_sin  # noqa: F401
from .weights import embed_rows, qmatmul


def layer_norm(x: jax.Array, w: jax.Array, b: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    inv = jax.lax.rsqrt(jnp.mean(xc * xc, axis=-1, keepdims=True) + eps)
    return ((xc * inv).astype(x.dtype) * w + b).astype(x.dtype)


def _proj(x, lw, name):
    y = qmatmul(x, lw[name])
    b = lw.get(name + "_b")
    return y + b if b is not None else y


def _encode(
    weights: dict,
    tokens: jax.Array,  # [B, T] int32, right-padded
    n_valid: jax.Array,  # [B] int32
    cfg: ModelConfig,
    pooling: str = "",  # "" -> cfg.pooling_type
):
    """Bidirectional encode + pool. Returns [B, n_embd] f32 (unnormalized)."""
    B, T = tokens.shape
    H, D = cfg.n_head, cfg.head_dim
    dtype = weights["token_embd_norm"].dtype

    x = embed_rows(weights["token_embd"], tokens, dtype)  # [B, T, E]
    if "token_types" in weights:
        # single-segment inputs: type id 0 everywhere (the reference's
        # embedding flow never sets segment B)
        x = x + weights["token_types"][0].astype(dtype)
    if "position_embd" in weights:
        x = x + weights["position_embd"][:T].astype(dtype)
    x = layer_norm(x, weights["token_embd_norm"], weights["token_embd_norm_b"],
                   cfg.rms_eps)

    pos = jnp.arange(T, dtype=jnp.int32)
    valid = pos[None, :] < n_valid[:, None]  # [B, T]
    # bidirectional mask: every valid query attends every valid key
    mask = valid[:, None, :]  # [B, 1(q), T(k)]

    for lw in weights["layers"]:
        q = _proj(x, lw, "wq").reshape(B, T, H, D)
        k = _proj(x, lw, "wk").reshape(B, T, H, D)
        v = _proj(x, lw, "wv").reshape(B, T, H, D)
        if "position_embd" not in weights:  # nomic-bert: rope positions
            q = apply_rope(q, pos[None, :], cfg)
            k = apply_rope(k, pos[None, :], cfg)
        scores = jnp.einsum(
            "bthd,buhd->bhtu", q.astype(jnp.float32), k.astype(jnp.float32)
        ) * jnp.float32(D ** -0.5)
        scores = jnp.where(mask[:, None, :, :], scores, NEG_INF)
        p = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhtu,buhd->bthd", p, v.astype(jnp.float32))
        attn = attn.reshape(B, T, H * D).astype(dtype)
        attn = _proj(attn, lw, "wo")
        x = layer_norm(x + attn, lw["attn_norm"], lw["attn_norm_b"], cfg.rms_eps)

        if "w_gate" in lw:  # nomic-bert SwiGLU
            ffn = _proj(jax.nn.silu(_proj(x, lw, "w_gate"))
                        * _proj(x, lw, "w_up"), lw, "w_down")
        else:
            h = jax.nn.gelu(_proj(x, lw, "w_up").astype(jnp.float32),
                            approximate=False).astype(dtype)
            ffn = _proj(h, lw, "w_down")
        x = layer_norm(x + ffn, lw["ffn_norm"], lw["ffn_norm_b"], cfg.rms_eps)

    xf = x.astype(jnp.float32)
    mode = pooling or cfg.pooling_type
    if mode == "cls":
        return xf[:, 0]
    if mode == "last":
        return xf[jnp.arange(B), jnp.maximum(n_valid - 1, 0)]
    vf = valid[..., None].astype(jnp.float32)
    return jnp.sum(xf * vf, axis=1) / jnp.maximum(
        n_valid[:, None].astype(jnp.float32), 1.0)


encode = partial(jax.jit, static_argnames=("cfg", "pooling"))(_encode)
