"""Llama-family forward graph as fixed-shape jit-able step functions.

TPU-native rebuild of the decode path the reference reaches through
llama_decode (/root/reference/src/llama_server_context.cc:1628-1635;
SURVEY.md section 2b "Decode & batching"). One traced function serves both
prefill chunks (B=1, Tc=bucket) and batched decode (B=n_slots, Tc=1); the
serving loop picks the right compiled executable per bucket — the
fixed-shape answer to ggml's ragged batches (SURVEY.md section 7 "Dynamic
shapes vs XLA").

Graph: RMSNorm -> {q,k,v} proj -> RoPE (norm or neox) -> slot-paged cache
append -> GQA attention (K rotated at attention time by cell index; see
kvcache/cache.py) -> o proj -> residual -> RMSNorm -> SwiGLU/GeGLU -> residual.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..kvcache.cache import KVCache, append_step, dequant_kv
from .config import ModelConfig
from .weights import QTensor, embed_rows, qmatmul

NEG_INF = -1e30


def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * inv).astype(x.dtype) * w


def rope_cos_sin(pos: jax.Array, cfg: ModelConfig):
    """cos/sin tables for positions. pos: [...]; returns [..., rope_dim//2].

    Frequencies come from cfg.rope_freq_table(), which folds linear / yarn /
    llama-3.1 freq-factor scaling into one effective inverse-frequency
    vector; yarn's attention-magnitude scale multiplies both tables (applied
    to Q and K like upstream ggml's rope, so scores carry mscale^2)."""
    inv_freq_t, mscale = cfg.rope_freq_table()
    inv_freq = jnp.asarray(inv_freq_t, jnp.float32)
    ang = pos.astype(jnp.float32)[..., None] * inv_freq
    if mscale != 1.0:
        return jnp.cos(ang) * mscale, jnp.sin(ang) * mscale
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jax.Array, pos: jax.Array, cfg: ModelConfig) -> jax.Array:
    """x: [..., T, H, D], pos broadcastable to [..., T]. Applied in f32."""
    rd = cfg.rope_dim
    cos, sin = rope_cos_sin(pos, cfg)
    cos = cos[..., None, :]  # [..., T, 1, rd/2]
    sin = sin[..., None, :]
    xf = x.astype(jnp.float32)
    xr, x_pass = xf[..., :rd], xf[..., rd:]
    if cfg.rope_type == "norm":
        xe = xr[..., 0::2]
        xo = xr[..., 1::2]
        re = xe * cos - xo * sin
        ro = xe * sin + xo * cos
        rot = jnp.stack([re, ro], axis=-1).reshape(xr.shape)
    else:  # neox: split halves
        x1 = xr[..., : rd // 2]
        x2 = xr[..., rd // 2 :]
        rot = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return jnp.concatenate([rot, x_pass], axis=-1).astype(x.dtype) if x_pass.size else rot.astype(x.dtype)


def apply_rope_storage(x: jax.Array, pos: jax.Array, cfg: ModelConfig) -> jax.Array:
    """Split-half ("neox") rotation of STORAGE-ORDER K rows
    x [..., KH, Tc, D] by positions pos [..., Tc] (leading dims broadcast;
    e.g. x [L, B, KH, Tc, D] with pos [1, B, Tc]). Equivalent values to
    apply_rope on the head-major view, but computed WITHOUT a transpose
    between the rope output and the cache update — a transpose there makes
    XLA layout-assign the whole KV cache transposed and insert a
    full-cache relayout copy every step (see kvcache._put_slot_windows;
    measured +2.1 ms/step)."""
    rd, half = cfg.rope_dim, cfg.rope_dim // 2
    cos, sin = rope_cos_sin(pos, cfg)
    cos = cos[..., None, :, :]  # [..., 1(KH), Tc, half]
    sin = sin[..., None, :, :]
    xf = x.astype(jnp.float32)
    x1, x2, rest = xf[..., :half], xf[..., half:rd], xf[..., rd:]
    rot = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    if rest.shape[-1]:
        rot = jnp.concatenate([rot, rest], axis=-1)
    return rot.astype(x.dtype)


def self_extend_pos(pos: jax.Array, ga_n: jax.Array, ga_w: jax.Array) -> jax.Array:
    """Grouped self-extend position remap (SURVEY.md section 2b
    "Self-extend / group attention"): positions beyond the window w are
    grouped by factor n: p -> p//n + w*(1 - 1/n) boundary-consistent form
    p < w: p ; p >= w: w + (p - w)//n. ga_n==1 disables."""
    remapped = jnp.where(pos < ga_w, pos, ga_w + (pos - ga_w) // jnp.maximum(ga_n, 1))
    return jnp.where(ga_n > 1, remapped, pos)


def _act(x: jax.Array, kind: str) -> jax.Array:
    if kind == "gelu":
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.silu(x)


def attention_reference(
    q: jax.Array,  # [B, Tc, H, D] rotated
    cache: KVCache,  # full cache [L, S, KH, T, D*] (DEFERRED: this step's
    li: int,  #         rows are NOT in it — they arrive as k_new/v_new)
    slot_ids: jax.Array,  # [B] int32
    q_pos: jax.Array,  # [B, Tc] absolute positions of the queries
    n_valid: jax.Array,  # [B] real tokens per row
    k_new: jax.Array,  # [B, KH, Tc, D] this step's K rows, ROTATED
    v_new: jax.Array,  # [B, KH, Tc, D]
    cfg: ModelConfig,
    ga_n: jax.Array,
    ga_w: jax.Array,
    rot_cache: bool = False,
    win: jax.Array | int | None = None,  # sliding window; None -> from cfg
) -> jax.Array:
    """Reference (XLA) attention over the slot cache + in-flight rows.
    Returns [B, Tc, H, D]. rot_cache: K cells stored pre-rotated
    (kvcache/cache.py) — skip the rotation here. li and win may be TRACED
    values (the layer-scanned forward passes them per scan step).

    Cell index == position (kvcache invariant): cache cells < start =
    q_pos[:, 0] are valid history (K rotated here by its possibly
    self-extend-remapped cell index; quantized cells dequantized first);
    the step's own tokens attend causally within the in-flight block.

    Head counts come from the ARRAYS (not cfg) so shard_map-local slices
    under tensor parallelism (dist/tp.py) work unchanged.
    """
    B, Tc = q.shape[0], q.shape[1]
    H, D = q.shape[2], q.shape[3]
    KH = k_new.shape[1]
    G = H // KH
    ks = cache.k_scale[li, slot_ids] if cache.k_scale is not None else None
    vs = cache.v_scale[li, slot_ids] if cache.v_scale is not None else None
    kc, vc = cache.k[li, slot_ids], cache.v[li, slot_ids]
    if cache.layout == "dt":  # [B, KH, D*, T] -> [B, KH, T, D*] (the XLA
        kc = jnp.swapaxes(kc, -1, -2)  # reference path is CPU/correctness
        vc = jnp.swapaxes(vc, -1, -2)  # only; the Pallas kernels read the
    kf = dequant_kv(kc, ks, cache.kind)  # transposed form natively)
    vf = dequant_kv(vc, vs, cache.kind)  # [B, KH, T, D]
    T = kf.shape[2]
    cell = jnp.arange(T, dtype=jnp.int32)[None, :].repeat(B, 0)  # [B, T]
    kf = jnp.swapaxes(kf, 1, 2)  # [B, T, KH, D] for apply_rope
    if not rot_cache:
        kf = apply_rope(kf, self_extend_pos(cell, ga_n, ga_w), cfg)
    kf = kf.astype(jnp.float32)
    vf = jnp.swapaxes(vf, 1, 2)

    # key axis = [T cache cells | Tc in-flight rows]
    kf = jnp.concatenate([kf, jnp.swapaxes(k_new, 1, 2).astype(jnp.float32)], axis=1)
    vf = jnp.concatenate([vf, jnp.swapaxes(v_new, 1, 2).astype(jnp.float32)], axis=1)

    qf = q.reshape(B, Tc, KH, G, D).astype(jnp.float32)
    scores = jnp.einsum("btkgd,bukd->btkgu", qf, kf) * jnp.float32(cfg.attention_scale())
    if cfg.attn_logit_softcap > 0:
        c = cfg.attn_logit_softcap
        scores = jnp.tanh(scores / c) * c
    start = q_pos[:, 0]
    mask_cache = jnp.broadcast_to(
        cell[:, None, :] < start[:, None, None], (B, Tc, T)
    )
    t_rel = jnp.arange(Tc, dtype=jnp.int32)
    mask_new = (t_rel[None, None, :] <= t_rel[None, :, None]) & (
        t_rel[None, None, :] < n_valid[:, None, None]
    )  # [B, Tc(q), Tc(kv)]
    window = cfg.layer_window(li) if win is None else win
    if win is not None or (isinstance(window, int) and window > 0):
        # sliding-window attention (gemma2 local layers): key position
        # must be within [q_pos - window + 1, q_pos]. With a traced window
        # (layer-scanned forward) w <= 0 disables via a huge limit.
        w = jnp.asarray(window, jnp.int32)
        lim = jnp.where(w > 0, w, jnp.int32(2**30))
        mask_cache = mask_cache & (
            cell[:, None, :] > q_pos[..., None] - lim
        )
        mask_new = mask_new & (
            (start[:, None, None] + t_rel[None, None, :])
            > (start[:, None, None] + t_rel[None, :, None]) - lim
        )
    mask = jnp.concatenate([mask_cache, jnp.broadcast_to(mask_new, (B, Tc, Tc))],
                           axis=2)
    scores = jnp.where(mask[:, :, None, None, :], scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("btkgu,bukd->btkgd", p, vf)
    return out.reshape(B, Tc, H, D).astype(q.dtype)


# Pallas attention hook (kernels/flash_attention.py installs TPU kernels).
_ATTN_IMPL = attention_reference


def set_attention_impl(fn) -> None:
    global _ATTN_IMPL
    _ATTN_IMPL = fn


def get_attention_impl():
    return _ATTN_IMPL


def _forward(
    weights: dict,
    cache: KVCache,
    tokens: jax.Array,  # [B, Tc] int32
    slot_ids: jax.Array,  # [B] int32 cache slots
    active: jax.Array,  # [B] bool — inactive rows neither write nor bump
    cfg: ModelConfig,
    ga_n: jax.Array | int = 1,
    ga_w: jax.Array | int = 0,
    n_valid: jax.Array | None = None,
    collect_hidden: bool = False,
    embd: jax.Array | None = None,
    tp_axis: str | None = None,
    rot_cache: bool = False,
):
    """One engine step over a [B, Tc] token block.

    n_valid [B]: number of real tokens per row (rows are right-padded to the
    bucket length Tc; pad tokens neither write to the cache nor count).

    embd [B, Tc, E]: when given, decode these embeddings instead of token
    ids (the image-token path — reference llava_embd_batch decode,
    llama_server_context.cc:5-37,1092-1108).

    Returns (logits [B, n_vocab] for the last VALID token of each row,
    new_cache, pooled_hidden [B, n_embd] or None).

    tp_axis: mesh axis name when running INSIDE shard_map under tensor
    parallelism (dist/tp.py): weights arrive as local shards (heads / ffn
    columns / vocab rows local), attention + MLP reduce partial sums with
    psum, and vocab-sharded logits are all-gathered. None = single shard.

    rot_cache: store K ROTATED (upstream llama.cpp design — the engine
    enables it when self-extend is off): attention skips per-cell rotation
    and context shift re-ropes moved cells (kvcache.shift_compact).
    """
    B, Tc = tokens.shape
    T = cache.max_len
    H, KH, D = cfg.n_head, cfg.n_kv_head, cfg.head_dim
    dtype = weights["output_norm"].dtype

    ga_n = jnp.asarray(ga_n, jnp.int32)
    ga_w = jnp.asarray(ga_w, jnp.int32)
    if n_valid is None:
        n_valid = jnp.full((B,), Tc, jnp.int32)

    start = cache.lengths[slot_ids]  # [B]
    q_pos = start[:, None] + jnp.arange(Tc, dtype=jnp.int32)[None, :]  # [B, Tc]

    if embd is not None:
        x = embd.astype(dtype)  # image tokens decode as-is (no embd scale)
    else:
        x = embed_rows(weights["token_embd"], tokens, dtype)  # [B, Tc, E]
        if cfg.embedding_scale != 1.0:
            x = x * jnp.asarray(cfg.embedding_scale, dtype)

    layers = weights["layers"]
    stacked = isinstance(layers, dict)

    def layer_step(x, lw, li, win):
        """One transformer layer. li/win may be traced (scan path with
        lw = the STACKED weights dict: quantized matmuls index the layer
        slab inside the Pallas kernel via li — a scalar-prefetch operand,
        never an XLA dynamic-slice copy; small per-layer arrays (norms,
        biases) are sliced normally). Returns (x, k_store, v_store) with
        k/v_store the UNROTATED storage-order [B, KH, Tc, D] rows."""

        def arr(name):  # small per-layer arrays
            a = lw[name]
            return a[li] if stacked else a

        def mm(h, name):
            return qmatmul(h, lw[name], li if stacked else None)

        h = rms_norm(x, arr("attn_norm"), cfg.rms_eps)
        if "wqkv" in lw:  # load-time fused q|k|v (model/loader.py)
            hqkv = mm(h, "wqkv")
            if "bqkv" in lw:
                hqkv = hqkv + arr("bqkv")
            hq = hqkv[..., : H * D]
            hk = hqkv[..., H * D : (H + KH) * D]
            hv = hqkv[..., (H + KH) * D :]
        else:
            hq = mm(h, "wq")
            hk = mm(h, "wk")
            hv = mm(h, "wv")
            if "bq" in lw:
                hq = hq + arr("bq")
                hk = hk + arr("bk")
                hv = hv + arr("bv")
        # -1: under TP the local head counts are H/p, KH/p (shard_map
        # slices the projection weights; shapes carry the truth)
        hq = hq.reshape(B, Tc, -1, D)
        hk = hk.reshape(B, Tc, -1, D)
        hv = hv.reshape(B, Tc, -1, D)

        q_rot = apply_rope(hq, self_extend_pos(q_pos, ga_n, ga_w), cfg)

        # DEFERRED append (kvcache docstring): attention sees this step's
        # rows in-flight; the cache write happens once after the layer
        # loop. Rows are collected in storage order [B, KH, Tc, D]; under
        # rot_cache the rotation of the STORED rows happens once on the
        # stacked [L, ...] array below (keeping the per-layer graph feeding
        # the cache DUS untouched — see _put_slot_windows layout hazard).
        k_new_rot = apply_rope_storage(
            jnp.swapaxes(hk, 1, 2), self_extend_pos(q_pos, ga_n, ga_w), cfg
        )  # [B, KH, Tc, D]
        k_store = jnp.swapaxes(hk, 1, 2)
        v_store = jnp.swapaxes(hv, 1, 2)

        attn = _ATTN_IMPL(
            q_rot, cache, li, slot_ids, q_pos, n_valid,
            k_new_rot, v_store, cfg, ga_n, ga_w,
            rot_cache=rot_cache, win=win,
        )
        attn = attn.reshape(B, Tc, attn.shape[2] * D)
        attn = mm(attn, "wo")
        if tp_axis is not None:
            # row-parallel wo: every shard holds a partial sum over its
            # local heads (Megatron pattern; SURVEY.md section 2c TP row)
            attn = jax.lax.psum(attn, tp_axis)
        if cfg.post_norms:
            attn = rms_norm(attn, arr("post_attn_norm"), cfg.rms_eps)
        x = x + attn

        h = rms_norm(x, arr("ffn_norm"), cfg.rms_eps)
        if "w_gateup" in lw:  # load-time fused gate|up (model/loader.py)
            gu = mm(h, "w_gateup")
            nf = gu.shape[-1] // 2
            gate = _act(gu[..., :nf], cfg.act)
            up = gu[..., nf:]
        else:
            gate = _act(mm(h, "w_gate"), cfg.act)
            up = mm(h, "w_up")
        ffn = mm(gate * up, "w_down")
        if tp_axis is not None:
            ffn = jax.lax.psum(ffn, tp_axis)
        if cfg.post_norms:
            ffn = rms_norm(ffn, arr("post_ffn_norm"), cfg.rms_eps)
        return x + ffn, k_store, v_store

    if stacked:
        # SCANNED layers (loader stacks uniform layers,
        # weights.stack_layer_dicts): XLA compiles ONE layer body instead
        # of n_layer unrolled copies — compile time and executable size
        # drop ~n_layer-fold (the round-2 warm-up was 330 s of exactly
        # this). Only the layer index and sliding window ride as scan xs;
        # the stacked weights are CLOSED OVER and indexed inside the
        # kernels, so no per-step weight copies are made.
        wins = jnp.asarray(
            [cfg.layer_window(i) for i in range(cfg.n_layer)], jnp.int32)
        li_arr = jnp.arange(cfg.n_layer, dtype=jnp.int32)

        def body(xc, per):
            li, win = per
            xo, k_store, v_store = layer_step(xc, layers, li, win)
            return xo, (k_store, v_store)

        x, (k_stack, v_stack) = jax.lax.scan(body, x, (li_arr, wins))
    else:  # legacy per-layer list: unrolled loop
        new_k_rows, new_v_rows = [], []
        for li in range(cfg.n_layer):
            x, k_store, v_store = layer_step(
                x, layers[li], li, cfg.layer_window(li))
            new_k_rows.append(k_store)
            new_v_rows.append(v_store)
        k_stack = jnp.stack(new_k_rows)
        v_stack = jnp.stack(new_v_rows)

    x = rms_norm(x, weights["output_norm"], cfg.rms_eps)

    if collect_hidden == "all":
        # full final hidden states (perplexity eval: the caller projects
        # every position through the output head)
        pooled = x.astype(jnp.float32)
    elif collect_hidden == "cls":
        # first-token pooling (reference pooling-type CLS,
        # llama_get_embeddings_seq via llama_server_context.cc:1042)
        pooled = x[:, 0].astype(jnp.float32)
    elif collect_hidden == "last":
        # last-valid-token pooling (pooling LAST / the NONE->ith fallback)
        pooled = x[jnp.arange(B), jnp.maximum(n_valid - 1, 0)].astype(jnp.float32)
    elif collect_hidden:
        # mean pooling over the valid tokens (llama.cpp mean pooling analog)
        valid = (jnp.arange(Tc, dtype=jnp.int32)[None, :] < n_valid[:, None])[..., None]
        hidden_sum = jnp.sum(jnp.where(valid, x.astype(jnp.float32), 0.0), axis=1)
        pooled = hidden_sum / jnp.maximum(n_valid[:, None], 1)
    else:
        pooled = None

    last = x[jnp.arange(B), jnp.maximum(n_valid - 1, 0)]  # [B, E]
    logits = qmatmul(last, weights["output"]).astype(jnp.float32)  # [B, V]
    if tp_axis is not None and logits.shape[-1] < cfg.n_vocab:
        # vocab-sharded output head: gather the full row for sampling
        logits = jax.lax.all_gather(logits, tp_axis, axis=-1, tiled=True)
    if cfg.final_logit_softcap > 0:
        c = cfg.final_logit_softcap
        logits = jnp.tanh(logits / c) * c

    # ONE append for the whole step (all layers, all slots); under
    # rot_cache the stored K is rotated HERE, once over the stacked rows
    # (rotation is position-only, identical across layers)
    if rot_cache:
        k_stack = apply_rope_storage(
            k_stack, self_extend_pos(q_pos, ga_n, ga_w)[None], cfg)
    cache = append_step(
        cache, k_stack, v_stack,
        slot_ids, start, n_valid, active,
    )
    lengths = jnp.where(
        active, cache.lengths[slot_ids] + n_valid, cache.lengths[slot_ids]
    )
    new_lengths = cache.lengths.at[slot_ids].set(lengths.astype(jnp.int32))
    new_cache = KVCache(cache.k, cache.v, new_lengths, cache.k_scale,
                        cache.v_scale, cache.kind, cache.layout)
    return logits, new_cache, pooled


forward_step = partial(
    jax.jit,
    static_argnames=("cfg", "collect_hidden", "tp_axis", "rot_cache"),
    donate_argnames=("cache",),
)(_forward)


def _decode_loop(
    weights: dict,
    cache: KVCache,
    tokens: jax.Array,  # [S] int32: pending token per slot
    active: jax.Array,  # [S] bool
    cfg: ModelConfig,
    samp_params,  # sampling.device.DeviceSamplerParams
    samp_state,  # sampling.device.DeviceSamplerState
    n_inner: int,
    ga_n: jax.Array | int = 1,
    ga_w: jax.Array | int = 0,
    tp_axis: str | None = None,
    rot_cache: bool = False,
    gbank=None,  # sampling.device.GrammarBank | None
):
    """n_inner batched decode steps with ON-DEVICE sampling.

    One host round-trip yields [S, n_inner] tokens instead of one — the
    fixed-shape answer to per-token host sampling latency (SURVEY.md
    section 7). The host applies stop/budget semantics afterwards and
    trims any overrun cells with kvcache.trim. DFA-compiled grammars are
    enforced IN the loop via gbank (sampling/device.py GrammarBank); only
    non-determinizable grammars still need the host lane.
    """
    from ..sampling.device import sample_step

    S = tokens.shape[0]
    slot_ids = jnp.arange(S, dtype=jnp.int32)

    def body(carry, _):
        cache, tok, st = carry
        logits, cache, _ = _forward(
            weights, cache, tok[:, None], slot_ids, active, cfg,
            ga_n=ga_n, ga_w=ga_w, tp_axis=tp_axis, rot_cache=rot_cache,
        )
        nxt, st = sample_step(logits, samp_params, st, gbank=gbank)
        return (cache, nxt, st), nxt

    (cache, last, samp_state), toks = jax.lax.scan(
        body, (cache, tokens, samp_state), None, length=n_inner
    )
    # `last` (== toks[:, -1]) is returned as its own small device array so
    # the serving loop can feed the next chunk without an eager slice op
    # (first use of an eager op costs a ~2 s compile on remote runtimes)
    return toks.T, last, cache, samp_state  # [S, n_inner], [S]


decode_loop = partial(
    jax.jit,
    static_argnames=("cfg", "n_inner", "tp_axis", "rot_cache"),
    donate_argnames=("cache", "samp_state"),
)(_decode_loop)
