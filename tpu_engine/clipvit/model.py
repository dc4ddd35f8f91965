"""CLIP ViT vision encoder + LLaVA multimodal projector from mmproj GGUF.

TPU-native rebuild of the llama.cpp clip/llava path the reference consumes
(SURVEY.md section 2b "Multimodal (LLaVA/CLIP)"; call sites
clip_model_load at /root/reference/src/llama_server_context.cc:187,
clip_n_mmproj_embd at :217, llava_image_embed_make_with_clip_img at
:820-822). Produces n_embd_llm-dim image tokens that the engine decodes
by embedding (IngestImages, llama_server_context.cc:1073-1129).

Architecture (CLIP ViT + llava "mlp" projector):
  patchify (stride-P conv == unfold + matmul) -> +class/pos embeddings ->
  pre-LN -> N x [LN -> MHA -> res; LN -> MLP(quick-gelu/gelu) -> res] ->
  drop CLS, mm MLP projector (mm.0 -> gelu -> mm.2) -> [n_patches, E_llm]

The mmproj GGUF convention (tensors "v.blk.N.*", "mm.*"; metadata
"clip.vision.*") follows public llama.cpp clip.cpp. The two MLP tensor
roles are disambiguated BY SHAPE at load, so either naming order of
ffn_down/ffn_up works.
"""

from __future__ import annotations

import io
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFFile, read_gguf


@dataclass(eq=False)
class ClipConfig:
    image_size: int
    patch_size: int
    n_embd: int
    n_ff: int
    n_head: int
    n_layer: int
    eps: float
    use_gelu: bool  # False -> quick_gelu (CLIP's activation)
    image_mean: tuple
    image_std: tuple
    projector: str  # "mlp"
    # llava-1.6 "anyres": candidate grid resolutions; empty = llava-1.5
    # square resize (reference gates 1.6 on n_ctx >= 4096,
    # llama_server_context.cc:193-205)
    image_grid_pinpoints: tuple = ()
    mm_patch_merge_type: str = "flat"  # or "spatial_unpad" (llava-1.6)

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def is_anyres(self) -> bool:
        return len(self.image_grid_pinpoints) >= 2

    @classmethod
    def from_gguf_metadata(cls, md: dict) -> "ClipConfig":
        g = lambda k, d=None: md.get("clip.vision." + k, d)
        return cls(
            image_size=int(g("image_size", 336)),
            patch_size=int(g("patch_size", 14)),
            n_embd=int(g("embedding_length", 1024)),
            n_ff=int(g("feed_forward_length", 4096)),
            n_head=int(g("attention.head_count", 16)),
            n_layer=int(g("block_count", 23)),
            eps=float(g("attention.layer_norm_epsilon", 1e-5)),
            use_gelu=bool(md.get("clip.use_gelu", False)),
            image_mean=tuple(g("image_mean", (0.48145466, 0.4578275, 0.40821073))),
            image_std=tuple(g("image_std", (0.26862954, 0.26130258, 0.27577711))),
            projector=str(md.get("clip.projector_type", "mlp")),
            image_grid_pinpoints=tuple(
                int(v) for v in g("image_grid_pinpoints", ())),
            mm_patch_merge_type=str(g("mm_patch_merge_type", "flat")),
        )


@dataclass(eq=False)
class ClipModel:
    cfg: ClipConfig
    params: dict
    n_embd_out: int  # projector output dim (must equal the LLM's n_embd)


def _get(g: GGUFFile, name: str):
    return jnp.asarray(g.dequantize(name, np.float32))


def _maybe(g: GGUFFile, name: str):
    return _get(g, name) if name in g.tensors else None


def load_clip(path: str) -> ClipModel:
    """Load an mmproj GGUF (reference: clip_model_load,
    llama_server_context.cc:187)."""
    g = read_gguf(path)
    try:
        cfg = ClipConfig.from_gguf_metadata(g.metadata)
        p: dict = {}
        patch = _get(g, "v.patch_embd.weight")  # [E, 3, P, P] conv kernel
        p["patch_w"] = patch.reshape(cfg.n_embd, -1).T  # [3*P*P, E]
        p["class_embd"] = _maybe(g, "v.class_embd")
        p["pos_embd"] = _get(g, "v.position_embd.weight")  # [n_pos, E]
        p["pre_ln"] = (_maybe(g, "v.pre_ln.weight"), _maybe(g, "v.pre_ln.bias"))
        blocks = []
        for i in range(cfg.n_layer):
            b = f"v.blk.{i}."
            fa = _get(g, b + "ffn_down.weight")
            fb = _get(g, b + "ffn_up.weight")
            fa_b = _maybe(g, b + "ffn_down.bias")
            fb_b = _maybe(g, b + "ffn_up.bias")
            # disambiguate MLP order by shape: fc1 is [FF, E]
            if fa.shape[0] == cfg.n_ff:
                fc1, fc1_b, fc2, fc2_b = fa, fa_b, fb, fb_b
            else:
                fc1, fc1_b, fc2, fc2_b = fb, fb_b, fa, fa_b
            blocks.append({
                "ln1": (_get(g, b + "ln1.weight"), _get(g, b + "ln1.bias")),
                "ln2": (_get(g, b + "ln2.weight"), _get(g, b + "ln2.bias")),
                "wq": _get(g, b + "attn_q.weight"),
                "bq": _maybe(g, b + "attn_q.bias"),
                "wk": _get(g, b + "attn_k.weight"),
                "bk": _maybe(g, b + "attn_k.bias"),
                "wv": _get(g, b + "attn_v.weight"),
                "bv": _maybe(g, b + "attn_v.bias"),
                "wo": _get(g, b + "attn_out.weight"),
                "bo": _maybe(g, b + "attn_out.bias"),
                "fc1": fc1, "fc1_b": fc1_b, "fc2": fc2, "fc2_b": fc2_b,
            })
        p["blocks"] = blocks
        p["mm0"] = (_get(g, "mm.0.weight"), _maybe(g, "mm.0.bias"))
        p["mm2"] = (_maybe(g, "mm.2.weight"), _maybe(g, "mm.2.bias"))
        # llava-1.6 row separator appended after each spatial row
        p["image_newline"] = _maybe(g, "model.image_newline")
        n_out = p["mm2"][0].shape[0] if p["mm2"][0] is not None else p["mm0"][0].shape[0]
        return ClipModel(cfg=cfg, params=p, n_embd_out=int(n_out))
    finally:
        g.close()


def _ln(x, w, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _act(x, use_gelu: bool):
    if use_gelu:
        return jax.nn.gelu(x, approximate=False)
    return x * jax.nn.sigmoid(1.702 * x)  # quick_gelu


def _lin(x, w, b):
    y = x @ w.T
    return y + b if b is not None else y


@partial(jax.jit, static_argnames=("cfg", "n_embd_out"))
def _encode(params, pixels: jax.Array, cfg: ClipConfig, n_embd_out: int):
    """pixels [3, S, S] normalized floats -> image tokens [n_patches, E_llm]."""
    P = cfg.patch_size
    n_side = cfg.image_size // P
    # unfold into patches: [3, ns, P, ns, P] -> [ns*ns, 3*P*P]
    x = pixels.reshape(3, n_side, P, n_side, P)
    x = x.transpose(1, 3, 0, 2, 4).reshape(n_side * n_side, 3 * P * P)
    x = x @ params["patch_w"]  # [n_patches, E]

    if params["class_embd"] is not None:
        x = jnp.concatenate([params["class_embd"][None, :], x], axis=0)
    x = x + params["pos_embd"][: x.shape[0]]
    if params["pre_ln"][0] is not None:
        x = _ln(x, *params["pre_ln"], cfg.eps)

    H, D = cfg.n_head, cfg.n_embd // cfg.n_head
    for blk in params["blocks"]:
        h = _ln(x, *blk["ln1"], cfg.eps)
        T = h.shape[0]
        q = _lin(h, blk["wq"], blk["bq"]).reshape(T, H, D)
        k = _lin(h, blk["wk"], blk["bk"]).reshape(T, H, D)
        v = _lin(h, blk["wv"], blk["bv"]).reshape(T, H, D)
        s = jnp.einsum("thd,uhd->htu", q, k) / jnp.sqrt(D)
        a = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("htu,uhd->thd", a, v).reshape(T, H * D)
        x = x + _lin(o, blk["wo"], blk["bo"])
        h = _ln(x, *blk["ln2"], cfg.eps)
        h = _act(_lin(h, blk["fc1"], blk["fc1_b"]), cfg.use_gelu)
        x = x + _lin(h, blk["fc2"], blk["fc2_b"])

    if params["class_embd"] is not None:
        x = x[1:]  # llava drops the CLS token
    # mm projector: mm.0 -> gelu -> mm.2
    x = _lin(x, *params["mm0"])
    if params["mm2"][0] is not None:
        x = _lin(jax.nn.gelu(x, approximate=False), *params["mm2"])
    return x


def _normalize(img, cfg: ClipConfig) -> np.ndarray:
    arr = np.asarray(img, np.float32) / 255.0  # [H, W, 3]
    mean = np.asarray(cfg.image_mean, np.float32)
    std = np.asarray(cfg.image_std, np.float32)
    arr = (arr - mean) / std
    return np.ascontiguousarray(arr.transpose(2, 0, 1))


def preprocess_image(data: bytes, cfg: ClipConfig) -> np.ndarray:
    """Decode + resize + normalize (llava-1.5 square resize; the stb_image
    analog of reference llama_client_slot.h:10). Returns [3, S, S] f32."""
    from PIL import Image

    img = Image.open(io.BytesIO(data)).convert("RGB")
    img = img.resize((cfg.image_size, cfg.image_size), Image.BICUBIC)
    return _normalize(img, cfg)


def select_best_resolution(w: int, h: int, pinpoints) -> tuple[int, int]:
    """llava-1.6 grid selection (public llava anyres algorithm): maximize
    the effective (downscaled-original) resolution, then minimize wasted
    grid area. pinpoints: flat [w0, h0, w1, h1, ...]."""
    best = None
    best_eff, best_waste = -1, None
    for i in range(0, len(pinpoints) - 1, 2):
        gw, gh = int(pinpoints[i]), int(pinpoints[i + 1])
        scale = min(gw / w, gh / h)
        dw, dh = int(w * scale), int(h * scale)
        eff = min(dw * dh, w * h)
        waste = gw * gh - eff
        if eff > best_eff or (eff == best_eff and waste < best_waste):
            best, best_eff, best_waste = (gw, gh), eff, waste
    return best


def preprocess_anyres(data: bytes, cfg: ClipConfig):
    """llava-1.6 anisotropic tiling: pick the best grid resolution, resize
    the image to fit (aspect preserved), pad with the mean color (zero
    after normalization), split into image_size tiles, and prepend the
    square-resized base image.

    Returns (tiles [1+gh*gw, 3, S, S], grid (gh, gw), scaled (sw, sh) in
    pixels before padding). Reference behavior: upstream llama.cpp
    clip_image_preprocess anyres path, which the cortex shim reaches via
    llava_image_embed_make_with_clip_img
    (/root/reference/src/llama_server_context.cc:820-822; 1.6 gate
    :193-205)."""
    from PIL import Image

    S = cfg.image_size
    img = Image.open(io.BytesIO(data)).convert("RGB")
    w, h = img.size
    gw, gh = select_best_resolution(w, h, cfg.image_grid_pinpoints)
    scale = min(gw / w, gh / h)
    sw, sh = max(int(w * scale), 1), max(int(h * scale), 1)
    fitted = img.resize((sw, sh), Image.BICUBIC)
    mean_rgb = tuple(int(round(m * 255)) for m in cfg.image_mean)
    canvas = Image.new("RGB", (gw, gh), mean_rgb)
    canvas.paste(fitted, ((gw - sw) // 2, (gh - sh) // 2))

    tiles = [_normalize(img.resize((S, S), Image.BICUBIC), cfg)]  # base
    arr = _normalize(canvas, cfg)  # [3, gh, gw]
    for ty in range(gh // S):
        for tx in range(gw // S):
            tiles.append(np.ascontiguousarray(
                arr[:, ty * S:(ty + 1) * S, tx * S:(tx + 1) * S]))
    return np.stack(tiles), (gh // S, gw // S), (sw, sh)


def _merge_anyres(feats: jax.Array, grid, scaled, cfg: ClipConfig,
                  newline) -> jax.Array:
    """Merge per-tile features, llava-1.6 "spatial_unpad": tiles arranged
    into one spatial map, the mean-color padding rows/cols cropped away,
    an image_newline embedding appended to each row, base features first."""
    gh, gw = grid
    ns = cfg.image_size // cfg.patch_size
    E = feats.shape[-1]
    base, tiles = feats[0], feats[1:]
    sp = tiles.reshape(gh, gw, ns, ns, E).transpose(0, 2, 1, 3, 4)
    sp = sp.reshape(gh * ns, gw * ns, E)
    if cfg.mm_patch_merge_type.startswith("spatial"):
        # unpad: the scaled image occupies (sh, sw) pixels centered on the
        # (gh*S, gw*S) canvas; crop the all-padding patch rows/cols
        sw, sh = scaled
        ph = max(int(np.floor(((gh * cfg.image_size - sh) / 2)
                              / cfg.patch_size)), 0)
        pw = max(int(np.floor(((gw * cfg.image_size - sw) / 2)
                              / cfg.patch_size)), 0)
        if ph:
            sp = sp[ph:-ph or None]
        if pw:
            sp = sp[:, pw:-pw or None]
    if newline is not None:
        nl = jnp.broadcast_to(newline[None, None, :], (sp.shape[0], 1, E))
        sp = jnp.concatenate([sp, nl], axis=1)
    return jnp.concatenate([base, sp.reshape(-1, E)], axis=0)


def encode_image(model: ClipModel, image_bytes: bytes) -> jax.Array:
    """Image bytes -> [n_image_tokens, n_embd_llm] image tokens (reference:
    llava_image_embed_make_with_clip_img, llama_server_context.cc:820).
    llava-1.5 mmprojs produce n_patches tokens; llava-1.6 (grid pinpoints
    present) produce base + unpadded spatial tiles + newline columns."""
    cfg = model.cfg
    if cfg.is_anyres:
        tiles, grid, scaled = preprocess_anyres(image_bytes, cfg)
        feats = jnp.stack([
            _encode(model.params, jnp.asarray(t), cfg, model.n_embd_out)
            for t in tiles
        ])
        return _merge_anyres(feats, grid, scaled, cfg,
                             model.params.get("image_newline"))
    pixels = jnp.asarray(preprocess_image(image_bytes, cfg))
    return _encode(model.params, pixels, cfg, model.n_embd_out)
