"""CLIP ViT encoder vs HF transformers (independent reference), mmproj
GGUF round-trip, image preprocessing, projector output."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from tpu_engine.gguf.constants import GGMLType
from tpu_engine.gguf.writer import GGUFWriter

E_LLM = 48  # tiny "LLM" embedding dim for the projector


def tiny_hf_clip(seed=7):
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(seed)
    cfg = CLIPVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, image_size=32, patch_size=8,
        hidden_act="quick_gelu", layer_norm_eps=1e-5,
    )
    return CLIPVisionModel(cfg).eval()


def write_mmproj(path: str, hf, seed=7, e_llm=E_LLM, anyres=False) -> str:
    rng = np.random.default_rng(seed)
    vm = hf.vision_model
    cfg = hf.config
    w = GGUFWriter(path)
    w.add("general.architecture", "clip")
    w.add("clip.has_vision_encoder", True)
    w.add("clip.has_llava_projector", True)
    w.add("clip.projector_type", "mlp")
    w.add("clip.use_gelu", False)  # quick_gelu
    if anyres:  # llava-1.6 grid candidates (multiples of image_size)
        S = cfg.image_size
        w.add("clip.vision.image_grid_pinpoints",
              [S, S, 2 * S, S, S, 2 * S, 2 * S, 2 * S])
        w.add("clip.vision.mm_patch_merge_type", "spatial_unpad")
    w.add("clip.vision.image_size", cfg.image_size)
    w.add("clip.vision.patch_size", cfg.patch_size)
    w.add("clip.vision.embedding_length", cfg.hidden_size)
    w.add("clip.vision.feed_forward_length", cfg.intermediate_size)
    w.add("clip.vision.attention.head_count", cfg.num_attention_heads)
    w.add("clip.vision.attention.layer_norm_epsilon", cfg.layer_norm_eps)
    w.add("clip.vision.block_count", cfg.num_hidden_layers)

    def t(name, tensor):
        w.add_tensor(name, tensor.detach().numpy().astype(np.float32),
                     GGMLType.F32)

    t("v.patch_embd.weight", vm.embeddings.patch_embedding.weight)
    t("v.class_embd", vm.embeddings.class_embedding)
    t("v.position_embd.weight", vm.embeddings.position_embedding.weight)
    t("v.pre_ln.weight", vm.pre_layrnorm.weight)
    t("v.pre_ln.bias", vm.pre_layrnorm.bias)
    for i, layer in enumerate(vm.encoder.layers):
        b = f"v.blk.{i}."
        t(b + "ln1.weight", layer.layer_norm1.weight)
        t(b + "ln1.bias", layer.layer_norm1.bias)
        t(b + "ln2.weight", layer.layer_norm2.weight)
        t(b + "ln2.bias", layer.layer_norm2.bias)
        t(b + "attn_q.weight", layer.self_attn.q_proj.weight)
        t(b + "attn_q.bias", layer.self_attn.q_proj.bias)
        t(b + "attn_k.weight", layer.self_attn.k_proj.weight)
        t(b + "attn_k.bias", layer.self_attn.k_proj.bias)
        t(b + "attn_v.weight", layer.self_attn.v_proj.weight)
        t(b + "attn_v.bias", layer.self_attn.v_proj.bias)
        t(b + "attn_out.weight", layer.self_attn.out_proj.weight)
        t(b + "attn_out.bias", layer.self_attn.out_proj.bias)
        t(b + "ffn_down.weight", layer.mlp.fc1.weight)  # [FF, E]
        t(b + "ffn_down.bias", layer.mlp.fc1.bias)
        t(b + "ffn_up.weight", layer.mlp.fc2.weight)  # [E, FF]
        t(b + "ffn_up.bias", layer.mlp.fc2.bias)
    mm0 = rng.normal(size=(e_llm, 32)).astype(np.float32) * 0.1
    mm0b = rng.normal(size=(e_llm,)).astype(np.float32) * 0.1
    mm2 = rng.normal(size=(e_llm, e_llm)).astype(np.float32) * 0.1
    mm2b = rng.normal(size=(e_llm,)).astype(np.float32) * 0.1
    w.add_tensor("mm.0.weight", mm0, GGMLType.F32)
    w.add_tensor("mm.0.bias", mm0b, GGMLType.F32)
    w.add_tensor("mm.2.weight", mm2, GGMLType.F32)
    w.add_tensor("mm.2.bias", mm2b, GGMLType.F32)
    if anyres:
        w.add_tensor("model.image_newline",
                     rng.normal(size=(e_llm,)).astype(np.float32),
                     GGMLType.F32)
    w.write()
    return path, (mm0, mm0b, mm2, mm2b)


@pytest.fixture(scope="module")
def clip_pair(tmp_path_factory):
    from tpu_engine.clipvit.model import load_clip

    hf = tiny_hf_clip()
    d = tmp_path_factory.mktemp("mmproj")
    path, mm = write_mmproj(str(d / "mmproj.gguf"), hf)
    return hf, load_clip(path), mm


def test_config_roundtrip(clip_pair):
    hf, model, _ = clip_pair
    assert model.cfg.image_size == 32 and model.cfg.patch_size == 8
    assert model.cfg.n_layer == 2 and model.cfg.n_head == 4
    assert not model.cfg.use_gelu
    assert model.n_embd_out == E_LLM
    assert model.cfg.n_patches == 16


def test_encoder_matches_hf(clip_pair):
    """Our encoder (pre-projector path) vs HF hidden_states[-1]."""
    import torch

    from tpu_engine.clipvit.model import _encode

    hf, model, (mm0, mm0b, mm2, mm2b) = clip_pair
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(3, 32, 32)).astype(np.float32)

    with torch.no_grad():
        out = hf(torch.tensor(pixels[None]), output_hidden_states=True)
    hf_hidden = out.hidden_states[-1][0].numpy()  # [1+16, E], no post_ln

    ours = np.asarray(_encode(model.params, jnp.asarray(pixels), model.cfg,
                              model.n_embd_out))  # [16, E_LLM]
    # reproduce the projector on HF's hidden states (drop CLS)
    import math

    h = hf_hidden[1:]
    proj = h @ mm0.T + mm0b
    erf = np.vectorize(math.erf)
    g = 0.5 * proj * (1.0 + erf(proj / np.sqrt(2.0)))
    expect = g @ mm2.T + mm2b
    np.testing.assert_allclose(ours, expect, rtol=2e-4, atol=2e-4)


def test_encode_image_shapes(clip_pair, tmp_path):
    from PIL import Image

    from tpu_engine.clipvit.model import encode_image

    hf, model, _ = clip_pair
    img = Image.fromarray(
        (np.random.default_rng(1).random((48, 64, 3)) * 255).astype(np.uint8))
    import io

    buf = io.BytesIO()
    img.save(buf, format="PNG")
    toks = np.asarray(encode_image(model, buf.getvalue()))
    assert toks.shape == (16, E_LLM)
    assert np.isfinite(toks).all()


def _png_bytes(seed=1, size=(40, 40)):
    import io

    from PIL import Image

    arr = (np.random.default_rng(seed).random((*size, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_engine_multimodal_e2e(tmp_path):
    """Image prompt through the serving engine: [img-0] marker, CLIP
    encode, decode-by-embedding prefill, then text generation (reference
    flow llama_engine.cc:853-918 + IngestImages)."""
    from tests.models import build_test_gguf
    from tpu_engine.clipvit.model import load_clip
    from tpu_engine.model.loader import load_model
    from tpu_engine.serve.engine import InferenceEngine
    from tpu_engine.serve.types import CompletionParams
    from tpu_engine.sampling import SamplingParams

    lm_path = build_test_gguf(str(tmp_path / "tiny.gguf"), "f32", seed=3)
    lm = load_model(lm_path)
    mm_path, _ = write_mmproj(str(tmp_path / "mmproj.gguf"), tiny_hf_clip(),
                              e_llm=lm.cfg.n_embd)
    clip = load_clip(mm_path)
    assert clip.n_embd_out == lm.cfg.n_embd

    eng = InferenceEngine(lm, n_ctx=256, n_parallel=2, clip=clip)
    try:
        tid = eng.request_completion(CompletionParams(
            prompt="USER: [img-0] describe ASSISTANT:",
            images=[_png_bytes()], n_predict=6,
            sampling=SamplingParams(temperature=0.0)))
        final = None
        while final is None:
            r = eng.next_result(tid, timeout=300.0)
            assert not r.error, r.error_message
            if r.stop:
                final = r
        assert final.tokens_predicted > 0
        # prompt cells include the 16 image tokens
        assert final.tokens_evaluated > 16
    finally:
        eng.shutdown()


def test_engine_multimodal_missing_image(tmp_path):
    from tests.models import build_test_gguf
    from tpu_engine.clipvit.model import load_clip
    from tpu_engine.model.loader import load_model
    from tpu_engine.serve.engine import InferenceEngine
    from tpu_engine.serve.types import CompletionParams

    lm_path = build_test_gguf(str(tmp_path / "tiny.gguf"), "f32", seed=3)
    lm = load_model(lm_path)
    mm_path, _ = write_mmproj(str(tmp_path / "mmproj.gguf"), tiny_hf_clip(),
                              e_llm=lm.cfg.n_embd)
    eng = InferenceEngine(lm, n_ctx=256, n_parallel=1,
                          clip=load_clip(mm_path))
    try:
        tid = eng.request_completion(CompletionParams(
            prompt="see [img-3]", images=[_png_bytes()], n_predict=2))
        r = eng.next_result(tid, timeout=120.0)
        assert r.error and "img-3" in r.error_message
    finally:
        eng.shutdown()


def test_select_best_resolution():
    from tpu_engine.clipvit.model import select_best_resolution

    pin = [336, 336, 672, 336, 336, 672, 672, 672]
    assert select_best_resolution(800, 400, pin) == (672, 336)
    assert select_best_resolution(400, 800, pin) == (336, 672)
    # upscaling counts toward effective resolution (public llava algo):
    # a 500x500 image fills 672x672 with eff=250000 > 336x336's 112896
    assert select_best_resolution(500, 500, pin) == (672, 672)
    assert select_best_resolution(300, 300, pin) == (336, 336)
    assert select_best_resolution(2000, 2000, pin) == (672, 672)


def test_anyres_tiling_and_token_count(tmp_path):
    """llava-1.6: a wide image selects a 1x2 tile grid; output = base
    patches + unpadded spatial rows each ending in the newline column."""
    from tpu_engine.clipvit.model import (
        encode_image, load_clip, preprocess_anyres)

    hf = tiny_hf_clip()
    path, _ = write_mmproj(str(tmp_path / "mm16.gguf"), hf, anyres=True)
    model = load_clip(path)
    cfg = model.cfg
    assert cfg.is_anyres
    S, P = cfg.image_size, cfg.patch_size  # 32, 8
    ns = S // P  # 4

    png = _png_bytes(seed=3, size=(32, 64))  # H=32, W=64 -> grid (1, 2)
    tiles, grid, scaled = preprocess_anyres(png, cfg)
    assert grid == (1, 2)
    assert tiles.shape == (3, 3, S, S)  # base + 2 tiles
    assert scaled == (2 * S, S)  # exact fit: no padding

    toks = np.asarray(encode_image(model, png))
    # base ns*ns + spatial (ns rows x (2*ns cols + newline))
    assert toks.shape == (ns * ns + ns * (2 * ns + 1), E_LLM)
    assert np.isfinite(toks).all()


def test_anyres_unpad_crops_padding(tmp_path):
    """A 4:1 aspect image on a 2:1 grid leaves padding rows that unpad
    must crop before the newline columns are appended."""
    from tpu_engine.clipvit.model import encode_image, load_clip

    hf = tiny_hf_clip()
    path, _ = write_mmproj(str(tmp_path / "mm16b.gguf"), hf, anyres=True)
    model = load_clip(path)
    cfg = model.cfg
    S, P = cfg.image_size, cfg.patch_size
    ns = S // P

    png = _png_bytes(seed=4, size=(16, 64))  # H=16, W=64: 4:1
    toks = np.asarray(encode_image(model, png))
    # grid (1,2): canvas 32x64, scaled image 64x16 -> 8 pad rows top+bottom
    # = 1 patch row cropped each side: rows = ns - 2
    rows = ns - 2
    assert toks.shape == (ns * ns + rows * (2 * ns + 1), E_LLM)
