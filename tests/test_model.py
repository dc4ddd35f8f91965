"""Model forward correctness vs HF transformers (independent reference),
KV-cache decode equivalence, chunked prefill, quant-level sanity."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.models import build_test_gguf, tiny_hf_llama, tokenizer_metadata
from tpu_engine.kvcache.cache import new_cache, shift_compact, trim
from tpu_engine.model.llama import forward_step
from tpu_engine.model.loader import load_model


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    d = tmp_path_factory.mktemp("models")
    path = str(d / "tiny_f32.gguf")
    build_test_gguf(path, "f32", seed=3)
    hf = tiny_hf_llama(seed=3)
    lm = load_model(path)
    return hf, lm


def hf_logits(hf, ids):
    import torch

    with torch.no_grad():
        out = hf(torch.tensor([ids], dtype=torch.long))
    return out.logits[0].float().numpy()  # [T, V]


def fresh_cache(lm, n_slots=2, max_len=64):
    c = lm.cfg
    return new_cache(c.n_layer, n_slots, max_len, c.n_kv_head, c.head_dim)


PROMPT = [1, 270, 272, 274, 280, 300, 310, 320, 9, 77, 123]


def test_prefill_logits_match_hf(tiny):
    hf, lm = tiny
    ref = hf_logits(hf, PROMPT)
    cache = fresh_cache(lm)
    logits, cache, _ = forward_step(
        lm.weights, cache,
        jnp.asarray([PROMPT], jnp.int32),
        jnp.asarray([0], jnp.int32),
        jnp.asarray([True]),
        lm.cfg,
    )
    got = np.asarray(logits[0])
    np.testing.assert_allclose(got, ref[-1], rtol=1e-3, atol=2e-4)
    assert int(cache.lengths[0]) == len(PROMPT)


def test_decode_steps_match_hf(tiny):
    """Teacher-forced decode: each step's logits must match the HF full
    forward at that position (validates cache append + rope-at-attention)."""
    hf, lm = tiny
    full = PROMPT + [290, 291, 292, 293]
    ref = hf_logits(hf, full)
    cache = fresh_cache(lm)
    logits, cache, _ = forward_step(
        lm.weights, cache, jnp.asarray([PROMPT], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
    )
    for i, tok in enumerate([290, 291, 292, 293]):
        pos = len(PROMPT) + i
        np.testing.assert_allclose(
            np.asarray(logits[0]), ref[pos - 1], rtol=1e-3, atol=2e-4,
            err_msg=f"step {i}",
        )
        logits, cache, _ = forward_step(
            lm.weights, cache, jnp.asarray([[tok]], jnp.int32),
            jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
        )
    np.testing.assert_allclose(np.asarray(logits[0]), ref[-1], rtol=1e-3, atol=2e-4)


def test_chunked_prefill_equals_full(tiny):
    hf, lm = tiny
    cache = fresh_cache(lm)
    full_logits, _, _ = forward_step(
        lm.weights, cache, jnp.asarray([PROMPT], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
    )
    cache = fresh_cache(lm)
    for c0 in range(0, len(PROMPT), 4):
        chunk = PROMPT[c0 : c0 + 4]
        logits, cache, _ = forward_step(
            lm.weights, cache, jnp.asarray([chunk], jnp.int32),
            jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
        )
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full_logits), rtol=1e-4, atol=1e-5)


def test_batched_decode_slots_independent(tiny):
    """Two slots decoding together must equal each decoding alone."""
    hf, lm = tiny
    p0, p1 = PROMPT, [1, 300, 301, 302]
    # together
    cache = fresh_cache(lm)
    _, cache, _ = forward_step(
        lm.weights, cache, jnp.asarray([p0], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
    )
    _, cache, _ = forward_step(
        lm.weights, cache, jnp.asarray([p1], jnp.int32),
        jnp.asarray([1], jnp.int32), jnp.asarray([True]), lm.cfg,
    )
    both, cache, _ = forward_step(
        lm.weights, cache, jnp.asarray([[50], [60]], jnp.int32),
        jnp.asarray([0, 1], jnp.int32), jnp.asarray([True, True]), lm.cfg,
    )
    # alone
    cache0 = fresh_cache(lm)
    _, cache0, _ = forward_step(
        lm.weights, cache0, jnp.asarray([p0], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
    )
    alone0, _, _ = forward_step(
        lm.weights, cache0, jnp.asarray([[50]], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
    )
    np.testing.assert_allclose(np.asarray(both[0]), np.asarray(alone0[0]), rtol=1e-4, atol=1e-5)


def test_inactive_slot_untouched(tiny):
    hf, lm = tiny
    cache = fresh_cache(lm)
    _, cache, _ = forward_step(
        lm.weights, cache, jnp.asarray([PROMPT], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
    )
    k_before = np.asarray(jnp.stack([a[1] for a in cache.k]))
    len_before = int(cache.lengths[1])
    _, cache, _ = forward_step(
        lm.weights, cache, jnp.asarray([[50], [60]], jnp.int32),
        jnp.asarray([0, 1], jnp.int32), jnp.asarray([True, False]), lm.cfg,
    )
    assert int(cache.lengths[1]) == len_before
    np.testing.assert_array_equal(np.asarray(jnp.stack([a[1] for a in cache.k])), k_before)


def test_prompt_cache_trim_reuse(tiny):
    """Trim to a common prefix then re-prefill only the tail — the
    reference's prompt-cache path (common_part, llama_server_context.cc:1498)."""
    hf, lm = tiny
    tail = [330, 331]
    ref = hf_logits(hf, PROMPT + tail)
    cache = fresh_cache(lm)
    _, cache, _ = forward_step(
        lm.weights, cache, jnp.asarray([PROMPT + [999 % lm.cfg.n_vocab]], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
    )
    # new request shares PROMPT as prefix; trim and continue
    cache = trim(cache, jnp.int32(0), jnp.int32(len(PROMPT)))
    logits, cache, _ = forward_step(
        lm.weights, cache, jnp.asarray([tail], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
    )
    np.testing.assert_allclose(np.asarray(logits[0]), ref[-1], rtol=1e-3, atol=2e-4)


def test_context_shift_positions(tiny):
    """shift_compact must slide cached rows down over the evicted middle
    (reference semantics: cached K/V KEEP their original representations —
    llama_kv_cache_seq_rm + seq_add, llama_server_context.cc:1288-1290 —
    so a fresh prefill of the evicted sequence is NOT equivalent; only the
    row movement and position renumbering are observable)."""
    hf, lm = tiny
    cache = fresh_cache(lm)
    toks = PROMPT + [290, 291, 292, 293]
    _, cache, _ = forward_step(
        lm.weights, cache, jnp.asarray([toks], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
    )
    k_before = np.asarray(jnp.stack([a[0] for a in cache.k]))
    v_before = np.asarray(jnp.stack([a[0] for a in cache.v]))
    n_keep, n_discard = 2, 4
    cache = shift_compact(cache, jnp.int32(0), jnp.int32(n_keep), jnp.int32(n_discard))
    new_len = len(toks) - n_discard
    assert int(cache.lengths[0]) == new_len
    k_after = np.asarray(jnp.stack([a[0] for a in cache.k]))
    v_after = np.asarray(jnp.stack([a[0] for a in cache.v]))
    # head kept in place (cache layout [L, KH, T, D] after the slot pick)
    np.testing.assert_array_equal(k_after[:, :, : n_keep + 1], k_before[:, :, : n_keep + 1])
    # tail slid down by n_discard
    np.testing.assert_array_equal(
        k_after[:, :, n_keep + 1 : new_len], k_before[:, :, n_keep + 1 + n_discard : len(toks)]
    )
    np.testing.assert_array_equal(
        v_after[:, :, n_keep + 1 : new_len], v_before[:, :, n_keep + 1 + n_discard : len(toks)]
    )
    # decode continues and produces finite logits
    logits, _, _ = forward_step(
        lm.weights, cache, jnp.asarray([[333]], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
    )
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("quant,min_cos", [("q8_0", 0.9995), ("q4_k_m", 0.98)])
def test_quantized_logits_close(tmp_path, quant, min_cos):
    path_f = str(tmp_path / "f32.gguf")
    path_q = str(tmp_path / "q.gguf")
    build_test_gguf(path_f, "f32", seed=5)
    build_test_gguf(path_q, quant, seed=5)
    lmf = load_model(path_f)
    lmq = load_model(path_q)
    args = (
        jnp.asarray([PROMPT], jnp.int32),
        jnp.asarray([0], jnp.int32),
        jnp.asarray([True]),
    )
    lf, _, _ = forward_step(lmf.weights, fresh_cache(lmf), *args, lmf.cfg)
    lq, _, _ = forward_step(lmq.weights, fresh_cache(lmq), *args, lmq.cfg)
    a, b = np.asarray(lf[0]), np.asarray(lq[0])
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > min_cos, f"{quant}: cos {cos}"
    # greedy argmax should agree for q8_0
    if quant == "q8_0":
        assert int(np.argmax(a)) == int(np.argmax(b))


def test_padded_prefill_equals_exact(tiny):
    """Right-padded bucket prefill with n_valid must equal exact-size prefill."""
    hf, lm = tiny
    cache = fresh_cache(lm)
    exact, cache_e, _ = forward_step(
        lm.weights, cache, jnp.asarray([PROMPT], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
    )
    padded = PROMPT + [0] * (16 - len(PROMPT))
    cache = fresh_cache(lm)
    got, cache_p, _ = forward_step(
        lm.weights, cache, jnp.asarray([padded], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
        n_valid=jnp.asarray([len(PROMPT)], jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), rtol=1e-4, atol=1e-5)
    assert int(cache_p.lengths[0]) == len(PROMPT)
    # continuing decode from the padded-prefill cache matches too
    d1, _, _ = forward_step(
        lm.weights, cache_e, jnp.asarray([[290]], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
    )
    d2, _, _ = forward_step(
        lm.weights, cache_p, jnp.asarray([[290]], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
    )
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-4, atol=1e-5)


def test_self_extend_position_remap(tiny):
    """ga_n/ga_w group-attention (SURVEY 2b "Self-extend"): remap is
    identity when ga_n==1 or all positions < ga_w; changes rope positions
    beyond the window otherwise."""
    from tpu_engine.model.llama import self_extend_pos

    pos = jnp.arange(20, dtype=jnp.int32)
    # disabled
    np.testing.assert_array_equal(
        np.asarray(self_extend_pos(pos, jnp.int32(1), jnp.int32(8))), np.arange(20))
    # window covers everything
    np.testing.assert_array_equal(
        np.asarray(self_extend_pos(pos, jnp.int32(4), jnp.int32(64))), np.arange(20))
    # grouping beyond w=8 with n=2: p >= 8 -> 8 + (p-8)//2
    got = np.asarray(self_extend_pos(pos, jnp.int32(2), jnp.int32(8)))
    expect = np.where(np.arange(20) < 8, np.arange(20), 8 + (np.arange(20) - 8) // 2)
    np.testing.assert_array_equal(got, expect)


def test_self_extend_forward(tiny):
    """Forward with ga_n>1: identical below the window, different beyond."""
    hf, lm = tiny
    short = PROMPT[:6]
    base_s, _, _ = forward_step(
        lm.weights, fresh_cache(lm), jnp.asarray([short], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
    )
    ga_s, _, _ = forward_step(
        lm.weights, fresh_cache(lm), jnp.asarray([short], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
        ga_n=jnp.int32(4), ga_w=jnp.int32(8),
    )
    np.testing.assert_allclose(np.asarray(ga_s), np.asarray(base_s), rtol=1e-5, atol=1e-6)

    long = PROMPT + [290, 291, 292, 293]
    base_l, _, _ = forward_step(
        lm.weights, fresh_cache(lm), jnp.asarray([long], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
    )
    ga_l, _, _ = forward_step(
        lm.weights, fresh_cache(lm), jnp.asarray([long], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
        ga_n=jnp.int32(4), ga_w=jnp.int32(8),
    )
    assert np.abs(np.asarray(ga_l) - np.asarray(base_l)).max() > 1e-4
    assert np.isfinite(np.asarray(ga_l)).all()


def test_rot_cache_parity(tmp_path):
    """rot_cache=True (K stored pre-rotated, upstream llama.cpp design)
    must produce the same logits as the unrotated cache across prefill +
    multi-step decode."""
    from tests.models import build_test_gguf
    from tpu_engine.model.loader import load_model

    path = str(tmp_path / "m.gguf")
    build_test_gguf(path, "f32", seed=11)
    lm = load_model(path)
    cfg = lm.cfg

    def run(rot):
        cache = new_cache(cfg.n_layer, 1, 64, cfg.n_kv_head, cfg.head_dim)
        logits, cache, _ = forward_step(
            lm.weights, cache, jnp.asarray([[1, 5, 9, 13]], jnp.int32),
            jnp.asarray([0], jnp.int32), jnp.asarray([True]), cfg,
            rot_cache=rot)
        outs = [np.asarray(logits)]
        for t in (7, 11, 3):
            logits, cache, _ = forward_step(
                lm.weights, cache, jnp.asarray([[t]], jnp.int32),
                jnp.asarray([0], jnp.int32), jnp.asarray([True]), cfg,
                rot_cache=rot)
            outs.append(np.asarray(logits))
        return outs

    for a, b in zip(run(False), run(True)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_rot_cache_shift_compact_rerotates(tmp_path):
    """Context shift semantics are identical between the two storage
    designs: rotated storage + re-rope of moved cells (rope=...) must
    produce the same post-shift decode logits as unrotated storage +
    plain compaction (both keep the ORIGINAL K/V vectors — like the
    reference, eviction never recomputes the survivors)."""
    from tests.models import build_test_gguf
    from tpu_engine.model.loader import load_model

    path = str(tmp_path / "m.gguf")
    build_test_gguf(path, "f32", seed=12)
    lm = load_model(path)
    cfg = lm.cfg
    toks = [1, 5, 9, 13, 2, 7, 11, 3]
    n_keep, n_discard = 2, 3

    def run(rot):
        cache = new_cache(cfg.n_layer, 1, 32, cfg.n_kv_head, cfg.head_dim)
        _, cache, _ = forward_step(
            lm.weights, cache, jnp.asarray([toks], jnp.int32),
            jnp.asarray([0], jnp.int32), jnp.asarray([True]), cfg,
            rot_cache=rot)
        rope = ((cfg.rope_dim, cfg.rope_freq_table()[0])
                if rot else None)
        cache = shift_compact(cache, jnp.int32(0), jnp.int32(n_keep),
                              jnp.int32(n_discard), rope=rope)
        out = []
        for t in (4, 17):
            logits, cache, _ = forward_step(
                lm.weights, cache, jnp.asarray([[t]], jnp.int32),
                jnp.asarray([0], jnp.int32), jnp.asarray([True]), cfg,
                rot_cache=rot)
            out.append(np.asarray(logits))
        return out

    for a, b in zip(run(False), run(True)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)
