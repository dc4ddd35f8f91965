"""Tensor parallelism via shard_map (dist/tp.py) on the virtual 8-device
CPU mesh: the TP step functions — including the Pallas kernels in interpret
mode — must match the single-device XLA reference.

This closes round-1's gap where the Pallas kernels silently fell back to
XLA under GSPMD sharding (kernels/dequant_matmul.py round-1 :224-228).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.models import build_test_gguf
from tpu_engine.dist import tp
from tpu_engine.kernels import dequant_matmul, flash_attention
from tpu_engine.kvcache.cache import new_cache
from tpu_engine.model.llama import decode_loop, forward_step
from tpu_engine.model.loader import load_model
from tpu_engine.sampling import SamplingParams
from tpu_engine.sampling.device import new_state, params_from_host

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")

PROMPT = [1, 270, 272, 274, 280, 300, 310, 320]


def _build(tmp_path_factory, quant: str, **kw):
    d = tmp_path_factory.mktemp("tp_models")
    path = str(d / f"m-{quant}.gguf")
    build_test_gguf(path, quant, seed=9, n_heads=8, n_kv_heads=4,
                    hidden_size=256, intermediate_size=kw.pop("ffn", 256), **kw)
    return path


def _ref(lm):
    cfg = lm.cfg
    cache = new_cache(cfg.n_layer, 2, 32, cfg.n_kv_head, cfg.head_dim)
    prefill, cache, _ = forward_step(
        lm.weights, cache, jnp.asarray([PROMPT], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), cfg)
    step, _, _ = forward_step(
        lm.weights, cache, jnp.asarray([[50], [60]], jnp.int32),
        jnp.asarray([0, 1], jnp.int32), jnp.asarray([True, True]), cfg)
    return np.asarray(prefill), np.asarray(step)


def _tp_run(path, cfg, p=4):
    mesh = tp.tp_mesh(p)
    lm = load_model(path, sharder=tp.TPSharder(mesh))
    fwd, _ = tp.make_tp_functions(mesh, lm.weights, cfg)
    cache = tp.shard_cache_tp(
        new_cache(cfg.n_layer, 2, 32, cfg.n_kv_head, cfg.head_dim), mesh)
    prefill, cache, _ = fwd(
        lm.weights, cache, jnp.asarray([PROMPT], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), cfg)
    step, _, _ = fwd(
        lm.weights, cache, jnp.asarray([[50], [60]], jnp.int32),
        jnp.asarray([0, 1], jnp.int32), jnp.asarray([True, True]), cfg)
    return np.asarray(prefill), np.asarray(step)


@pytest.mark.parametrize("quant", ["f32", "q8_0", "q4_k_m"])
def test_tp_forward_matches_single_device(tmp_path_factory, quant):
    path = _build(tmp_path_factory, quant)
    lm = load_model(path)
    ref_prefill, ref_step = _ref(lm)
    got_prefill, got_step = _tp_run(path, lm.cfg)
    np.testing.assert_allclose(got_prefill, ref_prefill, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(got_step, ref_step, rtol=2e-4, atol=2e-3)


def test_tp_pallas_kernels_match_xla(tmp_path_factory):
    """THE round-2 requirement: the fused dequant-matmul and flash
    attention kernels execute per-shard inside shard_map (interpret mode
    on CPU) and match the XLA path."""
    path = _build(tmp_path_factory, "q8_0", ffn=512)
    lm = load_model(path)
    ref_prefill, ref_step = _ref(lm)
    dequant_matmul.enable(interpret=True)
    flash_attention.enable(interpret=True)
    try:
        got_prefill, got_step = _tp_run(path, lm.cfg)
    finally:
        dequant_matmul.disable()
        flash_attention.disable()
    np.testing.assert_allclose(got_prefill, ref_prefill, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(got_step, ref_step, rtol=2e-2, atol=2e-2)


def test_tp_decode_loop_token_parity(tmp_path_factory):
    path = _build(tmp_path_factory, "q4_k_m")
    lm = load_model(path)
    cfg = lm.cfg
    S = 2
    params = params_from_host([SamplingParams(temperature=0.0)] * S)

    def prefill(weights, cache, fwd):
        _, cache, _ = fwd(
            weights, cache, jnp.asarray([PROMPT, PROMPT], jnp.int32),
            jnp.arange(S, dtype=jnp.int32), jnp.ones((S,), bool), cfg)
        return cache

    ref_cache = prefill(
        lm.weights, new_cache(cfg.n_layer, S, 64, cfg.n_kv_head, cfg.head_dim),
        forward_step)
    toks_ref, last_ref, _, _ = decode_loop(
        lm.weights, ref_cache, jnp.asarray([5, 6], jnp.int32),
        jnp.ones((S,), bool), cfg, params, new_state(S, seed=7), 8)

    mesh = tp.tp_mesh(4)
    lm2 = load_model(path, sharder=tp.TPSharder(mesh))
    fwd, dloop = tp.make_tp_functions(mesh, lm2.weights, cfg)
    cache = tp.shard_cache_tp(
        new_cache(cfg.n_layer, S, 64, cfg.n_kv_head, cfg.head_dim), mesh)
    cache = prefill(lm2.weights, cache, fwd)
    toks_tp, last_tp, _, _ = dloop(
        lm2.weights, cache, jnp.asarray([5, 6], jnp.int32),
        jnp.ones((S,), bool), cfg, params, new_state(S, seed=7), 8)
    np.testing.assert_array_equal(np.asarray(toks_ref), np.asarray(toks_tp))
    np.testing.assert_array_equal(np.asarray(last_ref), np.asarray(last_tp))


def test_tp_row_parallel_layout_required(tmp_path_factory):
    """Loading without TPSharder leaves perm_shards=1 on wo/w_down;
    validate_tp must reject it rather than compute garbage."""
    path = _build(tmp_path_factory, "q8_0")
    lm = load_model(path)
    with pytest.raises(ValueError, match="perm_shards|unfused"):
        tp.validate_tp(lm.cfg, lm.weights, 4)


def test_tp_engine_generates_same_tokens(tmp_path_factory):
    """Engine-level TP: InferenceEngine(mesh=...) serving 4 concurrent
    greedy requests produces the same tokens as the unsharded engine."""
    from tpu_engine.serve import CompletionParams, InferenceEngine

    path = _build(tmp_path_factory, "q4_k_m")

    def run(lm, mesh=None):
        eng = InferenceEngine(lm, n_ctx=256, n_parallel=4, n_batch=64,
                              prefill_buckets=(16,), mesh=mesh)
        try:
            sp = SamplingParams(temperature=0.0)
            tids = [
                eng.request_completion(CompletionParams(
                    prompt=[1, 30 + i, 40 + i, 50], n_predict=12,
                    sampling=sp, cache_prompt=False))
                for i in range(4)
            ]
            outs = {}
            for tid in tids:
                while True:
                    r = eng.next_result(tid, timeout=300.0)
                    assert not r.error, r.error_message
                    if r.stop:
                        outs[tid] = r.text
                        break
            return [outs[t] for t in tids]
        finally:
            eng.shutdown()

    ref = run(load_model(path))
    mesh = tp.tp_mesh(4)
    got = run(load_model(path, sharder=tp.TPSharder(mesh)), mesh=mesh)
    assert ref == got


@pytest.mark.parametrize("n_data,n_model", [(2, 1), (2, 2)])
def test_dp_engine_generates_same_tokens(tmp_path_factory, n_data, n_model):
    """Data-parallel serving (slots sharded over the mesh "data" axis,
    dist/tp.py): the engine under a (data, model) mesh produces the same
    greedy tokens as the unsharded engine — prefill rows route to the
    owning data-shard (masked + psum-reassembled logits), batched decode
    runs fully local per shard."""
    from tpu_engine.serve import CompletionParams, InferenceEngine

    path = _build(tmp_path_factory, "q4_k_m")

    def run(lm, mesh=None):
        eng = InferenceEngine(lm, n_ctx=256, n_parallel=4, n_batch=64,
                              prefill_buckets=(16,), mesh=mesh)
        try:
            sp = SamplingParams(temperature=0.0)
            tids = [
                eng.request_completion(CompletionParams(
                    prompt=[1, 30 + i, 40 + i, 50], n_predict=12,
                    sampling=sp, cache_prompt=False))
                for i in range(4)
            ]
            outs = {}
            for tid in tids:
                while True:
                    r = eng.next_result(tid, timeout=300.0)
                    assert not r.error, r.error_message
                    if r.stop:
                        outs[tid] = r.text
                        break
            return [outs[t] for t in tids]
        finally:
            eng.shutdown()

    ref = run(load_model(path))
    mesh = tp.tp_mesh(n_model, n_data=n_data)
    assert tp.dp_degree(mesh, 4) == n_data
    lm = load_model(path, sharder=tp.TPSharder(mesh) if n_model > 1 else None)
    got = run(lm, mesh=mesh)
    assert ref == got


def test_dp_decode_loop_slots_sharded(tmp_path_factory):
    """The dp decode loop's cache really is slot-sharded: each data-shard
    holds S/dp slots (addressable shards differ), and lengths bump
    per-slot exactly as the unsharded path."""
    path = _build(tmp_path_factory, "q8_0")
    lm = load_model(path)
    cfg = lm.cfg
    S = 4
    mesh = tp.tp_mesh(1, n_data=2)
    fwd, dloop = tp.make_tp_functions(mesh, lm.weights, cfg)
    cache = tp.shard_cache_tp(
        new_cache(cfg.n_layer, S, 64, cfg.n_kv_head, cfg.head_dim), mesh)
    # slot dim sharded over "data"
    assert "data" in str(cache.k.sharding.spec)
    _, cache, _ = fwd(
        lm.weights, cache, jnp.asarray([PROMPT] * S, jnp.int32),
        jnp.arange(S, dtype=jnp.int32), jnp.ones((S,), bool), cfg)
    params = params_from_host([SamplingParams(temperature=0.0)] * S)
    toks, last, cache, _ = dloop(
        lm.weights, cache, jnp.asarray([5, 6, 7, 8], jnp.int32),
        jnp.ones((S,), bool), cfg, params, new_state(S, seed=7), 6)
    assert np.asarray(toks).shape == (S, 6)
    np.testing.assert_array_equal(
        np.asarray(cache.lengths), [len(PROMPT) + 6] * S)


def test_dp_chained_dloop_one_executable(tmp_path_factory):
    """Chained decode chunks under dp must reuse ONE dloop executable:
    a chunk's outputs carry P("data") shardings, and EngineOps commits
    reset-path inputs (tokens, sampler params/state) to that same
    placement (ops._row_put) so the jit signature never changes between
    a reset chunk, a chained chunk, and a later reset (ADVICE r3)."""
    from tpu_engine.serve.ops import EngineOps

    path = _build(tmp_path_factory, "q8_0")
    lm = load_model(path)
    cfg = lm.cfg
    S = 4
    mesh = tp.tp_mesh(1, n_data=2)
    fwd, dloop = tp.make_tp_functions(mesh, lm.weights, cfg)
    cache = tp.shard_cache_tp(
        new_cache(cfg.n_layer, S, 64, cfg.n_kv_head, cfg.head_dim), mesh)
    ops = EngineOps(lm, cfg, cache, fwd, dloop, 1, 0, mesh=mesh)
    assert ops._row_sharding is not None
    active = np.ones((S,), bool)
    reset = dict(pending=[5, 6, 7, 8], by_slot=[SamplingParams()] * S,
                 prevs=[[1, 2]] * S, seed=3)
    ops.dloop(4, active, reset=dict(reset))
    ops.dloop(4, active)                    # chained: P("data") outputs
    ops.dloop(4, active, reset=dict(reset))  # reset again: host arrays
    assert dloop._cache_size() == 1, (
        f"dloop compiled {dloop._cache_size()} signatures; chained/reset "
        "chunks must share one")
