"""Multi-device sharding tests on the virtual 8-device CPU mesh:
TP/DP-sharded decode must produce the same logits as single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.models import build_test_gguf
from tpu_engine.dist import make_mesh, make_sharder, shard_cache, shard_weights
from tpu_engine.kvcache.cache import new_cache
from tpu_engine.model.llama import forward_step
from tpu_engine.model.loader import load_model

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")

PROMPT = [1, 270, 272, 274, 280, 300, 310, 320]


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    d = tmp_path_factory.mktemp("models")
    # n_kv_head=2 won't divide model=4; use 4 kv heads, 8 q heads
    path = str(d / "tiny.gguf")
    build_test_gguf(path, "f32", seed=9, n_heads=8, n_kv_heads=4,
                    hidden_size=256, intermediate_size=256)
    return load_model(path)


def run_once(lm, weights, cache):
    logits, cache, _ = forward_step(
        weights, cache, jnp.asarray([PROMPT], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), lm.cfg,
    )
    step, cache, _ = forward_step(
        weights, cache, jnp.asarray([[50], [60]], jnp.int32),
        jnp.asarray([0, 1], jnp.int32), jnp.asarray([True, True]), lm.cfg,
    )
    return np.asarray(logits), np.asarray(step)


@pytest.mark.parametrize("n_data,n_model", [(1, 4), (1, 8), (2, 4)])
def test_tp_matches_single_device(tiny, n_data, n_model):
    lm = tiny
    cfg = lm.cfg
    ref_cache = new_cache(cfg.n_layer, 2, 32, cfg.n_kv_head, cfg.head_dim)
    ref_prefill, ref_step = run_once(lm, lm.weights, ref_cache)

    mesh = make_mesh(n_data=n_data, n_model=n_model)
    sw = shard_weights(lm.weights, mesh)
    scache = shard_cache(new_cache(cfg.n_layer, 2, 32, cfg.n_kv_head, cfg.head_dim), mesh)
    with mesh:
        got_prefill, got_step = run_once(lm, sw, scache)
    np.testing.assert_allclose(got_prefill, ref_prefill, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got_step, ref_step, rtol=2e-4, atol=2e-4)


def test_quantized_tp(tiny, tmp_path):
    path = str(tmp_path / "q.gguf")
    build_test_gguf(path, "q8_0", seed=9, n_heads=8, n_kv_heads=4,
                    hidden_size=256, intermediate_size=256)
    lm = load_model(path)
    cfg = lm.cfg
    ref_cache = new_cache(cfg.n_layer, 2, 32, cfg.n_kv_head, cfg.head_dim)
    ref_prefill, ref_step = run_once(lm, lm.weights, ref_cache)
    mesh = make_mesh(n_data=1, n_model=4)
    sw = shard_weights(lm.weights, mesh)
    scache = shard_cache(new_cache(cfg.n_layer, 2, 32, cfg.n_kv_head, cfg.head_dim), mesh)
    with mesh:
        got_prefill, got_step = run_once(lm, sw, scache)
    np.testing.assert_allclose(got_prefill, ref_prefill, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got_step, ref_step, rtol=2e-4, atol=2e-4)


def test_loader_sharder_hook(tiny, tmp_path):
    path = str(tmp_path / "m.gguf")
    build_test_gguf(path, "f32", seed=9, n_heads=8, n_kv_heads=4,
                    hidden_size=256, intermediate_size=256)
    mesh = make_mesh(n_data=1, n_model=4)
    lm = load_model(path, sharder=make_sharder(mesh))
    wq = lm.weights["layers"]["wq"]  # stacked (scanned) layer dict
    # verify the placement is actually sharded over 4 devices
    assert len(wq.qs.sharding.device_set) == 4
