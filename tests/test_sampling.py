"""Sampler chain tests: determinism, truncation stages, penalties, mirostat."""

import numpy as np

from tpu_engine.sampling import Sampler, SamplingParams

V = 100


def logits_ramp():
    return np.linspace(-5, 5, V).astype(np.float32)


def test_greedy_temp_zero():
    s = Sampler(SamplingParams(temperature=0.0), V)
    assert s.sample(logits_ramp()) == V - 1


def test_seeded_reproducible():
    a = Sampler(SamplingParams(seed=42), V)
    b = Sampler(SamplingParams(seed=42), V)
    la, lb = [], []
    for _ in range(20):
        la.append(a.sample(logits_ramp()))
        lb.append(b.sample(logits_ramp()))
    assert la == lb
    c = Sampler(SamplingParams(seed=43), V)
    lc = [c.sample(logits_ramp()) for _ in range(20)]
    assert lc != la


def test_top_k_restricts_support():
    s = Sampler(SamplingParams(top_k=3, top_p=1.0, min_p=0.0, seed=0), V)
    seen = {s.sample(logits_ramp()) for _ in range(200)}
    assert seen <= {V - 1, V - 2, V - 3}


def test_top_p_restricts_support():
    logits = np.full(V, -np.inf, np.float32)
    logits[:4] = np.log(np.array([0.5, 0.3, 0.15, 0.05]))
    s = Sampler(SamplingParams(top_k=0, top_p=0.8, min_p=0.0, temperature=1.0, seed=0), V)
    seen = {s.sample(logits) for _ in range(300)}
    # 0.5+0.3=0.8 -> token 2 included only if cumsum-before < p; tokens {0,1,2}
    assert seen <= {0, 1, 2}
    assert 0 in seen and 1 in seen


def test_min_p_filters_tail():
    logits = np.zeros(V, np.float32)
    logits[0] = 10.0  # dominant
    s = Sampler(SamplingParams(top_k=0, top_p=1.0, min_p=0.5, seed=0), V)
    seen = {s.sample(logits) for _ in range(100)}
    assert seen == {0}


def test_repeat_penalty_discourages():
    params = SamplingParams(temperature=0.0, repeat_penalty=1e9, repeat_last_n=64)
    s = Sampler(params, V)
    logits = logits_ramp()
    t1 = s.sample(logits)
    s.accept(t1)
    t2 = s.sample(logits)
    assert t2 != t1


def test_frequency_presence_penalty():
    params = SamplingParams(temperature=0.0, repeat_penalty=1.0,
                            frequency_penalty=100.0, repeat_last_n=64)
    s = Sampler(params, V)
    logits = logits_ramp()
    t1 = s.sample(logits)
    s.accept(t1)
    assert s.sample(logits) != t1


def test_logit_bias_and_ban():
    params = SamplingParams(temperature=0.0, logit_bias={0: 1000.0})
    s = Sampler(params, V)
    assert s.sample(logits_ramp()) == 0
    params = SamplingParams(temperature=0.0, logit_bias={V - 1: -100.0})
    s = Sampler(params, V)
    assert s.sample(logits_ramp()) == V - 2


def test_ignore_eos():
    params = SamplingParams(temperature=0.0, ignore_eos=True)
    s = Sampler(params, V, eos_id=V - 1)
    assert s.sample(logits_ramp()) == V - 2


def test_n_probs_capture():
    s = Sampler(SamplingParams(temperature=0.0, n_probs=5), V)
    tok = s.sample(logits_ramp())
    probs = s.last_probs
    assert len(probs) >= 5
    assert probs[0].token == tok
    assert probs[0].logprob <= 0.0
    lps = [tp.logprob for tp in probs[:5]]
    assert lps == sorted(lps, reverse=True)


def test_mirostat_runs_and_adapts():
    for version in (1, 2):
        s = Sampler(SamplingParams(mirostat=version, seed=7), V)
        toks = [s.sample(logits_ramp()) for _ in range(10)]
        assert all(0 <= t < V for t in toks)
        assert s.mu is not None


def test_typical_p():
    logits = np.zeros(V, np.float32)
    logits[:10] = 5.0
    s = Sampler(SamplingParams(top_k=0, top_p=1.0, min_p=0.0, typical_p=0.5, seed=0), V)
    seen = {s.sample(logits) for _ in range(100)}
    assert seen <= set(range(10))


def test_ignore_eos_bans_full_eog_set():
    """ignore_eos must ban EVERY end-of-generation id (eot/eom/flagged
    extras), not just eos — a grammar/model ranking a non-eos EOG first
    would otherwise stop generation despite ignore_eos."""
    params = SamplingParams(temperature=0.0, ignore_eos=True)
    s = Sampler(params, V, eos_id=V - 1, eog_ids=(V - 1, V - 3))
    # ramp: V-1 is argmax, V-2 runner-up, V-3 next — both EOGs banned
    assert s.sample(logits_ramp()) == V - 2
    logits = logits_ramp()
    logits[V - 2] = -1e9
    assert s.sample(logits) == V - 4
