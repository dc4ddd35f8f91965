"""Device sampler (sampling/device.py) unit tests: the ring-local penalty
scatter must match the straightforward vocab-wide reference formula, and
the all-greedy fast path must equal the full chain's greedy output."""

import jax.numpy as jnp
import numpy as np

from tpu_engine.sampling import SamplingParams
from tpu_engine.sampling.device import (
    RING_LEN,
    new_state,
    params_from_host,
    ring_from_tokens,
    sample_step,
)


def _ref_penalized(logits, ring, p: SamplingParams):
    """Reference: vocab-wide counts over the last penalty_last_n ring
    entries (reference sampler chain order, llama.cpp penalties)."""
    out = logits.copy()
    window = [t for t in ring[max(0, len(ring) - p.repeat_last_n):] if t >= 0]
    counts = {}
    for t in window:
        counts[t] = counts.get(t, 0) + 1
    for t, c in counts.items():
        v = out[t]
        v = v * p.repeat_penalty if v <= 0 else v / p.repeat_penalty
        v -= c * p.frequency_penalty
        v -= p.presence_penalty
        out[t] = v
    return out


def test_ring_local_penalties_match_reference():
    rng = np.random.default_rng(3)
    V, S = 503, 4
    p = SamplingParams(temperature=0.0, repeat_penalty=1.3,
                       frequency_penalty=0.4, presence_penalty=0.2,
                       repeat_last_n=10)
    params = params_from_host([p] * S)
    logits = rng.standard_normal((S, V)).astype(np.float32) * 3
    # histories with repeats, short rings, and tokens repeated both inside
    # and outside the penalty window
    hist = [
        [5, 5, 7, 9, 5, 11, 7, 7, 13, 5, 5, 9],   # longer than window
        [1, 2, 3],
        [],
        [42] * 20,
    ]
    state = new_state(S, seed=0)
    state = state.__class__(ring=ring_from_tokens(hist, S), keys=state.keys,
                            gstate=state.gstate)
    toks, _ = sample_step(jnp.asarray(logits), params, state)
    for s in range(S):
        ref = _ref_penalized(logits[s], hist[s], p)
        assert int(toks[s]) == int(np.argmax(ref)), s


def test_all_greedy_fast_path_matches_full_chain():
    rng = np.random.default_rng(5)
    V, S = 321, 3
    logits = rng.standard_normal((S, V)).astype(np.float32) * 2
    hist = [[7, 7, 9], [1], []]
    p = SamplingParams(temperature=0.0, repeat_penalty=1.2, repeat_last_n=8)
    fast = params_from_host([p] * S)
    assert fast.all_greedy
    # force the full chain by mixing in a non-greedy slot param, then
    # overriding its temp array back to 0 (structure changes, values equal)
    slow = params_from_host([p] * (S - 1) + [SamplingParams(temperature=0.7)])
    slow = slow.__class__(
        temp=jnp.zeros_like(slow.temp), top_k=slow.top_k, top_p=slow.top_p,
        min_p=slow.min_p, repeat_penalty=fast.repeat_penalty,
        freq_penalty=fast.freq_penalty, presence_penalty=fast.presence_penalty,
        penalty_last_n=fast.penalty_last_n, all_greedy=False)
    assert not slow.all_greedy

    st = new_state(S, seed=1)
    st = st.__class__(ring=ring_from_tokens(hist, S), keys=st.keys,
                      gstate=st.gstate)
    t_fast, _ = sample_step(jnp.asarray(logits), fast, st)
    st2 = new_state(S, seed=1)
    st2 = st2.__class__(ring=ring_from_tokens(hist, S), keys=st2.keys,
                        gstate=st2.gstate)
    t_slow, _ = sample_step(jnp.asarray(logits), slow, st2)
    np.testing.assert_array_equal(np.asarray(t_fast), np.asarray(t_slow))


def test_ring_evolves_identically_on_fast_path():
    p = SamplingParams(temperature=0.0)
    params = params_from_host([p])
    st = new_state(1, seed=0)
    logits = jnp.asarray(np.eye(1, 64, 5, dtype=np.float32) * 10)
    toks, st2 = sample_step(logits, params, st)
    assert int(toks[0]) == 5
    assert int(st2.ring[0, -1]) == 5
    assert st2.ring.shape == (1, RING_LEN)


def test_grammar_bank_masks_and_advances():
    """sample_step with a GrammarBank: masked tokens never sampled, gstate
    follows trans, row 0 passes everything through."""
    import numpy as np

    from tpu_engine.sampling.device import (
        GrammarBank,
        params_from_host,
        new_state,
        sample_step,
    )

    S, V, NS = 3, 16, 4
    mask = np.ones((NS, V), bool)
    trans = np.zeros((NS, V), np.int32)
    # state 1: only tokens {3, 5} legal; 3 -> state 2, 5 -> state 3
    mask[1] = False
    mask[1, [3, 5]] = True
    trans[1, 3], trans[1, 5] = 2, 3
    # state 2: only token 7 legal, stays
    mask[2] = False
    mask[2, 7] = True
    trans[2, 7] = 2
    bank = GrammarBank(mask=jnp.asarray(mask), trans=jnp.asarray(trans))

    logits = jnp.asarray(np.tile(np.linspace(0.0, 1.0, V), (S, 1)),
                         jnp.float32)  # argmax = V-1 unmasked
    params = params_from_host([SamplingParams(temperature=0.0)] * S)
    st = new_state(S, seed=0)
    st = st.__class__(ring=st.ring, keys=st.keys,
                      gstate=jnp.asarray([0, 1, 2], jnp.int32))
    toks, st2 = sample_step(logits, params, st, gbank=bank)
    toks = np.asarray(toks)
    assert toks[0] == V - 1      # pass-through row
    assert toks[1] == 5          # best of {3, 5}
    assert toks[2] == 7
    np.testing.assert_array_equal(np.asarray(st2.gstate), [0, 3, 2])


def test_ignore_eos_bans_eog_columns_per_slot():
    """ignore_eos runs ON DEVICE (device_compatible) by banning the
    tokenizer's EOG columns for exactly the slots that set it."""
    V, S = 64, 3
    eos = V - 1
    p_ban = SamplingParams(temperature=0.0, ignore_eos=True)
    p_keep = SamplingParams(temperature=0.0)
    params = params_from_host([p_ban, p_keep, None], eog_ids=(eos,))
    logits = np.zeros((S, V), np.float32)
    logits[:, eos] = 10.0  # EOG is argmax everywhere
    logits[:, 7] = 5.0
    state = new_state(S, seed=0)
    toks, _ = sample_step(jnp.asarray(logits), params, state)
    assert int(toks[0]) == 7        # banned -> runner-up
    assert int(toks[1]) == eos      # untouched
    assert int(toks[2]) == eos      # idle default: no ban


def test_ignore_eos_device_compatible_gate():
    from tpu_engine.sampling.device import device_compatible

    p = SamplingParams(temperature=0.0, ignore_eos=True)
    assert device_compatible(p, eog_ok=True)
    assert not device_compatible(p, eog_ok=False)
    assert device_compatible(SamplingParams(), eog_ok=False)
