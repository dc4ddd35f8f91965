"""Serving engine tests: completion flow, streaming, stops, parallel slots,
prompt cache, cancel, embeddings, grammar-constrained output."""

import time

import numpy as np
import pytest

from tests.models import build_test_gguf
from tpu_engine.model.loader import load_model
from tpu_engine.sampling import SamplingParams
from tpu_engine.serve import CompletionParams, InferenceEngine, StopReason


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    d = tmp_path_factory.mktemp("models")
    path = str(d / "tiny.gguf")
    build_test_gguf(path, "f32", seed=3)
    lm = load_model(path)
    eng = InferenceEngine(lm, n_ctx=256, n_parallel=2, n_batch=64,
                          prefill_buckets=(16, 32))
    yield eng
    eng.shutdown()


def collect(eng, task_id, timeout=120.0):
    parts, final = [], None
    deadline = time.time() + timeout
    while time.time() < deadline:
        r = eng.next_result(task_id, timeout=timeout)
        if r.error:
            raise RuntimeError(r.error_message)
        if r.stop:
            final = r
            break
        parts.append(r.text)
    assert final is not None, "no final result"
    return parts, final


def greedy(n=8, **kw):
    sp = SamplingParams(temperature=0.0)
    return CompletionParams(n_predict=n, sampling=sp, **kw)


def test_basic_completion(engine):
    tid = engine.request_completion(greedy(prompt="hello world", n=6))
    parts, final = collect(engine, tid)
    assert final.tokens_predicted <= 6
    assert final.tokens_evaluated > 0
    assert final.timings["prompt_n"] > 0
    assert isinstance(final.text, str)


def test_streaming_deltas_concat_to_final(engine):
    p = greedy(prompt="the quick brown", n=8)
    p.stream = True
    tid = engine.request_completion(p)
    parts, final = collect(engine, tid)
    p2 = greedy(prompt="the quick brown", n=8)
    tid2 = engine.request_completion(p2)
    _, final2 = collect(engine, tid2)
    assert "".join(parts) + final.text == final2.text


def test_deterministic_across_requests(engine):
    outs = []
    for _ in range(2):
        tid = engine.request_completion(greedy(prompt="hello world", n=8))
        _, final = collect(engine, tid)
        outs.append(final.text)
    assert outs[0] == outs[1]


def test_parallel_requests(engine):
    tids = [
        engine.request_completion(greedy(prompt=f"hello world {i}", n=6))
        for i in range(4)  # more tasks than slots: exercises deferral
    ]
    finals = [collect(engine, t)[1] for t in tids]
    assert all(f.tokens_predicted > 0 for f in finals)


def test_parallel_same_as_serial(engine):
    """Slot isolation: concurrent decoding must not change outputs."""
    t1 = engine.request_completion(greedy(prompt="hello world", n=8))
    t2 = engine.request_completion(greedy(prompt="the lazy dog", n=8))
    _, f1 = collect(engine, t1)
    _, f2 = collect(engine, t2)
    t3 = engine.request_completion(greedy(prompt="hello world", n=8))
    _, f3 = collect(engine, t3)
    assert f1.text == f3.text


def test_stop_word(engine):
    # discover the natural greedy output, then use a substring as stop word
    tid = engine.request_completion(greedy(prompt="hello world", n=8))
    _, base = collect(engine, tid)
    # deterministic: seed=3 synthetic model always yields enough text
    assert len(base.text) >= 3
    stop = base.text[2:4]
    p = greedy(prompt="hello world", n=8)
    p.stop = [stop]
    tid = engine.request_completion(p)
    _, final = collect(engine, tid)
    assert final.stop_reason == StopReason.WORD
    assert final.stopping_word == stop
    assert stop not in final.text
    assert final.text == base.text[: base.text.index(stop)]


def test_stream_stop_word_holdback(engine):
    tid = engine.request_completion(greedy(prompt="hello world", n=8))
    _, base = collect(engine, tid)
    assert len(base.text) >= 4
    stop = base.text[3:5]
    p = greedy(prompt="hello world", n=8)
    p.stop = [stop]
    p.stream = True
    tid = engine.request_completion(p)
    parts, final = collect(engine, tid)
    text = "".join(parts) + final.text
    assert stop not in text
    assert text == base.text[: base.text.index(stop)]


def test_budget_limit(engine):
    tid = engine.request_completion(greedy(prompt="hello", n=3))
    _, final = collect(engine, tid)
    assert final.tokens_predicted == 3
    assert final.stop_reason in (StopReason.LIMIT, StopReason.EOS)


def test_prompt_cache_reuse(engine):
    p1 = greedy(prompt="the quick brown fox jumps", n=4)
    tid = engine.request_completion(p1)
    _, f1 = collect(engine, tid)
    # same prompt again: newly processed tokens shrink to ~1 (re-eval last);
    # usage still reports the full prompt (reference num_prompt_tokens)
    tid = engine.request_completion(greedy(prompt="the quick brown fox jumps", n=4))
    _, f2 = collect(engine, tid)
    assert f2.text == f1.text
    assert f2.timings["prompt_n"] <= 2
    assert f2.tokens_evaluated == f1.tokens_evaluated


def test_cancel(engine):
    p = greedy(prompt="hello world", n=100000)
    p.stream = True
    tid = engine.request_completion(p)
    engine.next_result(tid, timeout=60.0)  # wait for first delta
    engine.request_cancel(tid)
    deadline = time.time() + 30
    while time.time() < deadline:
        r = engine.next_result(tid, timeout=30.0)
        if r.stop:
            return
    raise AssertionError("cancel did not finalize the task")


def test_embedding(engine):
    p = CompletionParams(prompt="hello world", embedding=True, n_predict=0)
    tid = engine.request_completion(p)
    _, final = collect(engine, tid)
    v = np.asarray(final.embedding)
    assert v.shape == (engine.cfg.n_embd,)
    np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-5)
    # deterministic
    tid = engine.request_completion(CompletionParams(prompt="hello world",
                                                     embedding=True))
    _, f2 = collect(engine, tid)
    np.testing.assert_allclose(v, np.asarray(f2.embedding), rtol=1e-5, atol=1e-6)


def test_n_probs(engine):
    p = greedy(prompt="hello", n=3)
    p.sampling.n_probs = 4
    tid = engine.request_completion(p)
    _, final = collect(engine, tid)
    assert len(final.probs) == final.tokens_predicted
    for entry in final.probs:
        assert len(entry["top"]) >= 4
        lps = [t["logprob"] for t in entry["top"][:4]]
        assert lps == sorted(lps, reverse=True)


def test_grammar_constrained(engine):
    p = greedy(prompt="hello", n=20)
    p.sampling.grammar = 'root ::= "yes" | "no"\n'
    tid = engine.request_completion(p)
    _, final = collect(engine, tid)
    assert final.text in ("yes", "no")


def test_json_schema_constrained(engine):
    p = greedy(prompt="give me json", n=60)
    p.json_schema = {
        "type": "object",
        "properties": {"ok": {"type": "boolean"}},
        "required": ["ok"],
    }
    tid = engine.request_completion(p)
    _, final = collect(engine, tid)
    import json as _json

    obj = _json.loads(final.text)
    assert set(obj) == {"ok"} and isinstance(obj["ok"], bool)


def test_empty_json_schema_still_constrains(engine):
    """{} is a VALID schema meaning "any JSON" — the response_format
    json_object case (reference llama_engine.cc:794-802). Regression: the
    falsy {} used to skip grammar setup entirely and emit free text."""
    p = greedy(prompt="say", n=24)
    p.json_schema = {}
    tid = engine.request_completion(p)
    _, final = collect(engine, tid)
    import json as _json

    _json.loads(final.text)  # must parse as a JSON value


def test_long_prompt_truncation(engine):
    # slot ctx = 256/2 = 128; prompt of 200 tokens must truncate, not crash
    ids = [5 + (i % 300) for i in range(200)]
    p = greedy(prompt="x", n=2)
    p.prompt = ids
    tid = engine.request_completion(p)
    _, final = collect(engine, tid)
    assert final.truncated
    assert final.tokens_predicted > 0


def test_multi_step_decode_equals_single(tmp_path_factory):
    """decode_chunk>1 (device-side sampling loop) must produce identical
    greedy output + identical cache bookkeeping as decode_chunk=1."""
    import tempfile
    from tests.models import build_test_gguf
    from tpu_engine.model.loader import load_model as _load

    d = tempfile.mkdtemp()
    path = d + "/m.gguf"
    build_test_gguf(path, "f32", seed=11)
    outs = {}
    for chunk in (1, 4):
        lm = _load(path)
        eng = InferenceEngine(lm, n_ctx=256, n_parallel=2, n_batch=64,
                              prefill_buckets=(16,), decode_chunk=chunk)
        try:
            tids = [
                engine_req(eng, "hello world", 11),
                engine_req(eng, "the quick brown", 9),
            ]
            outs[chunk] = [collect(eng, t)[1] for t in tids]
        finally:
            eng.shutdown()
    for a, b in zip(outs[1], outs[4]):
        assert a.text == b.text
        assert a.tokens_predicted == b.tokens_predicted


def engine_req(eng, prompt, n):
    return eng.request_completion(greedy(prompt=prompt, n=n))


def test_multi_step_with_stop_word(tmp_path_factory):
    import tempfile
    from tests.models import build_test_gguf
    from tpu_engine.model.loader import load_model as _load

    d = tempfile.mkdtemp()
    path = d + "/m.gguf"
    build_test_gguf(path, "f32", seed=11)
    lm = _load(path)
    eng = InferenceEngine(lm, n_ctx=256, n_parallel=2, n_batch=64,
                          prefill_buckets=(16,), decode_chunk=4)
    try:
        tid = engine_req(eng, "hello world", 12)
        _, base = collect(eng, tid)
        assert len(base.text) >= 4
        stop = base.text[2:4]
        p = greedy(prompt="hello world", n=12)
        p.stop = [stop]
        tid = eng.request_completion(p)
        _, final = collect(eng, tid)
        assert final.stop_reason == StopReason.WORD
        assert final.text == base.text[: base.text.index(stop)]
        # engine still healthy after mid-chunk stop + trim
        tid = engine_req(eng, "hello world", 6)
        _, again = collect(eng, tid)
        assert again.text == base.text[: len(again.text)]
    finally:
        eng.shutdown()


def test_system_prompt_broadcast(tmp_path):
    """System-prompt KV prefix decoded once and shared by all slots
    (reference UpdateSystemPrompt + llama_kv_cache_seq_cp,
    llama_server_context.cc:643-666)."""
    from tests.models import build_test_gguf
    from tpu_engine.model.loader import load_model
    from tpu_engine.serve.engine import InferenceEngine

    path = str(tmp_path / "tiny.gguf")
    build_test_gguf(path, "f32", seed=3)
    eng = InferenceEngine(load_model(path), n_ctx=256, n_parallel=2)
    try:
        outs = []
        for _ in range(2):
            tid = eng.request_completion(greedy(
                prompt="hello world", n=6, system_prompt="always be brief"))
            _, final = collect(eng, tid)
            outs.append(final)
        n_sys = len(eng.sys_tokens)
        assert n_sys > 0
        # deterministic across requests; usage counts system + prompt cells
        assert outs[0].text == outs[1].text
        assert outs[0].tokens_evaluated == outs[1].tokens_evaluated
        assert outs[0].tokens_evaluated > n_sys
        # both slots carry the shared prefix
        for s in eng.slots:
            assert s.cache_tokens[:n_sys] == eng.sys_tokens

        # changing the system prompt re-seeds and changes the continuation
        tid = eng.request_completion(greedy(
            prompt="hello world", n=6,
            system_prompt="respond only in French poetry with flair"))
        _, final3 = collect(eng, tid)
        assert len(eng.sys_tokens) != n_sys or final3.text != outs[0].text
    finally:
        eng.shutdown()


def test_two_prefill_groups_same_iteration(tmp_path):
    """Regression: two bucket GROUPS finishing prefill in one engine
    iteration must both get their first tokens. The device-chained
    first-token handle (_pending_first) was overwritten by the second
    _prefill_group call, leaving the first group's slots GENERATING with
    empty generated_tokens -> IndexError in _dispatch_chunk (engine
    fail-all). A long blocker prompt keeps the loop busy while four
    requests queue, so they land in slots in one ProcessTasks pass and
    prefill as two groups (2x bucket 16 + 2x bucket 32)."""
    from tpu_engine.serve.engine import InferenceEngine

    path = str(tmp_path / "tiny.gguf")
    build_test_gguf(path, "f32", seed=3)
    lm = load_model(path)
    eng = InferenceEngine(lm, n_ctx=5 * 256, n_parallel=5, n_batch=32,
                          prefill_buckets=(16, 32))
    try:
        blocker = eng.request_completion(greedy(prompt=[1] * 200, n=2))
        tids = [
            eng.request_completion(greedy(prompt=[2 + i] * ln, n=8))
            for i, ln in enumerate((10, 10, 24, 24))
        ]
        for tid in [blocker] + tids:
            _, final = collect(eng, tid)
            assert final.tokens_predicted > 0
        # the scenario must actually have occurred: >= 2 prefill groups
        # produced device-chained first tokens within one iteration
        # (otherwise the test passes vacuously — ADVICE.md round 2)
        assert eng.max_first_groups_iter >= 2, eng.max_first_groups_iter
    finally:
        eng.shutdown()


def test_grammar_device_lane_matches_host_lane(tmp_path_factory):
    """DFA-compilable grammars decode ON DEVICE (grammar/dfa.py +
    GrammarBank): same greedy tokens as the host-sampled lane, zero host
    steps, and a second different grammar shares the bank."""
    import tempfile

    d = tempfile.mkdtemp()
    path = d + "/m.gguf"
    build_test_gguf(path, "f32", seed=11)
    g1 = 'root ::= ("yes" | "no" | " ")*\n'
    g2 = 'root ::= [a-z]{1,6}\n'

    def run(bank_rows):
        eng = InferenceEngine(load_model(path), n_ctx=256, n_parallel=2,
                              n_batch=64, prefill_buckets=(16,),
                              grammar_bank_states=bank_rows)
        try:
            outs = []
            for g in (g1, g2):
                p = greedy(prompt="hello", n=24)
                p.sampling.grammar = g
                _, final = collect(eng, eng.request_completion(p))
                outs.append(final.text)
            return outs, eng.n_host_steps
        finally:
            eng.shutdown()

    host_out, host_steps = run(0)     # bank disabled: host lane
    dev_out, dev_steps = run(128)     # device lane
    assert host_steps > 0
    assert dev_steps == 0, "grammar slots fell back to the host lane"
    assert dev_out == host_out
    # outputs actually respect the grammars
    import re

    assert re.fullmatch(r"(yes|no| )*", dev_out[0]) is not None
    assert re.fullmatch(r"[a-z]{1,6}", dev_out[1]) is not None


def test_grammar_device_lane_mixed_batch(tmp_path_factory):
    """A DFA-grammar slot and an unconstrained slot decode CONCURRENTLY on
    the device lane (the reference collapses everyone to per-token host
    sampling when any grammar is active)."""
    import tempfile

    d = tempfile.mkdtemp()
    path = d + "/m.gguf"
    build_test_gguf(path, "f32", seed=12)
    eng = InferenceEngine(load_model(path), n_ctx=256, n_parallel=2,
                          n_batch=64, prefill_buckets=(16,))
    try:
        pg = greedy(prompt="hello", n=16)
        pg.sampling.grammar = 'root ::= ("ab" | "cd")*\n'
        pu = greedy(prompt="world", n=16)
        t1, t2 = eng.request_completion(pg), eng.request_completion(pu)
        _, f1 = collect(eng, t1)
        _, f2 = collect(eng, t2)
        import re

        assert re.fullmatch(r"(ab|cd)*", f1.text) is not None
        assert f2.tokens_predicted > 0
        assert eng.n_host_steps == 0
    finally:
        eng.shutdown()


def test_grammar_ignore_eos_single_slot_runs_full_budget(tmp_path_factory):
    """Regression: a lone request (single-slot prefill path samples its
    FIRST token on the host) with a grammar whose accept states legalize
    EOG + ignore_eos must decode the full budget — the host sampler used
    to ban only eos_id, so a non-eos EOG id (eot/flagged extra) ranked
    first by the model ended generation after one token."""
    import tempfile

    d = tempfile.mkdtemp()
    path = d + "/m.gguf"
    build_test_gguf(path, "f32", seed=11)
    eng = InferenceEngine(load_model(path), n_ctx=256, n_parallel=2,
                          n_batch=64, prefill_buckets=(16,))
    try:
        p = greedy(prompt="hello", n=24)
        p.sampling.grammar = 'root ::= ("yes" | "no" | " ")*\n'
        p.sampling.ignore_eos = True
        _, final = collect(eng, eng.request_completion(p))
        assert final.tokens_predicted == 24, final.tokens_predicted
        import re

        # budget can exhaust mid-piece (a token like "non" parks the DFA
        # inside the next "no") — allow one dangling partial literal
        assert re.fullmatch(r"(yes|no| )*(y|ye|n)?", final.text), final.text
        # and the grammar slot stayed on the device lane
        assert eng.n_host_steps == 0
    finally:
        eng.shutdown()
