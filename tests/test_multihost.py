"""Multi-host serving simulation (dist/multihost.py): two OS processes,
each with 2 virtual CPU devices, forming one 4-device tensor-parallel mesh.
Host 0 runs the real engine and broadcasts its op stream; host 1 replays.

Asserts (a) the leader's generated texts equal a single-process engine run
and (b) the cross-process device-state checksum matched (printed by the
demo after serving).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

from tests.models import build_test_gguf

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_serving_matches_single_process(tmp_path):
    path = str(tmp_path / "tiny.gguf")
    build_test_gguf(path, "q4_k_m", seed=9, n_heads=8, n_kv_heads=4,
                    hidden_size=256, intermediate_size=256)

    # single-process reference (no TP, same engine semantics)
    from tpu_engine.model.loader import load_model
    from tpu_engine.sampling import SamplingParams
    from tpu_engine.serve import CompletionParams, InferenceEngine

    eng = InferenceEngine(load_model(path), n_ctx=256, n_parallel=4,
                          prefill_buckets=(16,), decode_chunk=4)
    try:
        sp = SamplingParams(temperature=0.0)
        tids = [
            eng.request_completion(CompletionParams(
                prompt=[1, 30 + i, 40 + i, 50], n_predict=12,
                sampling=sp, cache_prompt=False))
            for i in range(4)
        ]
        ref = []
        for tid in tids:
            while True:
                r = eng.next_result(tid, timeout=300.0)
                assert not r.error, r.error_message
                if r.stop:
                    ref.append(r.text)
                    break
    finally:
        eng.shutdown()

    # two-process run: leader + follower subprocesses
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # each process sets its own device count
    env.pop("JAX_PLATFORMS", None)

    def spawn(pid):
        return subprocess.Popen(
            [sys.executable, os.path.join(REPO, "scripts", "multihost_demo.py"),
             "--model", path, "--process-id", str(pid),
             "--coordinator", coord],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, cwd=REPO)

    leader, follower = spawn(0), spawn(1)
    try:
        out, err = leader.communicate(timeout=600)
        fout, ferr = follower.communicate(timeout=60)
    except subprocess.TimeoutExpired:
        leader.kill()
        follower.kill()
        raise
    assert leader.returncode == 0, err.decode()[-2000:]
    assert follower.returncode == 0, ferr.decode()[-2000:]
    line = [ln for ln in out.decode().splitlines() if ln.startswith("{")][-1]
    res = json.loads(line)
    assert res["state_ok"], "cross-process device state diverged"
    assert res["texts"] == ref, (res["texts"], ref)
