"""2-process multi-host serving simulation on the CPU backend.

Launch one leader and N-1 followers (same command, different --process-id):

    python scripts/multihost_demo.py --model m.gguf --process-id 0 &
    python scripts/multihost_demo.py --model m.gguf --process-id 1

The leader runs the real InferenceEngine over a tensor-parallel mesh
spanning BOTH processes' devices (dist/multihost.py); followers replay the
op stream. The leader prints one JSON line with the generated texts and the
cross-process state-checksum verdict; tests/test_multihost.py asserts the
texts equal a single-process run and that the state matched.
"""

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--coordinator", default="localhost:19811")
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--tensor-parallel", type=int, default=4)
    ap.add_argument("--n-predict", type=int, default=12)
    args = ap.parse_args()

    from tpu_engine.dist import multihost

    multihost.initialize(args.coordinator, args.num_processes,
                         args.process_id, platform="cpu",
                         local_device_count=args.local_devices)

    if args.process_id != 0:
        multihost.serve_follower()
        return 0

    from tpu_engine.sampling import SamplingParams
    from tpu_engine.serve import CompletionParams

    channel = multihost.OpChannel()
    eng = multihost.start_leader(
        args.model, tensor_parallel=args.tensor_parallel, n_ctx=256,
        n_parallel=4, channel=channel, prefill_buckets=(16,), decode_chunk=4)
    try:
        sp = SamplingParams(temperature=0.0)
        tids = [
            eng.request_completion(CompletionParams(
                prompt=[1, 30 + i, 40 + i, 50], n_predict=args.n_predict,
                sampling=sp, cache_prompt=False))
            for i in range(4)
        ]
        outs = []
        for tid in tids:
            while True:
                r = eng.next_result(tid, timeout=600.0)
                if r.error:
                    raise RuntimeError(r.error_message)
                if r.stop:
                    outs.append(r.text)
                    break
        # wait for full engine quiescence (trailing speculative-chunk
        # settles also publish ops) before using the channel from this
        # thread
        import time
        for _ in range(1200):
            if not eng._spec_q and not any(
                    s.is_processing() for s in eng.slots):
                break
            time.sleep(0.05)
        time.sleep(0.25)
        # verify every process holds identical device state
        state_ok = multihost.verify_state(eng.ops, channel)
        print(json.dumps({"texts": outs, "state_ok": state_ok}), flush=True)
        return 0 if state_ok else 1
    finally:
        eng.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
