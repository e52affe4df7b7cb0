"""Measure serving throughput under concurrent load (round 4).

The GenerationService batches same-bucket requests that arrive within
the batch window (serving/server.py) — measured so far only for
correctness (tests) and single-request latency.  This fires N
concurrent 1200-step requests at a warmed server and reports wall time
and per-request latencies; the batching win is (N × single-request
latency) / wall.

Run ALONE on the single-tenant chip:
  python scripts/exp_serving_load.py /tmp/mint_e2e_r4/model [N] [extra flags]
"""

import io
import json
import os
import socket
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STEPS = 1200


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main():
    ckpt_dir = os.path.abspath(sys.argv[1])
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    port = free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, "-m", "mint_tpu.serving.server",
           f"--checkpoint_dir={ckpt_dir}",
           f"--config_path={REPO}/configs/fact_v5_deeper_t10_cm12.config",
           f"--port={port}", f"--steps={STEPS}"] + sys.argv[3:]
    with open("/tmp/serving_load.log", "w") as log_f:
        proc = subprocess.Popen(cmd, env=env, stdout=log_f, stderr=log_f)
    try:
        t0 = time.time()
        while time.time() - t0 < 1800:
            if proc.poll() is not None:
                print("server exited early; see /tmp/serving_load.log")
                sys.exit(1)
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/healthz", timeout=5):
                    break
            except (urllib.error.URLError, ConnectionError, OSError):
                time.sleep(2)

        rng = np.random.default_rng(7)
        audio = rng.standard_normal((STEPS + 240, 35)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, audio)
        body = buf.getvalue()

        def one_request(out, i):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate?steps={STEPS}",
                data=body, method="POST")
            t = time.time()
            with urllib.request.urlopen(req, timeout=900) as r:
                arr = np.load(io.BytesIO(r.read()))
            out[i] = (time.time() - t, arr.shape)

        # Warm single request (baseline latency in this bucket).
        single = {}
        one_request(single, 0)
        warm_s = single[0][0]

        def concurrent_round():
            lat = {}
            threads = [threading.Thread(target=one_request, args=(lat, i))
                       for i in range(n)]
            t0 = time.time()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.time() - t0
            lats = sorted(v[0] for v in lat.values())
            return {"wall_s": round(wall, 2),
                    "latency_min_s": round(lats[0], 2),
                    "latency_max_s": round(lats[-1], 2),
                    "frames_per_sec": round(n * STEPS / wall, 1),
                    "batching_speedup": round(n * warm_s / wall, 2)}

        # Round 1 pays the batch-N bucket's one-time compile/staging;
        # round 2 is the steady state a loaded server actually runs at.
        cold = concurrent_round()
        steady = concurrent_round()
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=10) as r:
            stats = json.load(r)
        print(json.dumps({
            "n_concurrent": n, "warm_single_s": round(warm_s, 2),
            "first_round_bucket_warmup": cold,
            "steady_state": steady,
            "server_stats": stats}), flush=True)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


if __name__ == "__main__":
    main()
