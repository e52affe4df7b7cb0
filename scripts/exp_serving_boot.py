"""Measure serving boot-to-ready + first request through the REAL CLI.

Round-3 recorded ~280 s boot-to-ready — but that was measured BEFORE the
params-only / abstract-template restore fixes landed, and the round-3
verdict flagged the post-fix number as a prediction.  This starts a
fresh `python -m mint_tpu.serving.server` process against a real
checkpoint directory (the recorded E2E run's model dir), waits for the
port to accept, and times:

- boot-to-ready: process start -> first successful /healthz (the server
  binds the port only after restore + warmup),
- first request in the warmed bucket,
- warm repeat.

Run ALONE on the single-tenant chip:
  python scripts/exp_serving_boot.py /tmp/mint_e2e_r4/model [steps]
"""

import io
import json
import os
import socket
import subprocess
import sys
import time
import urllib.error
import urllib.request

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main():
    ckpt_dir = os.path.abspath(sys.argv[1])
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1200
    port = free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, "-m", "mint_tpu.serving.server",
           f"--checkpoint_dir={ckpt_dir}",
           f"--config_path={REPO}/configs/fact_v5_deeper_t10_cm12.config",
           f"--port={port}", f"--steps={steps}"] + sys.argv[3:]
    t0 = time.time()
    with open("/tmp/serving_boot.log", "w") as log_f:
        proc = subprocess.Popen(cmd, env=env, stdout=log_f, stderr=log_f)
        try:
            ready = None
            while time.time() - t0 < 1800:
                if proc.poll() is not None:
                    print("server exited early; see /tmp/serving_boot.log")
                    sys.exit(1)
                try:
                    with urllib.request.urlopen(
                            f"http://127.0.0.1:{port}/healthz", timeout=5):
                        ready = time.time() - t0
                        break
                except (urllib.error.URLError, ConnectionError, OSError):
                    time.sleep(2)
            assert ready is not None, "server never became ready"

            rng = np.random.default_rng(5)
            audio = rng.standard_normal((steps + 240, 35)).astype(np.float32)
            buf = io.BytesIO()
            np.save(buf, audio)
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate?steps={steps}",
                data=buf.getvalue(), method="POST")
            t1 = time.time()
            with urllib.request.urlopen(req, timeout=900) as r:
                out = np.load(io.BytesIO(r.read()))
            first = time.time() - t1
            t1 = time.time()
            with urllib.request.urlopen(req, timeout=900) as r:
                np.load(io.BytesIO(r.read()))
            warm = time.time() - t1
            print(json.dumps({
                "boot_to_ready_s": round(ready, 1),
                "first_request_s": round(first, 2),
                "warm_request_s": round(warm, 2),
                "steps": steps, "out_shape": list(out.shape)}), flush=True)
        finally:
            proc.terminate()
            try:
                proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()


if __name__ == "__main__":
    main()
