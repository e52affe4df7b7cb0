"""Re-measure the E2E eval stage + serving cold start (round-3 item 1).

Round 2 recorded 1,404 s for the 51-clip eval pass (docs/E2E.md stage 5,
one compiled decode program per distinct generatable length, no
persistent compile cache) and a 54-400 s serving cold request.  Round 3
turned on the persistent XLA cache in every CLI and defaulted
--steps_bucket=128; this measures the effect against the same recorded
corpus/model at /tmp/mint_e2e.

Run 1 (cold process, possibly cold disk cache) populates the cache;
run 2 (cold process, warm disk cache) is the production restart number.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROOT = "/tmp/mint_e2e"
CONFIG = os.path.join(REPO, "configs", "fact_v5_deeper_t10_cm12.config")


def run_eval(tag, extra=()):
    out_dir = f"{ROOT}/outputs_r3_{tag}"
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "mint_tpu.tools.evaluate",
         f"--config_path={CONFIG}", f"--model_dir={ROOT}/model",
         f"--output_dir={out_dir}", "--steps=1200", "--timeout=1",
         *extra],
        cwd=REPO, capture_output=True, text=True, timeout=5400)
    dt = time.time() - t0
    n = len([f for f in os.listdir(out_dir) if f.endswith(".npy")]) \
        if os.path.isdir(out_dir) else 0
    ok = proc.returncode == 0 and n > 0
    print(json.dumps({"stage": f"evaluate[{tag}]", "wall_s": round(dt, 1),
                      "clips": n, "ok": ok}), flush=True)
    if not ok:
        print(proc.stderr[-3000:], flush=True)
    return dt


def main():
    run_eval("coldcache")   # compiles the bucketed programs, fills cache
    run_eval("warmcache")   # production restart: disk-cache hits only


if __name__ == "__main__":
    main()
