"""A/B the eval stage at decode_batch 64 (old default) vs 8 (round 4).

The f32 batch sweep (exp_f32_batch.py) measured batch-8 dispatches 59%
faster in aggregate at the synthetic 1200-step scoring protocol; this
runs the REAL eval stage — the evaluate CLI against the recorded
round-4 E2E corpus and checkpoint (/tmp/mint_e2e_r4: 52 clips, true
generatable lengths, steps_bucket=128 quantization, f32) — at both
batch caps, fresh process each, B/A/A/B order so chip drift cancels.

Run ALONE on the single-tenant chip:
  python scripts/exp_eval_batch_ab.py
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROOT = "/tmp/mint_e2e_r4"
CONFIG = os.path.join(REPO, "configs", "fact_v5_deeper_t10_cm12.config")


def run_eval(tag, decode_batch):
    out_dir = f"{ROOT}/outputs_ab_{tag}"
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "mint_tpu.tools.evaluate",
         f"--config_path={CONFIG}", f"--model_dir={ROOT}/model",
         f"--output_dir={out_dir}", "--steps=1200", "--timeout=1",
         f"--decode_batch={decode_batch}"],
        cwd=REPO, capture_output=True, text=True, timeout=5400)
    dt = time.time() - t0
    n = len([f for f in os.listdir(out_dir) if f.endswith(".npy")]) \
        if os.path.isdir(out_dir) else 0
    ok = proc.returncode == 0 and n > 0
    print(json.dumps({"stage": f"evaluate[{tag}]",
                      "decode_batch": decode_batch,
                      "wall_s": round(dt, 1), "clips": n, "ok": ok}),
          flush=True)
    if not ok:
        print(proc.stderr[-3000:], flush=True)
    return dt, ok


def main():
    if not os.path.isdir(f"{ROOT}/model"):
        raise SystemExit(f"{ROOT}/model missing — run scripts/e2e_run.py")
    # Interleaved B/A/A/B: first run of each config also pays any cold
    # compile for its batch shapes; the SECOND run of each is the
    # steady-state comparison.
    for tag, batch in (("b64_cold", 64), ("b8_cold", 8),
                       ("b8_warm", 8), ("b64_warm", 64)):
        run_eval(tag, batch)


if __name__ == "__main__":
    main()
