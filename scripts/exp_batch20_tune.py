"""Re-tune unroll x final-block rows at the new batch-20 dispatch (round 4).

The shipped decode knobs (unroll=8, rows=48) were swept at batch 40
(docs/BENCHMARKS.md round-2 tables).  The round-4 batch sweep moved the
bench protocol to two batch-20 dispatches — a different working set, so
the schedule-depth and truncation optima may sit elsewhere.  Full
1200-step bf16 programs, median of 3, one process (controlled chip
state); baseline config (u8, r48) runs FIRST as the control.

Run ALONE on the single-tenant chip:
  python scripts/exp_batch20_tune.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 20
STEPS = 1200
REPEATS = 3

# (unroll, last_block_rows) — control first.
CONFIGS = [(8, 48), (10, 48), (12, 48), (6, 48), (8, 32), (8, 64), (10, 32)]


def main():
    import jax
    import jax.numpy as jnp

    from mint_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    from mint_tpu.config.schema import load_pipeline_config
    from mint_tpu.models.fact import FACT, init_params
    from mint_tpu.infer.decoder import infer_auto_regressive

    pipe = load_pipeline_config(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "configs",
            "fact_v5_deeper_t10_cm12.config"))
    model = FACT(pipe.multi_modal_model.fact_model,
                 compute_dtype=jnp.bfloat16)
    params = init_params(model, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    inputs = {
        "motion_input": jnp.asarray(
            rng.standard_normal((BATCH, 120, 225)), jnp.float32),
        "audio_input": jnp.asarray(
            rng.standard_normal((BATCH, STEPS + 240, 35)), jnp.float32),
    }

    results = []
    for unroll, rows in CONFIGS:
        kw = dict(steps=STEPS, unroll=unroll, last_block_rows=rows)
        t0 = time.perf_counter()
        out = np.asarray(infer_auto_regressive(model, params, inputs, **kw))
        compile_s = time.perf_counter() - t0
        assert out.shape == (BATCH, STEPS, 225) and np.isfinite(out).all()
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            out = np.asarray(
                infer_auto_regressive(model, params, inputs, **kw))
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        rec = {"unroll": unroll, "rows": rows,
               "compile_s": round(compile_s, 1),
               "times_s": [round(t, 2) for t in times],
               "frames_per_sec": round(BATCH * STEPS / med, 1)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    best = max(results, key=lambda r: r["frames_per_sec"])
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
