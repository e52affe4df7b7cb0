"""Sweep decode BATCH SIZE under the bf16 BENCH protocol (round 4).

The f32 scoring sweep (exp_f32_batch.py) found small batches decode
dramatically faster per frame: batch 8 at 1683 f/s vs batch 64 at
1061 f/s, and 64 clips finish 37% sooner as 8 sequential batch-8
dispatches than as one batch-64 dispatch.  bench.py's headline decodes
its 40 clips in ONE batch-40 dispatch — if the same shape effect holds
at bf16, the headline protocol (40 clips x 1200 frames, total frames /
total wall) is faster as several small dispatches.

Measures, for batch in {5, 8, 10, 20, 40} (divisors of 40 so the
aggregate is exact): bf16 decode, bench shapes (no dispatch chunking,
one program per repeat, like bench.py), median of 3, reporting the
batch's own f/s and the aggregate f/s for the full 40-clip protocol
(40/batch sequential dispatches).

Run ALONE on the single-tenant chip:
  python scripts/exp_bench_batch.py [batch sizes...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CLIPS = 40
STEPS = 1200
REPEATS = 3


def main():
    import jax
    import jax.numpy as jnp

    from mint_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    from mint_tpu.config.schema import load_pipeline_config
    from mint_tpu.models.fact import FACT, init_params
    from mint_tpu.infer.decoder import infer_auto_regressive

    batches = [int(a) for a in sys.argv[1:]] or [5, 8, 10, 20, 40]

    pipe = load_pipeline_config(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "configs",
            "fact_v5_deeper_t10_cm12.config"))
    model = FACT(pipe.multi_modal_model.fact_model,
                 compute_dtype=jnp.bfloat16)
    params = init_params(model, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    results = []
    for batch in batches:
        inputs = {
            "motion_input": jnp.asarray(
                rng.standard_normal((batch, 120, 225)), jnp.float32),
            "audio_input": jnp.asarray(
                rng.standard_normal((batch, STEPS + 240, 35)), jnp.float32),
        }
        t0 = time.perf_counter()
        out = np.asarray(infer_auto_regressive(model, params, inputs,
                                               steps=STEPS))
        compile_s = time.perf_counter() - t0
        assert out.shape == (batch, STEPS, 225) and np.isfinite(out).all()
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            out = np.asarray(infer_auto_regressive(model, params, inputs,
                                                   steps=STEPS))
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        n_dispatch = (CLIPS + batch - 1) // batch
        rec = {"batch": batch,
               "compile_s": round(compile_s, 1),
               "times_s": [round(t, 2) for t in times],
               "frames_per_sec": round(batch * STEPS / med, 1),
               "agg_40clips_fps": round(
                   CLIPS * STEPS / (n_dispatch * med), 1)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    best = max(results, key=lambda r: r["agg_40clips_fps"])
    print(json.dumps({"best_aggregate": best}))


if __name__ == "__main__":
    main()
