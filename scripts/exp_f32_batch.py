"""Sweep decode BATCH SIZE on the f32 scoring path (round 4).

The serving load test measured f32 batch-8 decode at ~1564 f/s while
the f32 scoring sweep (exp_f32_decode.py) measured batch-64 at
~1103 f/s — per-frame, the smaller batch looked ~40% more efficient.
If that holds under the scoring protocol, the evaluator's pow2 bucket
padding (52 clips -> one batch of 64) is the wrong shape: several
small batches would finish the same clips sooner.

Measures, for batch in {8, 16, 32, 64}: full 1200-step f32 decode
(unroll=8, rows=48, 200-step dispatch chunks — the scoring defaults),
median of 3, and reports both the batch's own f/s and the aggregate
f/s for decoding 64 clips in 64/batch sequential dispatches.

Run ALONE on the single-tenant chip:
  python scripts/exp_f32_batch.py [batch sizes...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STEPS = 1200
CHUNK = 200
REPEATS = 3


def main():
    import jax
    import jax.numpy as jnp

    from mint_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    from mint_tpu.config.schema import load_pipeline_config
    from mint_tpu.models.fact import FACT, init_params
    from mint_tpu.infer.decoder import infer_auto_regressive

    batches = [int(a) for a in sys.argv[1:]] or [8, 16, 32, 64]

    pipe = load_pipeline_config(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "configs",
            "fact_v5_deeper_t10_cm12.config"))
    model = FACT(pipe.multi_modal_model.fact_model)  # f32 compute
    params = init_params(model, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    results = []
    for batch in batches:
        inputs = {
            "motion_input": jnp.asarray(
                rng.standard_normal((batch, 120, 225)), jnp.float32),
            "audio_input": jnp.asarray(
                rng.standard_normal((batch, STEPS + 240 - 1, 35)),
                jnp.float32),
        }
        kw = dict(steps=STEPS, unroll=8, dispatch_chunk=CHUNK,
                  last_block_rows=48)
        t0 = time.perf_counter()
        out = np.asarray(infer_auto_regressive(model, params, inputs, **kw))
        compile_s = time.perf_counter() - t0
        assert out.shape == (batch, STEPS, 225) and np.isfinite(out).all()
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            out = np.asarray(
                infer_auto_regressive(model, params, inputs, **kw))
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        n_dispatch = (64 + batch - 1) // batch
        rec = {"batch": batch,
               "compile_s": round(compile_s, 1),
               "times_s": [round(t, 2) for t in times],
               "frames_per_sec": round(batch * STEPS / med, 1),
               "agg_64clips_fps": round(64 * STEPS / (n_dispatch * med), 1)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    best = max(results, key=lambda r: r["agg_64clips_fps"])
    print(json.dumps({"best_aggregate": best}))


if __name__ == "__main__":
    main()
