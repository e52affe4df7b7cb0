"""Interleaved A/B: decode knobs (10,32) vs shipped (8,48) at batch 20.

The batch-20 tune sweep (exp_batch20_tune.py) read (10,32) at 1804.7
f/s vs the shipped (8,48) control at 1775.9 — but (10,32) ran LAST in
the process and the chip got faster through the run, so the +1.6%
could be drift.  This interleaves B/A/B/A (candidate first, so any
drift now favors the control), 3 timed repeats per leg, both configs
pre-compiled before any timing.

Run ALONE on the single-tenant chip:
  python scripts/exp_batch20_ab.py
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
CAND = (10, 32)
CTRL = (8, 48)


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

    def run(unroll, rows):
        out = np.asarray(infer_auto_regressive(
            model, params, inputs, steps=STEPS, unroll=unroll,
            last_block_rows=rows))
        assert out.shape == (BATCH, STEPS, 225) and np.isfinite(out).all()

    def timed(unroll, rows):
        ts = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            run(unroll, rows)
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        return {"config": [unroll, rows],
                "times_s": [round(t, 2) for t in ts],
                "frames_per_sec": round(BATCH * STEPS / med, 1)}

    # Pre-compile both (cache-warm from the sweep) before any timing.
    run(*CAND)
    run(*CTRL)

    legs = []
    for cfg in (CAND, CTRL, CAND, CTRL):
        rec = timed(*cfg)
        legs.append(rec)
        print(json.dumps(rec), flush=True)

    def med_of(cfg):
        ts = [t for leg in legs if leg["config"] == list(cfg)
              for t in leg["times_s"]]
        return BATCH * STEPS / float(np.median(ts))

    print(json.dumps({"candidate_f_s": round(med_of(CAND), 1),
                      "control_f_s": round(med_of(CTRL), 1)}))


if __name__ == "__main__":
    main()
