"""Sweep the f32 SCORING decode path (round-4 verdict item #2).

Every scored output flows through f32 decode (tools/evaluate.py defaults
f32 deliberately — the reference's eager eval semantics, docs/E2E.md
"Decode dtype experiment"), but the decoder's unroll=8 / 48-row
final-block defaults were swept exclusively at bf16 bench shapes.  This
measures the eval-realistic configuration on the real chip:

- flagship fact_v5_deeper_t10_cm12 model, f32 compute,
- batch 64 (the evaluator's decode_batch; the E2E bucket pads 51->64),
- 1200 decode steps in 200-step dispatch chunks (the evaluator default),
- full-protocol timing (short probes mislead on this link — round-2/3
  lesson), median of 3 with forced host transfer.

Grid: unroll x last_block_rows around the bf16 optimum.  Run ALONE on
the single-tenant chip.  Usage:
  python scripts/exp_f32_decode.py [configs like 8x48 1x48 8x360 ...]
  F32_DECODE_BATCH=8 python scripts/exp_f32_decode.py ...
    (round 5: re-sweep at the SHIPPED batch — decode_batch defaulted
    to 8 after the round-4 batch sweep, and the batch-64 optimum need
    not transfer: the f32 flatness at 64 was attributed to batch-64
    bandwidth-boundedness.)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = int(os.environ.get("F32_DECODE_BATCH", "64"))
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

    configs = [tuple(int(v) for v in a.split("x")) for a in sys.argv[1:]]
    if not configs:
        configs = [(8, 48), (1, 48), (4, 48), (8, 360), (8, 128), (8, 16)]

    pipe = load_pipeline_config(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "configs",
            "fact_v5_deeper_t10_cm12.config"))
    model = FACT(pipe.multi_modal_model.fact_model)  # f32 compute
    params = init_params(model, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    inputs = {
        "motion_input": jnp.asarray(
            rng.standard_normal((BATCH, 120, 225)), jnp.float32),
        "audio_input": jnp.asarray(
            rng.standard_normal((BATCH, STEPS + 240 - 1, 35)), jnp.float32),
    }

    results = []
    for unroll, rows in configs:
        kw = dict(steps=STEPS, unroll=unroll, dispatch_chunk=CHUNK,
                  last_block_rows=rows)
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
               "ms_per_step": round(1e3 * med / STEPS, 2),
               "frames_per_sec": round(BATCH * STEPS / med, 1)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    best = max(results, key=lambda r: r["frames_per_sec"])
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
