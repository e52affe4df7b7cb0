"""Decode-step perf sweep on the real TPU (VERDICT r1 items 4/5).

Measures frames/sec for the bench protocol decode scan under:
  - scan unroll 1/2/4,
  - batch 40 (protocol) and 80 (MFU probe).

Run serialized (single-tenant chip): `python scripts/exp_decode_perf.py`.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from mint_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

from mint_tpu.config.schema import load_pipeline_config
from mint_tpu.models.fact import FACT, init_params
from mint_tpu.infer.decoder import infer_auto_regressive

STEPS = 300  # enough to amortize dispatch; 1200 only for the final check


def run(model, params, batch, unroll, steps=STEPS, repeats=3):
    rng = np.random.default_rng(0)
    inputs = {
        "motion_input": jnp.asarray(
            rng.standard_normal((batch, 120, 225)), jnp.float32),
        "audio_input": jnp.asarray(
            rng.standard_normal((batch, steps + 240, 35)), jnp.float32),
    }
    t_compile = time.perf_counter()
    out = infer_auto_regressive(model, params, inputs, steps=steps,
                                unroll=unroll)
    np.asarray(out)
    t_compile = time.perf_counter() - t_compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = infer_auto_regressive(model, params, inputs, steps=steps,
                                    unroll=unroll)
        np.asarray(out)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    fps = batch * steps / dt
    ms_per_step = dt / steps * 1e3
    print(f"batch={batch} unroll={unroll}: {fps:8.1f} f/s  "
          f"{ms_per_step:6.2f} ms/step  (compile {t_compile:.0f}s, "
          f"times {[round(t, 2) for t in times]})", flush=True)
    return fps


def main():
    pipe = load_pipeline_config("/root/repo/configs/fact_v5_deeper_t10_cm12.config")
    model = FACT(pipe.multi_modal_model.fact_model, compute_dtype=jnp.bfloat16)
    params = init_params(model, jax.random.PRNGKey(0))

    for batch in (40, 80):
        for unroll in (1, 2, 4):
            run(model, params, batch, unroll)


if __name__ == "__main__":
    main()
