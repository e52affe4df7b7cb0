"""Measure --accumulate_steps on the real chip (round-4 verdict item #5).

docs/BENCHMARKS.md claimed `--accumulate_steps=k` amortizes the Adam
update k-fold "without changing the training math" — wrong on both
counts until measured: (a) optax.MultiSteps *accumulates gradients*
every micro-step (an extra grad-tree read+write ≈ 1.4 GB of traffic per
step) and only the *apply* is amortized, so the net can be a loss;
(b) averaging k micro-batches per update emulates batch 32k — fewer
updates per example and a different gradient-noise scale, which IS a
protocol deviation from the reference's one-Adam-update-per-batch-32
(single_task_trainer.py:186-187).

Protocol: flagship model, batch 32, bf16 compute, fused 40-step scan
(the CLI's --steps_per_loop=40 configuration), synthetic fixed batch,
median of 3 timed 120-step windows after a warmup dispatch.  Run ALONE
on the single-tenant chip:  python scripts/exp_accumulate.py [k ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 32
LOOP = 40
WINDOWS = 3
LOOPS_PER_WINDOW = 3  # 120 steps per timed window


def main():
    import jax
    import jax.numpy as jnp

    from mint_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    from mint_tpu.config.schema import load_pipeline_config
    from mint_tpu.models import builder
    from mint_tpu.models.fact import init_params
    from mint_tpu.train import Trainer, schedules

    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pipe = load_pipeline_config(
        os.path.join(repo, "configs", "fact_v5_deeper_t10_cm12.config"))

    rng = np.random.default_rng(0)
    host_batch = {
        "motion_input": rng.standard_normal((BATCH, 120, 225)).astype(
            np.float32),
        "audio_input": rng.standard_normal((BATCH, 240, 35)).astype(
            np.float32),
        "target": rng.standard_normal((BATCH, 20, 225)).astype(np.float32),
    }

    results = []
    for k in ks:
        model = builder.build(pipe.multi_modal_model, is_training=True,
                              compute_dtype=jnp.bfloat16)
        params = init_params(model, jax.random.PRNGKey(0))
        trainer = Trainer(
            model, schedules.from_config(pipe.train_config.learning_rate),
            grad_clip_norm=1.0, accumulate_steps=k)
        state = trainer.init_state(params)
        # Commit the stacked batch to the device ONCE: timing repeated
        # host->device transfers of ~200 MB through a 12 MB/s tunnel
        # would measure the link, not the optimizer (first attempt did
        # exactly that: 5.9 "steps/s" at k=1, all transfer).
        from mint_tpu.parallel import mesh as mesh_lib
        sharding = mesh_lib.stacked_batch_sharding(trainer.mesh)
        stacked = {name: jax.device_put(v, sharding)
                   for name, v in trainer.stack_batches(
                       [host_batch] * LOOP).items()}
        t0 = time.perf_counter()
        state, m = trainer.train_steps(state, stacked)
        np.asarray(m["loss"])  # force (block_until_ready lies on axon)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(WINDOWS):
            t0 = time.perf_counter()
            for _ in range(LOOPS_PER_WINDOW):
                state, m = trainer.train_steps(state, stacked)
            np.asarray(m["loss"])
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        steps = LOOP * LOOPS_PER_WINDOW
        rec = {"k": k, "compile_s": round(compile_s, 1),
               "times_s": [round(t, 2) for t in times],
               "steps_per_sec": round(steps / med, 2),
               "examples_per_sec": round(BATCH * steps / med, 1),
               "updates_per_sec": round(steps / med / k, 2),
               "loss": float(np.asarray(m["loss"]))}
        results.append(rec)
        print(json.dumps(rec), flush=True)
        del state, trainer, stacked

    base = next((r for r in results if r["k"] == 1), results[0])
    for r in results:
        r["vs_k1"] = round(r["steps_per_sec"] / base["steps_per_sec"], 3)
    print(json.dumps({"summary": [
        {kk: r[kk] for kk in ("k", "steps_per_sec", "vs_k1")}
        for r in results]}))


if __name__ == "__main__":
    main()
