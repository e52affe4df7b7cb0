"""Ablate the non-MXU components of the TRAIN step on the real TPU.

docs/BENCHMARKS.md's "Train-step ceiling" decomposed the ~38% non-MXU
train residual by ARITHMETIC (optimizer bandwidth "~4.1 ms", backward
elementwise "scaling to ~4-5 ms") while the decode step got measured
per-component ablations (exp_ablate_step.py / exp_ablate2.py).  This
harness gives the train step the same treatment: each variant removes
ONE component from the shipping step (batch 32, bf16 compute, fused
40-step scan — the CLI's --steps_per_loop=40 configuration, reference
hot loop mint/ctl/single_task_trainer.py:141-199) and measures steps/s
against a same-protocol base.

Variants (costs read as base -> variant deltas):
  base          Adam(eps 1e-7) + clip 1.0 + metrics     (shipping)
  no_metrics    metrics dict {}: scan/metrics machinery
  no_clip       drop clip_by_global_norm: the extra grad-tree
                norm+scale passes
  opt_sgd       clip + SGD: Adam's m/v moment traffic ablated
  opt_none      no optimizer at all (params carried unchanged;
                grads kept alive via a global-norm carry): TOTAL
                optimizer cost incl. the param write
  fwd_only      loss only, no grad: TOTAL backward cost
  ln_identity   LayerNorm -> identity in fwd AND bwd
  sm_none       softmax -> uniform scale in fwd AND bwd

Each variant runs in a FRESH subprocess: jax's jit cache keys on module
equality (two FACT instances with equal configs hash equal), so
in-process variants would silently reuse the previous variant's
compiled program — and the ln_/sm_ variants monkeypatch modules.

Run ALONE on the single-tenant chip:
  python scripts/exp_ablate_train.py              # all variants
  python scripts/exp_ablate_train.py <variant>    # child mode
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 32
LOOP = 40
WINDOWS = 3
LOOPS_PER_WINDOW = 3  # 120 steps per timed window

VARIANTS = ["base", "no_metrics", "no_clip", "opt_sgd", "opt_none",
            "fwd_only", "ln_identity", "sm_none"]


def child(variant):
    import jax

    from mint_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    import optax

    if variant in ("ln_identity", "sm_none"):
        # Reuse the decode harness's module patches (identical ablation
        # semantics; autodiff differentiates the patched forward, so the
        # ablation removes the component's backward cost too).
        patch_name = "ln_identity" if variant == "ln_identity" else "sm_none"
        from exp_ablate_step import _patch
        _patch(patch_name)

    from mint_tpu.config.schema import load_pipeline_config
    from mint_tpu.models import builder
    from mint_tpu.models.fact import init_params, l2_loss
    from mint_tpu.parallel import mesh as mesh_lib
    from mint_tpu.train import Trainer, schedules
    from mint_tpu.train.trainer import TrainState

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pipe = load_pipeline_config(
        os.path.join(repo, "configs", "fact_v5_deeper_t10_cm12.config"))
    model = builder.build(pipe.multi_modal_model, is_training=True,
                          compute_dtype=jnp.bfloat16)
    params = init_params(model, jax.random.PRNGKey(0))
    schedule = schedules.from_config(pipe.train_config.learning_rate)

    clip = 0.0 if variant == "no_clip" else 1.0
    trainer = Trainer(model, schedule, grad_clip_norm=clip)

    if variant == "opt_sgd":
        # Same clip, same schedule scaling — only scale_by_adam (and its
        # two moment trees: 2x 481 MB f32 read+write per step) removed.
        trainer.optimizer = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.scale_by_learning_rate(schedule))
    elif variant == "opt_none":
        # No update math, no param write.  The opt_state carries
        # global_norm(grads) so the backward pass stays live (updates
        # are zeros, which XLA folds out of the param carry — grads
        # would otherwise be dead code and the measurement would
        # silently become fwd_only).  Costs one grad-tree read.
        trainer.optimizer = optax.GradientTransformation(
            init=lambda p: jnp.zeros((), jnp.float32),
            update=lambda g, s, p=None: (
                jax.tree_util.tree_map(jnp.zeros_like, g),
                optax.global_norm(g)))
    elif variant == "fwd_only":
        def _fwd_step_fn(self):
            def step_fn(state, batch):
                batch = dict(batch)
                target = batch.pop("target")
                out = model.apply(state.params, batch)
                loss = jnp.mean(l2_loss(target, out))
                new_state = TrainState(step=state.step + 1,
                                       params=state.params,
                                       opt_state=state.opt_state)
                return new_state, {"loss": loss}

            return step_fn

        Trainer._make_step_fn = _fwd_step_fn
    elif variant == "no_metrics":
        orig = Trainer._make_step_fn

        def _quiet_step_fn(self):
            inner = orig(self)

            def step_fn(state, batch):
                new_state, _ = inner(state, batch)
                return new_state, {}

            return step_fn

        Trainer._make_step_fn = _quiet_step_fn

    state = trainer.init_state(params)
    rng = np.random.default_rng(0)
    host_batch = {
        "motion_input": rng.standard_normal((BATCH, 120, 225)).astype(
            np.float32),
        "audio_input": rng.standard_normal((BATCH, 240, 35)).astype(
            np.float32),
        "target": rng.standard_normal((BATCH, 20, 225)).astype(np.float32),
    }
    # Commit the stacked batch to the device ONCE (exp_accumulate.py's
    # lesson: re-feeding ~200 MB through a 12 MB/s tunnel measures the
    # link, not the step).
    sharding = mesh_lib.stacked_batch_sharding(trainer.mesh)
    stacked = {name: jax.device_put(v, sharding)
               for name, v in trainer.stack_batches(
                   [host_batch] * LOOP).items()}

    def force(state, m):
        if "loss" in m:
            return float(np.asarray(m["loss"]))
        np.asarray(state.step)  # block_until_ready lies on axon
        return float("nan")

    t0 = time.perf_counter()
    state, m = trainer.train_steps(state, stacked)
    loss = force(state, m)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(LOOPS_PER_WINDOW):
            state, m = trainer.train_steps(state, stacked)
        loss = force(state, m)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    steps = LOOP * LOOPS_PER_WINDOW
    rec = {"variant": variant,
           "steps_per_sec": round(steps / med, 2),
           "ms_per_step": round(med / steps * 1e3, 2),
           "compile_s": round(compile_s, 1),
           "times_s": [round(t, 2) for t in times],
           "loss": loss}
    print(json.dumps(rec), flush=True)


def main():
    attempts = 2
    for variant in VARIANTS:
        for attempt in range(attempts):
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), variant],
                cwd=os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))).returncode
            if rc == 0:
                break
            if attempt + 1 < attempts:  # no dead sleep after the last try
                print(f"# {variant} child failed rc={rc}; retry in 120s",
                      flush=True)
                time.sleep(120)
            else:
                print(f"# {variant} child failed rc={rc}; giving up",
                      flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        child(sys.argv[1])
    else:
        main()
