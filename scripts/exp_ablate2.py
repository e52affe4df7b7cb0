"""Round-3 follow-up sweep: shippable exact-ish decode variants.

Based on exp_ablate_step.py findings (see docs/BENCHMARKS.md): total
exposed LN cost 1.10 ms/step, softmax 1.25 ms/step, max-subtract free.
These variants are candidates that keep the f32 path bit-exact (changes
gated on bf16 compute) or are pure scheduler knobs:

- base2           same-day control
- ln_flaxnoaffine flax LayerNorm with use_scale/use_bias=False (keeps
                  flax's fast-variance path; measures the affine's true
                  cost — exp_ablate_step's hand-rolled LN was slower for
                  unrelated reasons)
- vmem96          base model, --xla_tpu_scoped_vmem_limit_kib=98304
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

STEPS = int(os.environ.get("ABLATE_STEPS", "600"))
BATCH = 40
VARIANTS = ["base2", "ln_flaxnoaffine", "vmem96"]


def _patch(variant):
    from flax import linen as nn

    if variant == "ln_flaxnoaffine":
        orig = nn.LayerNorm

        # A subclass with use_scale/use_bias=False defaults is NOT enough:
        # layers.Block passes use_scale=/use_bias= explicitly (the
        # ln_affine_folded knob), and explicit kwargs beat class defaults.
        # Force the values by rewriting the kwargs at construction.
        def _LN(*args, **kw):
            kw["use_scale"] = False
            kw["use_bias"] = False
            return orig(*args, **kw)

        nn.LayerNorm = _LN


def child(variant):
    import jax
    from mint_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    import numpy as np

    _patch(variant)

    from mint_tpu.config.schema import load_pipeline_config
    from mint_tpu.models.fact import FACT, init_params
    from mint_tpu.infer.decoder import infer_auto_regressive

    pipe = load_pipeline_config(
        "/root/repo/configs/fact_v5_deeper_t10_cm12.config")
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
    t0 = time.perf_counter()
    np.asarray(infer_auto_regressive(model, params, inputs, steps=STEPS))
    tc = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = np.asarray(infer_auto_regressive(model, params, inputs,
                                               steps=STEPS))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    print(f"{variant:16s} {BATCH*STEPS/dt:8.1f} f/s  "
          f"{dt/STEPS*1e3:6.2f} ms/step  (compile {tc:.0f}s, "
          f"runs {[round(t, 2) for t in times]}, "
          f"finite={np.isfinite(out).all()})", flush=True)


def main():
    for variant in VARIANTS:
        env = dict(os.environ)
        if variant == "vmem96":
            env["LIBTPU_INIT_ARGS"] = (
                env.get("LIBTPU_INIT_ARGS", "")
                + " --xla_tpu_scoped_vmem_limit_kib=98304").strip()
        for attempt in range(2):
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), variant],
                cwd="/root/repo", env=env).returncode
            if rc == 0:
                break
            print(f"# {variant} child failed rc={rc}; retry in 120s",
                  flush=True)
            time.sleep(120)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        child(sys.argv[1])
    else:
        main()
