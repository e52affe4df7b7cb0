"""Ablate non-MXU components of the decode step on the real TPU.

Round-2 analysis put the decode at ~75% of bf16 peak and attributed the
residual to softmax/LN bandwidth at 360-token windows — asserted, never
measured.  This harness measures it: each variant monkeypatches ONE
component (LayerNorm flavor / softmax flavor) and times the full decode
scan at protocol shapes (batch 40, unroll 8, t48 truncation).

Each variant runs in a FRESH subprocess: jax's jit cache keys on module
equality (two FACT instances with equal configs hash equal), so in-process
variants would silently reuse the previous variant's compiled program.

Usage:  python scripts/exp_ablate_step.py            # run all variants
        python scripts/exp_ablate_step.py <variant>  # child mode
"""
import functools
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

STEPS = int(os.environ.get("ABLATE_STEPS", "600"))
BATCH = 40

VARIANTS = [
    "base",          # shipping configuration (flax f32-stats LN, f32 softmax)
    "ln_identity",   # LayerNorm -> identity: total LN cost
    "ln_noaffine",   # normalize only: cost of the gamma/beta affine (fold win)
    "ln_bf16",       # stats + affine in bf16
    "sm_none",       # attention without softmax: total softmax cost
    "sm_nomax",      # softmax without the max-subtract pass
    "sm_divafter",   # normalize AFTER the PV matmul ([N,D] divide, not [N,N])
    "sm_bf16",       # softmax wholly in bf16
]


def _patch(variant):
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from mint_tpu.ops import attention as attn_mod

    if variant.startswith("ln_"):
        class _LN(nn.Module):
            epsilon: float = 1e-5
            dtype: object = None
            use_scale: bool = True
            use_bias: bool = True

            @nn.compact
            def __call__(self, x):
                if variant == "ln_identity":
                    return x
                stats_t = jnp.bfloat16 if variant == "ln_bf16" \
                    else jnp.float32
                xf = x.astype(stats_t)
                mu = xf.mean(-1, keepdims=True)
                var = ((xf - mu) ** 2).mean(-1, keepdims=True)
                y = (xf - mu) * jax.lax.rsqrt(var + self.epsilon)
                if variant == "ln_noaffine":
                    return y.astype(x.dtype)
                scale = self.param("scale", nn.initializers.ones,
                                   (x.shape[-1],), jnp.float32)
                bias = self.param("bias", nn.initializers.zeros,
                                  (x.shape[-1],), jnp.float32)
                return (y * scale.astype(stats_t)
                        + bias.astype(stats_t)).astype(x.dtype)

        nn.LayerNorm = _LN

    if variant.startswith("sm_"):
        def xla_attention(q, k, v, scale):
            dots = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
            if variant == "sm_none":
                attn = dots * (1.0 / dots.shape[-1])
            elif variant == "sm_nomax":
                e = jnp.exp(dots.astype(jnp.float32))
                attn = (e / jnp.sum(e, -1, keepdims=True)).astype(q.dtype)
            elif variant == "sm_divafter":
                s = dots.astype(jnp.float32)
                e = jnp.exp(s - jnp.max(s, -1, keepdims=True))
                inv = 1.0 / jnp.sum(e, -1, keepdims=True)
                out = jnp.einsum("bhij,bhjd->bhid", e.astype(q.dtype), v)
                return out * inv.astype(q.dtype)
            elif variant == "sm_bf16":
                attn = jax.nn.softmax(dots, axis=-1)
            else:
                raise ValueError(variant)
            return jnp.einsum("bhij,bhjd->bhid", attn, v)

        attn_mod.xla_attention = xla_attention


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
    print(f"{variant:12s} {BATCH*STEPS/dt:8.1f} f/s  "
          f"{dt/STEPS*1e3:6.2f} ms/step  (compile {tc:.0f}s, "
          f"runs {[round(t, 2) for t in times]}, "
          f"finite={np.isfinite(out).all()})", flush=True)


def main():
    for variant in VARIANTS:
        for attempt in range(2):
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), variant],
                cwd="/root/repo").returncode
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
