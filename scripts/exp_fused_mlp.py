"""Compare XLA vs Pallas fused MLP inside a scan at decode shapes.

Mimics the decode loop's 12 cross-modal MLPs: per scan step, run 12
sequential MLPs (distinct weights) over x [40, 360, 800] bf16.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from mint_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

from mint_tpu.ops.mlp import fused_mlp, _reference_mlp

B, T, H, F = 40, 360, 800, 3072
LAYERS = 12
STEPS = 100

rng = np.random.default_rng(0)
params = [
    (jnp.asarray(rng.standard_normal((H, F)) * 0.02, jnp.float32),
     jnp.zeros((F,), jnp.float32),
     jnp.asarray(rng.standard_normal((F, H)) * 0.02, jnp.float32),
     jnp.zeros((H,), jnp.float32))
    for _ in range(LAYERS)
]
x0 = jnp.asarray(rng.standard_normal((B, T, H)), jnp.bfloat16)


def make_step(mlp_fn):
    def step(x, _):
        for w1, b1, w2, b2 in params:
            y = mlp_fn(x, w1.astype(jnp.bfloat16), b1.astype(jnp.bfloat16),
                       w2.astype(jnp.bfloat16), b2.astype(jnp.bfloat16))
            x = (x + y * 1e-3).astype(jnp.bfloat16)  # keep values bounded
        return x, ()

    @jax.jit
    def run(x):
        out, _ = jax.lax.scan(step, x, jnp.arange(STEPS))
        return out

    return run


def bench(name, fn):
    t0 = time.perf_counter()
    out = fn(x0)
    np.asarray(out)
    compile_t = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(x0))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / STEPS * 1e3
    flops = 2 * B * T * H * F * 2 * LAYERS
    print(f"{name}: {dt:7.3f} ms/step  {flops / (dt / 1e3) / 1e12:6.1f} "
          f"TFLOP/s  (compile {compile_t:.0f}s)", flush=True)
    return out


ref = bench("xla   ", make_step(_reference_mlp))
pal = bench("pallas", make_step(fused_mlp))
err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - pal.astype(jnp.float32))))
print("max abs diff after 100 steps x 12 layers:", err)
