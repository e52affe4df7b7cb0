"""Fused transformer MLP (fc1 + tanh-GELU + fc2) as a Pallas TPU kernel.

Motivation (docs/BENCHMARKS.md): inside the decode ``lax.scan``, XLA's
emitter runs the cross-modal fc2 matmuls at ~40% of MXU peak (a windowed
batch-emitter layout choice; the identical matmul isolated hits ~200
TFLOP/s).  A Pallas kernel picks its own tiling/layout regardless of the
surrounding while-loop, recovering that headroom — and fusing fc1 + GELU +
fc2 keeps the [M, intermediate] activation entirely in VMEM (never
materialized in HBM).

Kernel layout: grid over row-tiles of the flattened [M = B*T, H] input;
both weight matrices resident in VMEM across the grid (constant index
map), the f32 fc1 accumulator GELU'd and re-quantized to bf16 in VMEM,
then the fc2 matmul accumulates f32.

Backward uses the plain XLA composition via ``jax.custom_vjp`` (training
steps are not scan-bound, so the emitter issue doesn't apply there;
parity-tested in tests/test_mlp_kernel.py).

Reference op being fused: ``mint/core/base_models.py:45-57`` (MLP =
Dense(intermediate) -> gelu -> Dense(out)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


# Test hook: run the Pallas kernel in interpreter mode on CPU so the
# kernel's own arithmetic (tiling, padding, f32 accumulation points) is
# exercised by the CPU-mesh test suite, not just the XLA fallback.
_INTERPRET = False


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    h = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    h = _gelu_tanh(h + b1_ref[:])
    h = h.astype(x_ref.dtype)  # re-quantize: MXU inputs stay bf16
    out = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = (out + b2_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def _fused_mlp_fwd_2d(x, w1, b1, w2, b2, tile_m: int = 256,
                      interpret: bool = False):
    """[M, H] x (H->F->O) fused MLP.  Pads M up to a tile multiple."""
    m, _ = x.shape
    out_dim = w2.shape[1]
    b1 = b1.reshape(1, -1)
    b2 = b2.reshape(1, -1)
    m_pad = -m % tile_m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    mp = m + m_pad
    out = pl.pallas_call(
        _kernel,
        grid=(mp // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, x.shape[1]), lambda i: (i, 0)),
            pl.BlockSpec((w1.shape[0], w1.shape[1]), lambda i: (0, 0)),
            pl.BlockSpec((1, b1.shape[1]), lambda i: (0, 0)),
            pl.BlockSpec((w2.shape[0], w2.shape[1]), lambda i: (0, 0)),
            pl.BlockSpec((1, b2.shape[1]), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_m, out_dim), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((mp, out_dim), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * w1.shape[0] * w1.shape[1]
            + 2 * mp * w2.shape[0] * w2.shape[1],
            bytes_accessed=(x.size + w1.size + w2.size
                            + mp * out_dim) * x.dtype.itemsize,
            transcendentals=mp * w1.shape[1],
        ),
        interpret=interpret,
    )(x, w1, b1, w2, b2)
    return out[:m] if m_pad else out


def _reference_mlp(x, w1, b1, w2, b2):
    """The exact XLA composition the kernel fuses (used for the VJP and
    as the CPU/parity fallback)."""
    h = _gelu_tanh(x @ w1 + b1)
    return h @ w2 + b2


@jax.custom_vjp
def fused_mlp(x, w1, b1, w2, b2):
    """Fused MLP on [..., H] inputs; weights [H, F], [F], [F, O], [O].

    Inputs are used as-is (cast to the compute dtype by the caller, like
    ``nn.Dense(dtype=...)`` does).  Falls back to the XLA composition on
    non-TPU backends.
    """
    if jax.devices()[0].platform != "tpu" and not _INTERPRET:
        return _reference_mlp(x, w1, b1, w2, b2)
    lead = x.shape[:-1]
    out = _fused_mlp_fwd_2d(x.reshape(-1, x.shape[-1]), w1, b1, w2, b2,
                            interpret=_INTERPRET)
    return out.reshape(*lead, w2.shape[1])


def _fwd(x, w1, b1, w2, b2):
    return fused_mlp(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _bwd(res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(_reference_mlp, x, w1, b1, w2, b2)
    return vjp(g)


fused_mlp.defvjp(_fwd, _bwd)
