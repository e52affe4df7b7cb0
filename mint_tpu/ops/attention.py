"""Multi-head self-attention kernels.

Two interchangeable implementations of the reference attention semantics
(reference ``mint/core/base_models.py:60-88``):

- :func:`xla_attention` — einsum formulation; XLA fuses this well for the
  FACT shapes (<=360 tokens, 10 heads x 80 dims).
- :func:`pallas_attention` — a fused Pallas TPU kernel (QK^T, softmax, PV in
  VMEM, one grid step per (batch, head)), used for the hot decode/train path
  when shapes are static and large enough to win.

Reference parity notes:
- The reference scales scores by ``hidden_size ** -0.5`` (the FULL model dim,
  not per-head dim) — see ``base_models.py:64``.  Both kernels take `scale`
  explicitly so callers preserve that behavior.
- No masking, no attention dropout on the FACT path (the reference helpers in
  ``base_model_util.py`` are dead code for FACT).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def xla_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                  scale: float) -> jax.Array:
    """Attention via einsums; q/k/v: [B, H, N, D] -> [B, H, N, D]."""
    dots = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
    # Softmax in f32 for stability regardless of compute dtype.
    attn = jax.nn.softmax(dots.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhij,bhjd->bhid", attn, v)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n: int):
    """One (batch, head-block) tile: q,k,v [hb, N_pad, D_pad] in VMEM.

    Scores stay in registers/VMEM — the N^2 matrix never touches HBM,
    which is what the XLA formulation pays ~1 ms/layer for at FACT's
    decode shapes (3-4 HBM passes over a 100-200 MB score tensor).
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    dots = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    # Mask out padded key columns before softmax.
    n_pad = dots.shape[-1]
    if n_pad != n:
        col = jax.lax.broadcasted_iota(jnp.int32, dots.shape, 2)
        dots = jnp.where(col < n, dots, -1e30)
    dots = dots - jnp.max(dots, axis=-1, keepdims=True)
    exp = jnp.exp(dots)
    attn = exp / jnp.sum(exp, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        attn.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pallas_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     scale: float, head_block: int = 0) -> jax.Array:
    """Fused attention Pallas kernel; q/k/v: [B, H, N, D] -> [B, H, N, D].

    Grid = (B, H / head_block); each step computes `head_block` heads'
    full (N, N) attention in VMEM.  For FACT decode (B=40, H=10, N=360->
    384, D=80->128), head_block=5 uses ~9 MB VMEM per step and keeps the
    MXU fed with [hb*N, N] x [N, D] batched matmuls.
    """
    b, h, n, d = q.shape
    if head_block <= 0:
        head_block = h if h <= 8 else _largest_divisor_at_most(h, 5)
    assert h % head_block == 0, (h, head_block)
    sub = 16 if q.dtype == jnp.bfloat16 else 8
    n_pad = _round_up(n, sub)
    d_pad = _round_up(d, 128)
    pad = [(0, 0), (0, 0), (0, n_pad - n), (0, d_pad - d)]
    blocks = (b * h) // head_block
    qp = jnp.pad(q, pad).reshape(blocks, head_block, n_pad, d_pad)
    kp = jnp.pad(k, pad).reshape(blocks, head_block, n_pad, d_pad)
    vp = jnp.pad(v, pad).reshape(blocks, head_block, n_pad, d_pad)

    spec = pl.BlockSpec((1, head_block, n_pad, d_pad),
                        lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    # Only TPUs have the Mosaic backend; everywhere else (CPU mesh in
    # tests, GPU hosts) fall back to interpret mode (same numerics).
    # Caveat: on a TPU host with computation FORCED onto CPU via
    # jax.default_device, this still lowers for Mosaic — use the XLA
    # path (use_pallas=False) in that configuration.
    interpret = all(d.platform != "tpu" for d in jax.devices())
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, n=n),
        grid=(blocks,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(
            (blocks, head_block, n_pad, d_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * head_block * n_pad * n_pad * d_pad,
            bytes_accessed=4 * head_block * n_pad * d_pad * 4
            + head_block * n_pad * n_pad * 4,
            transcendentals=head_block * n_pad * n_pad,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, n_pad, d_pad)[:, :, :n, :d]


def _largest_divisor_at_most(n: int, cap: int) -> int:
    for cand in range(min(cap, n), 0, -1):
        if n % cand == 0:
            return cand
    return 1


def _pallas_attention_fwd(q, k, v, scale, head_block):
    return pallas_attention(q, k, v, scale, head_block), (q, k, v)


def _pallas_attention_bwd(scale, head_block, residuals, grad_out):
    # Backward through the mathematically identical XLA formulation: the
    # fused kernel accelerates the forward; gradients reuse XLA's
    # (well-fused) attention VJP. Parity between the two forwards is
    # covered by tests, so the cotangents are exact.
    q, k, v = residuals
    _, vjp = jax.vjp(lambda a, b, c: xla_attention(a, b, c, scale),
                     q, k, v)
    return vjp(grad_out)


pallas_attention.defvjp(_pallas_attention_fwd, _pallas_attention_bwd)


def multi_head_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         scale: float, *, use_pallas: bool = False
                         ) -> jax.Array:
    """Dispatch between the XLA and Pallas attention kernels."""
    if use_pallas and q.ndim == 4:
        return pallas_attention(q, k, v, scale)
    return xla_attention(q, k, v, scale)
