"""Fold pre-LN scale/bias into the adjacent QKV / fc1 kernels.

Every LayerNorm in the FACT stack (``layers.Block``: ``norm_attn`` and
``norm_mlp``; there is no final LN — see fact_model.py:49-101 /
base_models.py:91-110 for the reference topology this mirrors) feeds
exactly one Dense matmul, so its affine is absorbable into that matmul's
weights at load time:

    (g * xn + beta) @ W  ==  xn @ (g[:, None] * W)  +  beta @ W

with ``xn`` the zero-mean/unit-variance normalized activations.  The
folded model (``ln_affine_folded=True``) runs LayerNorm without
scale/bias and gives ``to_qkv`` a bias to carry the ``beta @ W`` term
(``fc1`` already has one).  This is an exact weight transform in f32 —
the only numerical difference is rounding when the folded products are
cast to the compute dtype.  NOTE it is opt-in, not the default: although
an ablation priced the LN affine at 0.37 ms/step, the actual folded
program measured ~5% SLOWER end-to-end on TPU v5e (the new QKV bias and
the changed schedule outweigh the removed affine — docs/BENCHMARKS.md,
round-3 ablations).  It is kept as a tested library feature for hardware
where the trade flips.

Checkpoints are NEVER stored folded: the transform is applied after
restore, so the converter/"don't change parameter layouts" contract
(CLAUDE.md) is untouched.  Training always uses the unfolded model —
folding is a pure-inference optimization.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any, Dict, Tuple

import jax.numpy as jnp


def _fold_block(block: Dict[str, Any]) -> Dict[str, Any]:
    """Fold one ``layers.Block`` param subtree (must contain norm_attn/
    norm_mlp with scale+bias, attn.to_qkv without bias, mlp.fc1 with)."""
    out = dict(block)

    g = jnp.asarray(block["norm_attn"]["scale"], jnp.float32)
    beta = jnp.asarray(block["norm_attn"]["bias"], jnp.float32)
    qkv = dict(block["attn"]["to_qkv"])
    if "bias" in qkv:
        raise ValueError("to_qkv already has a bias — params look folded")
    w = jnp.asarray(qkv["kernel"], jnp.float32)
    qkv["kernel"] = (g[:, None] * w).astype(block["attn"]["to_qkv"]["kernel"].dtype)
    qkv["bias"] = (beta @ w).astype(block["attn"]["to_qkv"]["kernel"].dtype)
    attn = dict(block["attn"])
    attn["to_qkv"] = qkv
    out["attn"] = attn
    del out["norm_attn"]

    g = jnp.asarray(block["norm_mlp"]["scale"], jnp.float32)
    beta = jnp.asarray(block["norm_mlp"]["bias"], jnp.float32)
    fc1 = dict(block["mlp"]["fc1"])
    w = jnp.asarray(fc1["kernel"], jnp.float32)
    b = jnp.asarray(fc1["bias"], jnp.float32)
    fc1["kernel"] = (g[:, None] * w).astype(block["mlp"]["fc1"]["kernel"].dtype)
    fc1["bias"] = (b + beta @ w).astype(block["mlp"]["fc1"]["bias"].dtype)
    mlp = dict(block["mlp"])
    mlp["fc1"] = fc1
    out["mlp"] = mlp
    del out["norm_mlp"]
    return out


def _is_block(node: Any) -> bool:
    return (isinstance(node, Mapping) and "norm_attn" in node
            and "attn" in node and "norm_mlp" in node and "mlp" in node)


def fold_ln_affines(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Return a new variables/params tree with every Block's LN affine
    folded into its QKV/fc1 kernels.

    Accepts either a flax ``{"params": {...}}`` variables dict or a bare
    params tree; returns the same shape of container.  The result is the
    exact init structure of the corresponding ``ln_affine_folded=True``
    model (asserted by tests/test_fold.py).
    """

    def walk(node):
        if _is_block(node):
            return _fold_block(node)
        if isinstance(node, Mapping):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(variables)


def fold_for_decode(model, params) -> Tuple[Any, Dict[str, Any]]:
    """Convenience: clone ``model`` with ``ln_affine_folded=True`` and
    fold ``params`` to match.  No-op (returns inputs) if already folded."""
    if getattr(model, "ln_affine_folded", False):
        return model, params
    return model.clone(ln_affine_folded=True), fold_ln_affines(params)
