"""Abstract multi-modal model interface.

Capability parity with the reference ABC (``mint/core/multi_modal_model.py:
20-65``): a model family in this framework provides a forward pass, a loss,
autoregressive prediction, and metric construction.  In JAX these are
functions over (model, params) rather than stateful methods — the protocol
below documents the contract, and :class:`FACTFamily` binds it for FACT.
"""

from __future__ import annotations

import abc
from typing import Any, Dict, List

import jax


class MultiModalModelFamily(abc.ABC):
    """The contract every model family must implement
    (reference multi_modal_model.py:20-65)."""

    @abc.abstractmethod
    def call(self, params, inputs: Dict[str, jax.Array]) -> jax.Array:
        """Training/eval forward pass."""

    @abc.abstractmethod
    def loss(self, target: jax.Array, pred: jax.Array) -> jax.Array:
        """Training loss."""

    @abc.abstractmethod
    def predict(self, params, inputs: Dict[str, jax.Array],
                steps: int) -> jax.Array:
        """Autoregressive generation."""

    @abc.abstractmethod
    def get_metrics(self, eval_config) -> List[Any]:
        """Online eval metrics (may be empty: offline scoring)."""


class FACTFamily(MultiModalModelFamily):
    """FACT bound to the family contract."""

    def __init__(self, model):
        self.model = model

    def call(self, params, inputs):
        return self.model.apply(params, inputs)

    def loss(self, target, pred):
        from mint_tpu.models.fact import l2_loss
        return l2_loss(target, pred)

    def predict(self, params, inputs, steps: int = 1200):
        from mint_tpu.infer.decoder import infer_auto_regressive
        return infer_auto_regressive(self.model, params, inputs,
                                     steps=steps)

    def get_metrics(self, eval_config) -> List[Any]:
        # Reference FACT returns [] — metrics are computed offline
        # (fact_model.py:138-141); EulerAnglesError is available for
        # configs that request motion_generation_metrics.
        del eval_config
        return []
