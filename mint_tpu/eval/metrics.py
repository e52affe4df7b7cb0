"""Online evaluation metrics.

EulerAnglesError mirrors the reference metric (``mint/core/metrics.py:
20-63``): rotation-matrix channels -> Euler angles (R = Rz Ry Rx
convention, NaNs zeroed), accumulated mean L2 norm of the per-frame
angle difference.  The reference FACT path returns no online metrics
(``fact_model.py:138-141``) — this is provided for parity of capability.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from mint_tpu.motion.rotation import euler_from_rotmat


class EulerAnglesError:
    """Accumulating Euler-angle error over eval batches."""

    name = "EulerAnglesError"

    def __init__(self, num_joints: int):
        self.num_joints = num_joints
        self.reset_states()

    def reset_states(self) -> None:
        self._total = 0.0

    def update_state(self, inputs: Dict, pred) -> None:
        target = np.asarray(inputs["target"])
        pred = np.asarray(pred)
        t = target.shape[1]
        # Skip the leading 9 translation dims (reference metrics.py:45-48).
        ep = np.asarray(euler_from_rotmat(
            jnp.asarray(pred[:, :t, 9:]).reshape(-1, 3, 3)))
        et = np.asarray(euler_from_rotmat(
            jnp.asarray(target[:, :, 9:]).reshape(-1, 3, 3)))
        ep = np.nan_to_num(ep).reshape(-1, self.num_joints * 3)
        et = np.nan_to_num(et).reshape(-1, self.num_joints * 3)
        diff = np.linalg.norm(et - ep, axis=-1)
        self._total += float(diff.mean())

    def result(self) -> float:
        return self._total
