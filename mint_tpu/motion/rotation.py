"""Rotation conversions, vectorized JAX (jit/vmap/TPU friendly).

Covers the reference's ``tools/conversion_util.py`` surface (aa2rotmat,
rotmat2aa, rotmat2euler, get_closest_rotmat — conversion_util.py:20-135)
and the motion-recovery helper of the scorer
(``tools/calculate_scores.py:42-51``), with numerics matching
scipy.spatial.transform.Rotation (verified by parity tests).

All functions accept NumPy or JAX arrays and any batch shape.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-8


def aa2rotmat(angles: jax.Array) -> jax.Array:
    """Axis-angle [..., 3] -> rotation matrices [..., 9] (Rodrigues).

    Matches ``Rotation.from_rotvec(...).as_matrix()``
    (conversion_util.py:78-97).
    """
    angles = jnp.asarray(angles)
    assert angles.shape[-1] == 3, angles.shape
    batch = angles.shape[:-1]
    theta = jnp.linalg.norm(angles, axis=-1, keepdims=True)
    # Safe normalize; for theta ~ 0 use first-order Rodrigues.
    axis = angles / jnp.maximum(theta, _EPS)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(x)
    K = jnp.stack([zeros, -z, y,
                   z, zeros, -x,
                   -y, x, zeros], axis=-1).reshape(batch + (3, 3))
    t = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3), batch + (3, 3))
    sin_t, cos_t = jnp.sin(t), jnp.cos(t)
    R = eye + sin_t * K + (1.0 - cos_t) * (K @ K)
    # Near zero angle: R ~= I + skew(angles) (exact to O(theta^2)).
    skew = K * t  # = skew(angles)
    R_small = eye + skew
    R = jnp.where(t < 1e-6, R_small, R)
    return R.reshape(batch + (9,))


def _as_matrices(rotmats: jax.Array) -> Tuple[jax.Array, tuple, tuple]:
    rotmats = jnp.asarray(rotmats)
    shape = rotmats.shape
    if shape[-2:] == (3, 3):
        batch = shape[:-2]
    else:
        assert shape[-1] == 9, shape
        batch = shape[:-1]
    return rotmats.reshape(batch + (3, 3)), batch, shape


def rotmat2quat(rotmats: jax.Array) -> jax.Array:
    """Rotation matrices [..., 3, 3] or [..., 9] -> quaternions [..., 4]
    (x, y, z, w), positive-trace-branch selection (Shepperd's method)."""
    m, batch, _ = _as_matrices(rotmats)
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate branches; pick by the largest diagonal/trace term.
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    qw = jnp.sqrt(jnp.maximum(qw, 0.0))
    case = jnp.argmax(qw, axis=-1)

    def quat_w():  # trace branch
        s = 2.0 * qw[..., 0]
        return jnp.stack([(m21 - m12) / s, (m02 - m20) / s,
                          (m10 - m01) / s, 0.25 * s], axis=-1)

    def quat_x():
        s = 2.0 * qw[..., 1]
        return jnp.stack([0.25 * s, (m01 + m10) / s,
                          (m02 + m20) / s, (m21 - m12) / s], axis=-1)

    def quat_y():
        s = 2.0 * qw[..., 2]
        return jnp.stack([(m01 + m10) / s, 0.25 * s,
                          (m12 + m21) / s, (m02 - m20) / s], axis=-1)

    def quat_z():
        s = 2.0 * qw[..., 3]
        return jnp.stack([(m02 + m20) / s, (m12 + m21) / s,
                          0.25 * s, (m10 - m01) / s], axis=-1)

    quats = jnp.stack([quat_w(), quat_x(), quat_y(), quat_z()], axis=-2)
    q = jnp.take_along_axis(quats, case[..., None, None].repeat(4, -1),
                            axis=-2)[..., 0, :]
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(norm, _EPS)


def rotmat2aa(rotmats: jax.Array) -> jax.Array:
    """Rotation matrices [..., 3, 3] or [..., 9] -> axis-angle [..., 3].

    Matches ``Rotation.from_matrix(...).as_rotvec()``
    (conversion_util.py:50-75), including angle range [0, pi].
    """
    _, batch, shape = _as_matrices(rotmats)
    q = rotmat2quat(rotmats)
    # scipy canonicalizes w >= 0 for as_rotvec.
    q = jnp.where(q[..., 3:4] < 0, -q, q)
    xyz = q[..., :3]
    w = jnp.clip(q[..., 3], -1.0, 1.0)
    norm_xyz = jnp.linalg.norm(xyz, axis=-1)
    angle = 2.0 * jnp.arctan2(norm_xyz, w)
    # scale = angle / sin(angle/2); use Taylor for small angles.
    half = angle / 2.0
    sin_half = jnp.sin(half)
    scale = jnp.where(angle < 1e-6,
                      2.0 + angle ** 2 / 12.0,
                      angle / jnp.maximum(sin_half, _EPS))
    out = xyz * scale[..., None]
    return out.reshape(batch + (3,))


def euler_from_rotmat(rotmats: jax.Array) -> jax.Array:
    """R = Rz(z) @ Ry(y) @ Rx(x) -> [..., 3] angles (x, y, z).

    The convention of ``tfg.euler.from_rotation_matrix`` used by the
    reference metric (mint/core/metrics.py:45-48).  Gimbal-locked inputs
    (|r20| ~ 1) resolve with z = 0.
    """
    m, batch, _ = _as_matrices(rotmats)
    r00, r10, r20 = m[..., 0, 0], m[..., 1, 0], m[..., 2, 0]
    r21, r22 = m[..., 2, 1], m[..., 2, 2]
    r01, r02 = m[..., 0, 1], m[..., 0, 2]
    sy = jnp.sqrt(r00 * r00 + r10 * r10)
    gimbal = sy < 1e-6
    # Gimbal branch (tfg): x = atan2(-sign(r20)*r01, -sign(r20)*r02) —
    # the sign applies to BOTH arguments.  For y = +pi/2 (r20 = -1)
    # r01 = sin(x-z), r02 = cos(x-z): atan2(r01, r02) = x-z; applying
    # the sign to only one argument negated x for this lock.
    sign = jnp.sign(r20)
    x = jnp.where(gimbal, jnp.arctan2(-sign * r01, -sign * r02),
                  jnp.arctan2(r21, r22))
    y = jnp.arctan2(-r20, sy)
    z = jnp.where(gimbal, jnp.zeros_like(x), jnp.arctan2(r10, r00))
    return jnp.stack([x, y, z], axis=-1).reshape(batch + (3,))


def rotmat2euler(rotmats: jax.Array, seq: str = "XYZ") -> jax.Array:
    """Rotation matrices -> Euler angles for intrinsic Tait-Bryan `seq`.

    Matches ``Rotation.from_matrix(...).as_euler(seq)``
    (conversion_util.py:20-48).  Supported: intrinsic 'XYZ' and 'ZYX'
    (the sequences the reference tools use).
    """
    m, batch, _ = _as_matrices(rotmats)
    if seq == "XYZ":
        # R = Rx(a) @ Ry(b) @ Rz(c) (intrinsic x-y-z).
        b = jnp.arcsin(jnp.clip(m[..., 0, 2], -1.0, 1.0))
        a = jnp.arctan2(-m[..., 1, 2], m[..., 2, 2])
        c = jnp.arctan2(-m[..., 0, 1], m[..., 0, 0])
        gimbal = jnp.abs(m[..., 0, 2]) > 1.0 - 1e-7
        a_lock = jnp.arctan2(m[..., 2, 1], m[..., 1, 1])
        a = jnp.where(gimbal, a_lock, a)
        c = jnp.where(gimbal, jnp.zeros_like(c), c)
        out = jnp.stack([a, b, c], axis=-1)
    elif seq == "ZYX":
        b = jnp.arcsin(jnp.clip(-m[..., 2, 0], -1.0, 1.0))
        a = jnp.arctan2(m[..., 1, 0], m[..., 0, 0])
        c = jnp.arctan2(m[..., 2, 1], m[..., 2, 2])
        gimbal = jnp.abs(m[..., 2, 0]) > 1.0 - 1e-7
        a_lock = jnp.arctan2(-m[..., 0, 1], m[..., 1, 1])
        a = jnp.where(gimbal, a_lock, a)
        c = jnp.where(gimbal, jnp.zeros_like(c), c)
        out = jnp.stack([a, b, c], axis=-1)
    else:
        raise NotImplementedError(f"euler seq {seq!r}")
    return out.reshape(batch + (3,))


def get_closest_rotmat(rotmats: jax.Array) -> jax.Array:
    """Orthogonal projection to SO(3): R = U diag(1,1,sign(det(UV'))) V'.

    Matches ``conversion_util.get_closest_rotmat``
    (conversion_util.py:100-135); same for the scorer's copy
    (calculate_scores.py:21-39).
    """
    m, batch, shape = _as_matrices(rotmats)
    u, _, vh = jnp.linalg.svd(m)
    det = jnp.linalg.det(u @ vh)
    fix = jnp.concatenate(
        [jnp.ones(batch + (2,)), jnp.sign(det)[..., None]], axis=-1)
    r = (u * fix[..., None, :]) @ vh
    return r.reshape(shape)


def recover_to_axis_angles(motion: jax.Array
                           ) -> Tuple[jax.Array, jax.Array]:
    """[B, T, 225] FACT motion -> (axis_angles [B, T, 24, 3],
    transl [B, T, 3]) — the scorer's recovery
    (calculate_scores.py:42-51): transl at dims 6:9, 24 rotmats at 9:,
    SVD-projected to valid rotations."""
    motion = jnp.asarray(motion)
    b, t, dim = motion.shape
    assert dim == 225, dim
    transl = motion[:, :, 6:9]
    rotmats = get_closest_rotmat(
        motion[:, :, 9:].reshape(b, t, 24, 3, 3))
    axis_angles = rotmat2aa(rotmats).reshape(b, t, 24, 3)
    return axis_angles, transl
