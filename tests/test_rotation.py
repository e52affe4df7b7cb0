"""Rotation conversion parity vs scipy.spatial.transform.Rotation."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from mint_tpu.motion import rotation as rot

RNG = np.random.default_rng(42)


def random_rotvecs(n, max_angle=np.pi * 0.999):
    axis = RNG.standard_normal((n, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angles = RNG.uniform(0, max_angle, (n, 1))
    return axis * angles


class TestAxisAngle:
    def test_aa2rotmat_matches_scipy(self):
        aa = random_rotvecs(256)
        ours = np.asarray(rot.aa2rotmat(aa))
        ref = Rotation.from_rotvec(aa).as_matrix().reshape(-1, 9)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_aa2rotmat_zero_angle(self):
        ours = np.asarray(rot.aa2rotmat(np.zeros((4, 3)))).reshape(-1, 3, 3)
        np.testing.assert_allclose(ours, np.eye(3)[None].repeat(4, 0),
                                   atol=1e-7)

    def test_rotmat2aa_matches_scipy(self):
        aa = random_rotvecs(256)
        R = Rotation.from_rotvec(aa).as_matrix()
        ours = np.asarray(rot.rotmat2aa(R))
        ref = Rotation.from_matrix(R).as_rotvec()
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_roundtrip(self):
        aa = random_rotvecs(128)
        back = np.asarray(rot.rotmat2aa(rot.aa2rotmat(aa)))
        np.testing.assert_allclose(back, aa, atol=1e-4)

    def test_near_pi(self):
        aa = random_rotvecs(64)
        aa = aa / np.linalg.norm(aa, axis=-1, keepdims=True) * 3.14
        R = Rotation.from_rotvec(aa).as_matrix()
        ours = np.asarray(rot.rotmat2aa(R))
        ref = Rotation.from_matrix(R).as_rotvec()
        np.testing.assert_allclose(ours, ref, atol=1e-3)

    def test_flat_9dim_input(self):
        aa = random_rotvecs(16)
        R9 = Rotation.from_rotvec(aa).as_matrix().reshape(16, 9)
        ours = np.asarray(rot.rotmat2aa(R9))
        np.testing.assert_allclose(ours, aa, atol=1e-4)


class TestEuler:
    @pytest.mark.parametrize("seq", ["XYZ", "ZYX"])
    def test_matches_scipy(self, seq):
        aa = random_rotvecs(256, max_angle=3.0)
        R = Rotation.from_rotvec(aa).as_matrix()
        ours = np.asarray(rot.rotmat2euler(R, seq=seq))
        ref = Rotation.from_matrix(R).as_euler(seq)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_tfg_convention_roundtrip(self):
        # euler_from_rotmat: R = Rz Ry Rx == scipy extrinsic 'xyz'.
        aa = random_rotvecs(128, max_angle=3.0)
        R = Rotation.from_rotvec(aa).as_matrix()
        ours = np.asarray(rot.euler_from_rotmat(R))
        ref = Rotation.from_matrix(R).as_euler("xyz")
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_gimbal_lock_both_hemispheres(self):
        """Regression: the gimbal branch applied sign(r20) to only one
        arctan2 argument, so y = +pi/2 locks returned a sign-flipped x.
        The returned angles must RECONSTRUCT the input matrix (x and z
        are individually unrecoverable at the lock; their resolution
        with z = 0 must still compose back to R)."""
        for y_lock in (np.pi / 2, -np.pi / 2):
            for x_angle in (0.3, -0.7, 2.1):
                for z_angle in (0.0, 0.5, -1.2):
                    R = Rotation.from_euler(
                        "xyz", [x_angle, y_lock, z_angle]).as_matrix()
                    x, y, z = np.asarray(
                        rot.euler_from_rotmat(R[None]))[0]
                    R2 = Rotation.from_euler("xyz", [x, y, z]).as_matrix()
                    np.testing.assert_allclose(R2, R, atol=1e-5)


class TestClosestRotmat:
    def test_projects_noisy_rotations(self):
        aa = random_rotvecs(64)
        R = Rotation.from_rotvec(aa).as_matrix()
        noisy = R + 0.05 * RNG.standard_normal(R.shape)
        proj = np.asarray(rot.get_closest_rotmat(noisy))
        # Valid rotations: orthogonal, det +1.
        eye = proj @ proj.transpose(0, 2, 1)
        np.testing.assert_allclose(eye, np.eye(3)[None].repeat(64, 0),
                                   atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(proj), 1.0, atol=1e-5)
        # Close to the original rotation.
        assert np.abs(proj - R).max() < 0.15

    def test_identity_passthrough(self):
        R = np.eye(3)[None].repeat(5, 0)
        np.testing.assert_allclose(np.asarray(rot.get_closest_rotmat(R)), R,
                                   atol=1e-6)

    def test_reflection_fixed(self):
        refl = np.diag([1.0, 1.0, -1.0])[None]
        proj = np.asarray(rot.get_closest_rotmat(refl))
        np.testing.assert_allclose(np.linalg.det(proj), 1.0, atol=1e-5)


class TestRecover:
    def test_recover_shapes_and_values(self):
        aa = random_rotvecs(2 * 7 * 24).reshape(2, 7, 24, 3)
        R = Rotation.from_rotvec(aa.reshape(-1, 3)).as_matrix()
        motion = np.zeros((2, 7, 225), np.float32)
        motion[:, :, 6:9] = RNG.standard_normal((2, 7, 3))
        motion[:, :, 9:] = R.reshape(2, 7, 216)
        got_aa, got_t = rot.recover_to_axis_angles(motion)
        assert got_aa.shape == (2, 7, 24, 3)
        np.testing.assert_allclose(np.asarray(got_t), motion[:, :, 6:9],
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_aa), aa, atol=1e-3)
