"""SMPL FK, motion feature, and FID tests."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from mint_tpu.eval import features as feat_lib
from mint_tpu.eval import fid as fid_lib
from mint_tpu.motion import rotation as rot
from mint_tpu.motion import smpl as smpl_lib

RNG = np.random.default_rng(7)


class TestSMPLFK:
    def test_rest_pose_is_rest_joints(self):
        poses = np.zeros((1, 24, 3))
        transl = np.zeros((1, 3))
        joints = np.asarray(smpl_lib.smpl_joints(poses, transl))
        np.testing.assert_allclose(joints[0],
                                   smpl_lib.default_rest_joints(),
                                   atol=1e-5)

    def test_transl_shifts_all_joints(self):
        poses = np.zeros((1, 24, 3))
        t = np.array([[1.0, 2.0, 3.0]])
        j0 = np.asarray(smpl_lib.smpl_joints(poses, np.zeros((1, 3))))
        j1 = np.asarray(smpl_lib.smpl_joints(poses, t))
        np.testing.assert_allclose(j1 - j0, np.broadcast_to(t[:, None], j0.shape),
                                   atol=1e-5)

    def test_global_rotation_rotates_rigidly(self):
        poses = np.zeros((2, 24, 3))
        aa = np.array([0.0, np.pi / 2, 0.0])
        poses[1, 0] = aa  # root rotation only
        transl = np.zeros((2, 3))
        j = np.asarray(smpl_lib.smpl_joints(poses, transl))
        R = Rotation.from_rotvec(aa).as_matrix()
        root = j[0, 0]
        expected = (j[0] - root) @ R.T + root
        np.testing.assert_allclose(j[1], expected, atol=1e-5)

    def test_elbow_rotation_moves_only_descendants(self):
        poses = np.zeros((2, 24, 3))
        lelbow = smpl_lib.SMPL_JOINT_NAMES.index("lelbow")
        poses[1, lelbow] = [0, 0, np.pi / 2]
        j = np.asarray(smpl_lib.smpl_joints(poses, np.zeros((2, 3))))
        moved = np.abs(j[1] - j[0]).max(axis=-1) > 1e-6
        lwrist = smpl_lib.SMPL_JOINT_NAMES.index("lwrist")
        lhand = smpl_lib.SMPL_JOINT_NAMES.index("lhand")
        assert moved[lwrist] and moved[lhand]
        assert moved.sum() == 2  # nothing else moves

    def test_bone_lengths_preserved_under_pose(self):
        poses = RNG.uniform(-0.5, 0.5, (4, 24, 3))
        j = np.asarray(smpl_lib.smpl_joints(poses, np.zeros((4, 3))))
        rest = smpl_lib.default_rest_joints()
        parents = smpl_lib.SMPL_PARENTS
        for i in range(1, 24):
            p = parents[i]
            rest_len = np.linalg.norm(rest[i] - rest[p])
            posed_len = np.linalg.norm(j[:, i] - j[:, p], axis=-1)
            np.testing.assert_allclose(posed_len, rest_len, atol=1e-5)

    def test_batch_time_shapes(self):
        poses = np.zeros((2, 5, 24, 3))
        transl = np.zeros((2, 5, 3))
        j = np.asarray(smpl_lib.smpl_joints(poses, transl))
        assert j.shape == (2, 5, 24, 3)

    def test_traceable_under_jit(self):
        """The eval-device placement logic must not concretize tracers
        (tracers are jax.Array instances but `.committed` is
        concretization-only) — smpl_joints must stay jittable."""
        import jax

        f = jax.jit(smpl_lib.smpl_joints)
        j = np.asarray(f(np.zeros((2, 24, 3)), np.zeros((2, 3))))
        eager = np.asarray(
            smpl_lib.smpl_joints(np.zeros((2, 24, 3)), np.zeros((2, 3))))
        np.testing.assert_allclose(j, eager, atol=1e-6)


def _walk_motion(t=120, speed=1.0):
    """Rest-pose skeleton translating at `speed` m/s with arm swing."""
    poses = np.zeros((t, 24, 3))
    lsh = smpl_lib.SMPL_JOINT_NAMES.index("lshoulder")
    poses[:, lsh, 0] = 0.5 * np.sin(np.arange(t) * 2 * np.pi / 30)
    transl = np.zeros((t, 3))
    transl[:, 0] = np.arange(t) * speed / 60.0
    return np.asarray(smpl_lib.smpl_joints(poses, transl))


class TestKineticFeatures:
    def test_static_motion_zero_energy(self):
        j = np.broadcast_to(smpl_lib.default_rest_joints(),
                            (50, 24, 3)).copy()
        f = feat_lib.extract_kinetic_features(j)
        assert f.shape == (72,)
        np.testing.assert_allclose(f, 0.0, atol=1e-6)

    def test_faster_motion_more_energy(self):
        f_slow = feat_lib.extract_kinetic_features(_walk_motion(speed=0.5))
        f_fast = feat_lib.extract_kinetic_features(_walk_motion(speed=2.0))
        assert f_fast.sum() > f_slow.sum()

    def test_horizontal_vs_vertical_split(self):
        t = 60
        j = np.broadcast_to(smpl_lib.default_rest_joints(),
                            (t, 24, 3)).copy()
        j = j + np.zeros((t, 1, 3))
        j[:, :, 1] += np.sin(np.arange(t) / 5.0)[:, None]  # vertical bounce
        f = feat_lib.extract_kinetic_features(j).reshape(24, 3)
        assert (f[:, 1] > f[:, 0]).all()  # vertical energy dominates


class TestManualFeatures:
    def test_shape_and_range(self):
        f = feat_lib.extract_manual_features(_walk_motion())
        assert f.shape == (32,)
        assert (f >= 0).all() and (f <= 1).all()

    def test_static_pose_deterministic(self):
        j = np.broadcast_to(smpl_lib.default_rest_joints(),
                            (30, 24, 3)).copy()
        f1 = feat_lib.extract_manual_features(j)
        f2 = feat_lib.extract_manual_features(j)
        np.testing.assert_array_equal(f1, f2)
        # No movement features fire on a frozen pose.
        assert f1[12] == 0.0 and f1[13] == 0.0  # f_fast wrists


class TestFID:
    def test_identical_distributions_near_zero(self):
        x = RNG.standard_normal((200, 16))
        d = fid_lib.frechet_feature_distance(x, x.copy())
        assert abs(d) < 1e-6

    def test_shifted_distribution_positive(self):
        x = RNG.standard_normal((200, 16))
        y = x + 2.0
        d = fid_lib.frechet_feature_distance(x, y)
        # After z-norm by x's stats (std~1), shift of 2 -> d ~ 16*4.
        assert d > 30

    def test_analytic_gaussian_distance(self):
        mu1, mu2 = np.zeros(4), np.ones(4)
        s = np.eye(4)
        d = fid_lib.frechet_distance(mu1, s, mu2, s)
        assert d == pytest.approx(4.0, abs=1e-6)

    def test_singular_covariance_fallback(self):
        # Rank-deficient features (constant column) -> singular product.
        x = RNG.standard_normal((50, 4))
        x[:, 0] = 0.0
        y = RNG.standard_normal((50, 4))
        y[:, 0] = 0.0
        d = fid_lib.frechet_distance(
            np.mean(x, 0), np.cov(x, rowvar=False),
            np.mean(y, 0), np.cov(y, rowvar=False))
        assert np.isfinite(d)
