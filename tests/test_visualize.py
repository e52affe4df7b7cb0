"""Skeleton renderer test."""

import os

import numpy as np
from scipy.spatial.transform import Rotation

from mint_tpu.tools.visualize import render_motion

RNG = np.random.default_rng(3)


def test_render_gif_and_frames(tmp_path):
    t = 30
    aa = (0.04 * RNG.standard_normal((t, 24, 3))).cumsum(0)
    rot = Rotation.from_rotvec(aa.reshape(-1, 3)).as_matrix().reshape(t, 216)
    motion = np.zeros((t, 225), np.float32)
    motion[:, 9:] = rot

    gif = str(tmp_path / "out.gif")
    render_motion(motion, gif, stride=10)
    assert os.path.getsize(gif) > 1000

    frames_dir = str(tmp_path / "frames")
    render_motion(motion[None], frames_dir, stride=15)
    assert len(os.listdir(frames_dir)) == 2
