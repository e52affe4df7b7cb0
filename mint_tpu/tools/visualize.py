"""Motion visualization (reference ``tools/calculate_scores.py:54-79``).

The reference renders generated motion with vedo (interactive 3-D); here
the SMPL joint skeleton is rendered with matplotlib into PNG frames or an
animated GIF — headless-friendly, same recover->FK path as scoring.
"""

from __future__ import annotations

import os

import numpy as np

from mint_tpu.motion.rotation import recover_to_axis_angles
from mint_tpu.motion.smpl import (SMPL_PARENTS, SMPLModel,
                                  default_rest_joints, load_smpl,
                                  smpl_joints)


def render_motion(motion: np.ndarray, out_path: str,
                  smpl_model_path: str = "", fps: int = 60,
                  stride: int = 10, elev: float = 15.0,
                  azim: float = -60.0) -> str:
    """[T, 225] (or [1, T, 225]) FACT motion -> skeleton animation.

    Writes a GIF if `out_path` ends in .gif, else a directory of PNGs.
    `stride` subsamples frames (every stride-th frame is drawn).
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if motion.ndim == 2:
        motion = motion[None]
    model = (load_smpl(smpl_model_path) if smpl_model_path
             else SMPLModel(j_rest=default_rest_joints(),
                            parents=SMPL_PARENTS))
    aa, transl = recover_to_axis_angles(motion)
    joints = np.asarray(smpl_joints(np.asarray(aa)[0],
                                    np.asarray(transl)[0], model))
    joints = joints[::stride]

    bones = [(i, int(SMPL_PARENTS[i])) for i in range(1, 24)]
    lo = joints.reshape(-1, 3).min(axis=0)
    hi = joints.reshape(-1, 3).max(axis=0)
    center, radius = (lo + hi) / 2, max((hi - lo).max() / 2, 1e-3)

    def draw(ax, frame):
        ax.clear()
        ax.view_init(elev=elev, azim=azim)
        for a, b in bones:
            ax.plot([frame[a, 0], frame[b, 0]],
                    [frame[a, 2], frame[b, 2]],
                    [frame[a, 1], frame[b, 1]], "o-", color="#1f77b4",
                    markersize=2, linewidth=1.5)
        ax.set_xlim(center[0] - radius, center[0] + radius)
        ax.set_ylim(center[2] - radius, center[2] + radius)
        ax.set_zlim(center[1] - radius, center[1] + radius)
        ax.set_axis_off()

    fig = plt.figure(figsize=(4, 4))
    ax = fig.add_subplot(111, projection="3d")

    if out_path.endswith(".gif"):
        from matplotlib.animation import FuncAnimation, PillowWriter
        anim = FuncAnimation(fig, lambda i: draw(ax, joints[i]),
                             frames=len(joints))
        anim.save(out_path, writer=PillowWriter(fps=max(1, fps // stride)))
    else:
        os.makedirs(out_path, exist_ok=True)
        for i, frame in enumerate(joints):
            draw(ax, frame)
            fig.savefig(os.path.join(out_path, f"frame_{i:05d}.png"),
                        dpi=80)
    plt.close(fig)
    return out_path


def main(argv=None):
    from absl import app, flags

    FLAGS = flags.FLAGS
    flags.DEFINE_string("motion_npy", None,
                        "Generated clip ([T, 225] or [1, T, 225] .npy).")
    flags.DEFINE_string("output", None, "Output .gif path or PNG dir.")
    flags.DEFINE_string("smpl_model_path", "", "SMPL .pkl (optional).")
    flags.DEFINE_integer("stride", 10, "Render every Nth frame.")

    def run(_):
        motion = np.load(FLAGS.motion_npy)
        path = render_motion(motion, FLAGS.output,
                             smpl_model_path=FLAGS.smpl_model_path,
                             stride=FLAGS.stride)
        print(f"wrote {path}")

    flags.mark_flag_as_required("motion_npy")
    flags.mark_flag_as_required("output")
    app.run(run, argv=argv)


if __name__ == "__main__":
    main()
