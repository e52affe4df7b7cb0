"""Ground-truth feature extraction CLI
(reference tools/extract_aist_features.py).

For every non-ignored AIST++ sequence: SMPL joints via JAX FK ->
kinetic + manual features saved as
``{save_dir}/{seq_name}_{kinetic,manual}.npy``.
"""

from __future__ import annotations

import multiprocessing
import os

import numpy as np
from absl import app, flags, logging

from mint_tpu.data import aist
from mint_tpu.eval.features import (extract_kinetic_features,
                                    extract_manual_features)
from mint_tpu.motion.smpl import (SMPLModel, SMPL_PARENTS,
                                  default_rest_joints, load_smpl,
                                  smpl_joints)

FLAGS = flags.FLAGS
flags.DEFINE_string("anno_dir", "/mnt/data/aist_plusplus_final/",
                    "AIST++ annotation dir.")
flags.DEFINE_string("smpl_model_path", "",
                    "SMPL .pkl; approximation used if empty.")
flags.DEFINE_string("save_dir", "./data/aist_features/",
                    "Output feature dir.")
flags.DEFINE_integer("workers", 12, "Process pool size (0 = inline).")


def _worker_init() -> None:
    """Pin pool workers to the CPU backend: forked workers cannot
    re-initialize a tunneled TPU plugin, and SMPL FK on [T,24] joints is
    CPU-cheap (same recipe as tools/preprocessing.py)."""
    import jax
    jax.config.update("jax_platforms", "cpu")


def _process(seq_name: str, motion_dir: str, model: SMPLModel,
             save_dir: str) -> None:
    logging.info("processing %s", seq_name)
    poses, scaling, trans = aist.load_motion(motion_dir, seq_name)
    t = poses.shape[0]
    joints = np.asarray(smpl_joints(
        poses.reshape(t, 24, 3), trans / scaling, model))
    np.save(os.path.join(save_dir, f"{seq_name}_kinetic.npy"),
            extract_kinetic_features(joints))
    np.save(os.path.join(save_dir, f"{seq_name}_manual.npy"),
            extract_manual_features(joints))


def main(_):
    os.makedirs(FLAGS.save_dir, exist_ok=True)
    if FLAGS.smpl_model_path:
        model = load_smpl(FLAGS.smpl_model_path)
    else:
        logging.warning("no --smpl_model_path; approximate rest joints")
        model = SMPLModel(j_rest=default_rest_joints(),
                          parents=SMPL_PARENTS)
    seq_names = (aist.load_split(FLAGS.anno_dir, "train")
                 + aist.load_split(FLAGS.anno_dir, "testval"))
    motion_dir = os.path.join(FLAGS.anno_dir, "motions")
    if FLAGS.workers:
        with multiprocessing.Pool(FLAGS.workers,
                                  initializer=_worker_init) as pool:
            pool.starmap(_process, [(s, motion_dir, model, FLAGS.save_dir)
                                    for s in seq_names])
    else:
        for s in seq_names:
            _process(s, motion_dir, model, FLAGS.save_dir)


if __name__ == "__main__":
    app.run(main)
