"""FID scoring CLI (reference tools/calculate_scores.py).

Reads generated clips ``outputs/*.npy`` of shape [120 + N, 225] (or
[1, 120+N, 225]), drops the 120-frame seed, recovers axis-angles +
translation (SVD-projected rotations), runs SMPL forward kinematics
(JAX, on-device-capable — vs the reference's PyTorch CPU), extracts
kinetic and manual features, and prints FID_k / FID_g against cached
ground-truth features.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np
from absl import app, flags, logging

from mint_tpu.eval.features import (extract_kinetic_features,
                                    extract_manual_features)
from mint_tpu.eval.fid import frechet_feature_distance
from mint_tpu.motion.rotation import recover_to_axis_angles
from mint_tpu.motion.smpl import (SMPLModel, SMPL_PARENTS,
                                  default_rest_joints, load_smpl,
                                  smpl_joints)

FLAGS = flags.FLAGS
flags.DEFINE_string("result_files", "outputs/*.npy",
                    "Glob of generated motion clips.")
flags.DEFINE_string("feature_dir", "./data/aist_features/",
                    "Cached ground-truth feature .npy dir "
                    "(from extract_features).")
flags.DEFINE_string("smpl_model_path", "",
                    "SMPL .pkl (e.g. SMPL_MALE.pkl); rest-joint "
                    "approximation used if empty.")
flags.DEFINE_integer("seed_frames", 120,
                     "Leading seed frames to drop before scoring.")
flags.DEFINE_string("audio_cache_dir", "",
                    "Cached 35-dim audio feature dir; when set, also "
                    "reports the Beat Alignment Score (music beats from "
                    "feature column 34 vs kinematic beats).")


def load_model() -> SMPLModel:
    if FLAGS.smpl_model_path:
        return load_smpl(FLAGS.smpl_model_path)
    logging.warning("no --smpl_model_path; using approximate rest joints")
    return SMPLModel(j_rest=default_rest_joints(), parents=SMPL_PARENTS)


def joints_of(motion: np.ndarray, model: SMPLModel) -> np.ndarray:
    """[1, T, 225] -> [T, 24, 3] joints (calculate_scores.py:154-162)."""
    aa, transl = recover_to_axis_angles(motion)
    return np.asarray(smpl_joints(np.asarray(aa)[0],
                                  np.asarray(transl)[0], model))


def extract_feature(motion: np.ndarray, model: SMPLModel,
                    mode: str,
                    joints: Optional[np.ndarray] = None) -> np.ndarray:
    """[1, T, 225] -> feature vector (reference API,
    calculate_scores.py:154-170).

    Convenience wrapper mirroring the reference's per-mode function;
    pass precomputed `joints` to share one FK run across both feature
    families (main() below does — the SMPL forward pass dominates)."""
    if joints is None:
        joints = joints_of(motion, model)
    if mode == "kinetic":
        return extract_kinetic_features(joints)
    return extract_manual_features(joints)


def main(_):
    real_features = {
        "kinetic": [np.load(f) for f in sorted(glob.glob(
            os.path.join(FLAGS.feature_dir, "*_kinetic.npy")))],
        "manual": [np.load(f) for f in sorted(glob.glob(
            os.path.join(FLAGS.feature_dir, "*_manual.npy")))],
    }
    if not real_features["kinetic"]:
        raise FileNotFoundError(
            f"no ground-truth features in {FLAGS.feature_dir}; run "
            "python -m mint_tpu.tools.extract_features first")

    model = load_model()
    result_features = {"kinetic": [], "manual": []}
    beat_scores = []
    result_files = sorted(glob.glob(FLAGS.result_files))
    if not result_files:
        raise FileNotFoundError(f"no results match {FLAGS.result_files}")
    for i, path in enumerate(result_files):
        logging.info("scoring %d / %d: %s", i + 1, len(result_files), path)
        motion = np.load(path)
        if motion.ndim == 2:
            motion = motion[None]
        motion = motion[:, FLAGS.seed_frames:]
        joints = joints_of(motion, model)  # one FK run, both families
        result_features["kinetic"].append(
            extract_feature(motion, model, "kinetic", joints=joints))
        result_features["manual"].append(
            extract_feature(motion, model, "manual", joints=joints))
        if FLAGS.audio_cache_dir:
            from mint_tpu.eval.beat_align import clip_beat_alignment
            # {motion_name}_{audio_name}.npy -> audio_name (last token).
            audio_name = os.path.basename(path)[:-4].split("_")[-1]
            feat_path = os.path.join(FLAGS.audio_cache_dir,
                                     f"{audio_name}.npy")
            if os.path.exists(feat_path):
                ba = clip_beat_alignment(joints, np.load(feat_path),
                                         start_frame=FLAGS.seed_frames)
                if ba is not None:
                    beat_scores.append(ba)

    fid_k = frechet_feature_distance(real_features["kinetic"],
                                     result_features["kinetic"])
    fid_g = frechet_feature_distance(real_features["manual"],
                                     result_features["manual"])
    # Reference expectation: FID_k ~38, FID_g ~27 (calculate_scores.py:223).
    print("\nEvaluation: FID_k: {:.4f}, FID_g: {:.4f}\n".format(fid_k,
                                                                fid_g))
    if beat_scores:
        print("Beat Alignment Score: {:.4f} over {} clips\n".format(
            float(np.mean(beat_scores)), len(beat_scores)))


def cli():
    """Console entry point (pyproject [project.scripts])."""
    app.run(main)


if __name__ == "__main__":
    app.run(main)
