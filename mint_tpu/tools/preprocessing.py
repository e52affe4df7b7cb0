"""AIST++ -> tfrecord preprocessing CLI (reference tools/preprocessing.py).

Same behavior: cache 35-dim audio features per music as .npy; per
sequence, load SMPL motion, normalize translation by scaling, axis-angle ->
rotmats -> [T, 3 + 24*9 = 219]; serialize motion+audio+names+shapes into 20
tfrecord shards with seeded random shard assignment; for testval, append
10x unpaired (random music) examples.
"""

from __future__ import annotations

import os
import random

import numpy as np
from absl import app, flags, logging

from mint_tpu.audio import AudioFeatureExtractor
from mint_tpu.data import aist
from mint_tpu.data.example import encode_example
from mint_tpu.data.tfrecord import TFRecordWriter
from mint_tpu.motion.rotation import aa2rotmat

FLAGS = flags.FLAGS
flags.DEFINE_string("anno_dir", "/mnt/data/aist_plusplus_final/",
                    "Path to the AIST++ annotation files.")
flags.DEFINE_string("audio_dir", "/mnt/data/AIST/music/",
                    "Path to the AIST wav files.")
flags.DEFINE_string("audio_cache_dir", "/tmp/aist_audio_feats/",
                    "Path to cache dictionary for audio features.")
flags.DEFINE_enum("split", "train", ["train", "testval"],
                  "Whether do training set or testval set.")
flags.DEFINE_string("tfrecord_path", "./data/aist_tfrecord",
                    "Output path for the tfrecord files.")
flags.DEFINE_integer("n_shards", 20, "Number of output shards.")
flags.DEFINE_integer("audio_workers", 4,
                     "Processes for audio feature extraction "
                     "(0 = inline).")

RNG = np.random.RandomState(42)


def _worker_init() -> None:
    """Pool-worker initializer: pin JAX to the CPU backend.

    Forked workers cannot re-initialize a tunneled TPU plugin (the parent
    owns the single-tenant connection), and audio DSP runs on CPU by
    default anyway; flip ``jax_platforms`` through the config API before
    any backend initializes (env vars are too late — see CLAUDE.md).
    """
    if os.environ.get("MINT_TPU_AUDIO_DEVICE", "cpu") != "tpu":
        import jax
        jax.config.update("jax_platforms", "cpu")


def _extract_one(args) -> None:
    """Worker: cache one music's features (own process, own JAX init)."""
    audio_dir, cache_dir, name = args
    AudioFeatureExtractor(audio_dir, cache_dir=cache_dir)(name)


def create_writers(output_file: str, n_shards: int):
    return [TFRecordWriter("{}-{:0>5d}-of-{:0>5d}".format(
        output_file, i, n_shards)) for i in range(n_shards)]


def motion_to_features(smpl_poses: np.ndarray, smpl_scaling: np.ndarray,
                       smpl_trans: np.ndarray) -> np.ndarray:
    """[T, 72] axis-angle + scaling + [T, 3] transl -> [T, 219]
    (preprocessing.py:156-161)."""
    smpl_trans = smpl_trans / smpl_scaling
    t = smpl_poses.shape[0]
    rotmats = np.asarray(aa2rotmat(smpl_poses.reshape(t, 24, 3))
                         ).reshape(t, 216)
    return np.concatenate([smpl_trans, rotmats], axis=-1).astype(np.float32)


def to_example(motion: np.ndarray, audio: np.ndarray, motion_name: str,
               audio_name: str) -> bytes:
    """Serialize one tf.train.Example (preprocessing.py:54-69 schema)."""
    return encode_example({
        "motion_name": [motion_name.encode("utf-8")],
        "motion_sequence": np.asarray(motion, np.float32).ravel(),
        "motion_sequence_shape": np.asarray(motion.shape, np.int64),
        "audio_name": [audio_name.encode("utf-8")],
        "audio_sequence": np.asarray(audio, np.float32).ravel(),
        "audio_sequence_shape": np.asarray(audio.shape, np.int64),
    })


def main(_):
    os.makedirs(os.path.dirname(FLAGS.tfrecord_path) or ".", exist_ok=True)
    writers = create_writers("%s-%s" % (FLAGS.tfrecord_path, FLAGS.split),
                             FLAGS.n_shards)
    seq_names = aist.load_split(FLAGS.anno_dir, FLAGS.split)

    logging.info("Pre-compute audio features ...")
    extractor = AudioFeatureExtractor(FLAGS.audio_dir,
                                      cache_dir=FLAGS.audio_cache_dir)
    audio_names = sorted({aist.audio_name_of(s) for s in seq_names})
    if FLAGS.audio_workers:
        import multiprocessing
        with multiprocessing.Pool(FLAGS.audio_workers,
                                  initializer=_worker_init) as pool:
            pool.map(_extract_one,
                     [(FLAGS.audio_dir, FLAGS.audio_cache_dir, name)
                      for name in audio_names])
    else:
        for audio_name in audio_names:
            extractor(audio_name)

    motion_dir = os.path.join(FLAGS.anno_dir, "motions")

    def write_one(seq_name: str, audio_name: str):
        poses, scaling, trans = aist.load_motion(motion_dir, seq_name)
        motion = motion_to_features(poses, scaling, trans)
        audio = extractor(audio_name)
        record = to_example(motion, audio, seq_name, audio_name)
        writers[RNG.randint(0, len(writers))].write(record)

    for i, seq_name in enumerate(seq_names):
        logging.info("processing %d / %d", i + 1, len(seq_names))
        write_one(seq_name, aist.audio_name_of(seq_name))

    if FLAGS.split == "testval":
        logging.info("Also add un-paired motion-music data for testing.")
        for i, seq_name in enumerate(seq_names * 10):
            logging.info("processing %d / %d", i + 1, len(seq_names) * 10)
            write_one(seq_name,
                      aist.audio_name_of(random.choice(seq_names)))

    for w in writers:
        w.close()


def cli():
    """Console entry point (pyproject [project.scripts])."""
    app.run(main)


if __name__ == "__main__":
    app.run(main)
