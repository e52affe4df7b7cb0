"""Device-resident training corpus: window sampling ON the TPU.

The reference streams windows from tf.data on the host every step
(``mint/core/inputs.py:63-121``).  On a chip behind a high-latency /
low-bandwidth host link, per-step host->device input transfer (~5 MB per
batch-32 step for FACT) caps training throughput regardless of how fast
the host loader is.  The TPU-native alternative implemented here: decode
the corpus ONCE into two HBM-resident arrays (motion [sum_T, 225], audio
[sum_T, 35] — the full AIST++ train split is ~3.5 GB f32, well inside one
v5e's 16 GB), and draw each step's random windows on-device with
``jax.random`` + batched dynamic slices, inside the same compiled scan as
the train steps.  After the one-time upload, training runs with ZERO
per-step host traffic.

Sampling semantics vs the reference (documented divergence): the
reference shuffles examples into epochs (each sequence visited once per
epoch, buffer 100, ``inputs.py:63-70``) and takes one uniform window per
visit (``inputs_util.py:74-82``); here every step draws sequences i.i.d.
uniformly, then a uniform window within the sequence — the same marginal
window distribution per draw, without epoch structure.  Over the
reference's 2.4 M-step schedule the difference is statistical noise; the
host loaders (``--input_backend=native|python``) keep exact epoch
semantics for anyone who needs them.

Multi-host: every process uploads the SAME corpus (replicated) and folds
the same key stream, so the jitted program stays SPMD-consistent; the
sampled batch itself is sharded over the mesh's data axis.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from mint_tpu.data import pipeline as data_pipeline
from mint_tpu.data import tfrecord
from mint_tpu.parallel import mesh as mesh_lib


class DeviceDataset:
    """An HBM-resident windowed training corpus.

    Attributes:
      arrays: dict of device arrays — ``motion`` [sum_T, motion_dim],
        ``audio`` [sum_T, audio_dim], ``offsets`` [n] i32 (first row of
        each sequence in the stores), ``counts`` [n] i32 (number of valid
        window starts per sequence).
    """

    def __init__(self, motion: np.ndarray, audio: np.ndarray,
                 offsets: np.ndarray, counts: np.ndarray,
                 motion_input_len: int, target_len: int, target_shift: int,
                 audio_input_len: int, batch_size: int, mesh=None):
        self.motion_input_len = int(motion_input_len)
        self.target_len = int(target_len)
        self.target_shift = int(target_shift)
        self.audio_input_len = int(audio_input_len)
        self.batch_size = int(batch_size)
        self.motion_span = max(self.motion_input_len,
                               self.target_shift + self.target_len)
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh()
        self.n_sequences = int(len(offsets))
        if self.n_sequences == 0:
            raise ValueError(
                "no sequence is long enough for one training window")
        replicated = mesh_lib.replicated(self.mesh)
        self.arrays = {
            "motion": jax.device_put(np.ascontiguousarray(motion),
                                     replicated),
            "audio": jax.device_put(np.ascontiguousarray(audio), replicated),
            "offsets": jax.device_put(offsets.astype(np.int32), replicated),
            "counts": jax.device_put(counts.astype(np.int32), replicated),
        }

    # -- construction -----------------------------------------------------

    @classmethod
    def from_files(cls, files: Sequence[str], dataset_config, batch_size: int,
                   mesh=None, verify_crc: bool = False) -> "DeviceDataset":
        """Decode tfrecord shards into the resident stores.

        Window geometry comes from the dataset config exactly like the
        host pipeline (``get_modality_to_param_dict``); motion is padded
        219->225 with 6 leading zeros here, once, instead of per-window
        (``inputs_util.py:70-73``).
        """
        params = data_pipeline.get_modality_to_param_dict(dataset_config)
        motion_in = params["motion"]["input_length"]
        target_len = params["motion"]["target_length"]
        target_shift = params["motion"]["target_shift"]
        audio_in = params["audio"]["input_length"]
        window = max(motion_in, target_shift + target_len, audio_in)

        motions, audios, lengths = [], [], []
        for record in tfrecord.read_many(list(files), verify_crc=verify_crc):
            ex = data_pipeline.parse_example(record)
            motion = np.asarray(ex["motion_sequence"], np.float32)
            audio = np.asarray(ex["audio_sequence"], np.float32)
            usable = min(motion.shape[0], audio.shape[0])
            if usable < window:   # dropped, like the host loaders
                continue
            motion = np.pad(motion[:usable], [[0, 0], [6, 0]])
            motions.append(motion)
            audios.append(audio[:usable])
            lengths.append(usable)
        if not motions:
            raise ValueError(
                f"no sequence in {len(list(files))} shard(s) is long enough "
                f"for one {window}-frame training window")
        lengths = np.asarray(lengths, np.int64)
        offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])
        counts = lengths - window + 1
        return cls(np.concatenate(motions), np.concatenate(audios),
                   offsets, counts, motion_in, target_len, target_shift,
                   audio_in, batch_size, mesh=mesh)

    # -- sampling (pure; called under jit) --------------------------------

    def sample(self, arrays: Dict[str, jax.Array], key: jax.Array
               ) -> Dict[str, jax.Array]:
        """Draw one [batch] of training windows from the resident stores.

        Pure function of (arrays, key) — traceable inside the fused train
        scan.  Sequence choice is uniform over sequences (matching the
        reference's one-window-per-example-per-epoch marginal), window
        start uniform over the sequence's valid starts.
        """
        k_seq, k_start = jax.random.split(key)
        b = self.batch_size
        idx = jax.random.randint(k_seq, (b,), 0, self.n_sequences)
        u = jax.random.uniform(k_start, (b,))
        counts = arrays["counts"][idx]
        start = jnp.minimum((u * counts).astype(jnp.int32), counts - 1)
        pos = arrays["offsets"][idx] + start

        def one(p):
            motion_span = jax.lax.dynamic_slice_in_dim(
                arrays["motion"], p, self.motion_span, axis=0)
            audio = jax.lax.dynamic_slice_in_dim(
                arrays["audio"], p, self.audio_input_len, axis=0)
            return motion_span, audio

        motion_span, audio = jax.vmap(one)(pos)
        sharding = mesh_lib.batch_sharding(self.mesh)
        batch = {
            "motion_input": motion_span[:, :self.motion_input_len],
            "target": motion_span[:, self.target_shift:
                                  self.target_shift + self.target_len],
            "audio_input": audio,
        }
        return {k: jax.lax.with_sharding_constraint(v, sharding)
                for k, v in batch.items()}

    # -- sizing -----------------------------------------------------------

    @property
    def nbytes(self) -> int:
        return sum(int(np.prod(a.shape)) * a.dtype.itemsize
                   for a in self.arrays.values())
