"""mint_tpu: a TPU-native (JAX/XLA/Pallas) rebuild of the MINT / AI Choreographer
(FACT) framework.

The reference implementation (google-research/mint) is a TensorFlow 2 / Orbit
stack; this package provides the same capabilities re-designed TPU-first:

- ``mint_tpu.config``   — textproto-compatible typed configuration system.
- ``mint_tpu.models``   — the FACT cross-modal transformer in Flax.
- ``mint_tpu.ops``      — Pallas/XLA kernels: fused attention, audio DSP
  (STFT/mel/MFCC/CENS-chroma/onset/beat), SMPL forward kinematics, rotations.
- ``mint_tpu.data``     — TFRecord I/O (no TensorFlow dependency) and the
  FACT windowing input pipeline.
- ``mint_tpu.train``    — jit/shard_map data-parallel training loop,
  LR schedules, Orbax checkpointing, controller (Orbit equivalent).
- ``mint_tpu.infer``    — lax.scan autoregressive sliding-window decoder.
- ``mint_tpu.eval``     — FID (kinetic/geometric) scoring, beat alignment.
- ``mint_tpu.parallel`` — device mesh / sharding helpers (dp x tp).
"""

__version__ = "0.1.0"
