"""Autoregressive sliding-window decoder as a compiled ``lax.scan``.

The reference generates dances with an eager Python loop
(mint/core/fact_model.py:103-132): per generated frame it

1. slices the audio window ``audio[:, i : i+240]``,
2. runs the FULL 360-token forward (motion 120 + audio 240),
3. keeps output frame 0,
4. shifts the motion window left by one and appends the prediction.

That is one full forward per frame, eager, batch 1, CPU — the single biggest
performance hole in the reference.  Here the same *protocol* (bit-identical
update rule) is a ``lax.scan`` compiled once by XLA and batched over clips:

- the whole 1200-step loop runs on-device with no host round-trips,
- the audio linear embedding is hoisted out of the loop (it is
  position-independent, so embedding the full audio track once is exact),
- the motion linear embedding is maintained as a rolling embedded buffer —
  each step embeds only the one new frame (exact, since the linear embedding
  has no positional dependence),
- the transformers are recomputed per step, as they must be: the learned
  position embeddings re-bind to window-relative positions every step, so
  cross-step KV caching would change the math.  (A 16-layer/360-token
  recompute per frame maps straight onto the MXU.)

Note the position-embedding add happens inside the loop *after* slicing, so
results match the reference's recompute-everything loop exactly (modulo
floating-point summation order).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from mint_tpu.models.fact import FACT


# Query rows computed in the FINAL cross-modal block per decode step.  The
# protocol keeps only frame 0, so the other 359 rows of that block are dead
# work — but the winning truncation is tile-shaped, not minimal: measured on
# the bench protocol (40x300, bf16, unroll=8), ms/step full/1/16/48 =
# 26.10 / 26.88 / 25.22 / 25.15.  n_out=1 LOSES (latency-bound [B,1,*] ops
# break XLA's uniform-layer schedule); 48 keeps MXU-friendly tiles and wins
# ~4%.  Exactness is independent of the value (rows are row-local math).
_DECODE_LAST_BLOCK_ROWS = 48


def _forward_from_embedded(model: FACT, params, motion_emb: jax.Array,
                           audio_emb: jax.Array,
                           last_block_rows: int) -> jax.Array:
    """Forward pass given already-linear-embedded inputs, computing only
    the first ``last_block_rows`` output rows of the final cross-modal
    block (the AR protocol keeps just frame 0 — exact for any value).

    motion_emb: [B, motion_seq, hidden]  (linear embedding only, no pos)
    audio_emb:  [B, audio_seq, hidden]
    Returns [B, min(n_tokens, last_block_rows), out_dim].
    """

    def run(mdl: FACT):
        m = mdl.motion_pos_embedding(motion_emb)
        m = mdl.motion_transformer(m)
        a = mdl.audio_pos_embedding(audio_emb)
        a = mdl.audio_transformer(a)
        return mdl.cross(m, a, first_n_out=last_block_rows)

    return model.apply(params, method=run)


@functools.partial(jax.jit, static_argnames=("model", "name"))
def _embed(model: FACT, params, name: str, x: jax.Array) -> jax.Array:
    def run(mdl: FACT):
        emb = getattr(mdl, f"{name}_linear_embedding")
        return emb(x)

    return model.apply(params, method=run)


@functools.partial(jax.jit, static_argnames=("model", "steps", "unroll",
                                             "last_block_rows"))
def _decode_scan(model: FACT, params, motion_emb: jax.Array,
                 audio_emb_full: jax.Array, start,
                 steps: int, unroll: int, last_block_rows: int):
    """`steps` decode iterations starting at audio offset `start` (traced,
    so chunks of equal length share one compiled program).  Returns the
    updated embedded motion window and the generated frames
    [steps, B, motion_dim]."""
    audio_seq = model.audio_seq_length

    def step(carry, i):
        motion_emb = carry
        audio_emb = jax.lax.dynamic_slice_in_dim(
            audio_emb_full, i, audio_seq, axis=1)
        out = _forward_from_embedded(model, params, motion_emb, audio_emb,
                                     last_block_rows)
        frame = out[:, 0:1, :]  # keep only the first output frame
        # Shift the embedded motion window by one, append the new frame's
        # embedding (linear embedding commutes with the shift — exact).
        new_emb = _embed(model, params, "motion", frame)
        motion_emb = jnp.concatenate([motion_emb[:, 1:, :], new_emb], axis=1)
        return motion_emb, frame[:, 0, :]

    return jax.lax.scan(step, motion_emb, start + jnp.arange(steps),
                        unroll=unroll)


def infer_auto_regressive(model: FACT, params,
                          inputs: Dict[str, jax.Array],
                          steps: int = 1200,
                          unroll: int = 8,
                          dispatch_chunk: int | None = None,
                          last_block_rows: int = _DECODE_LAST_BLOCK_ROWS,
                          ) -> jax.Array:
    """Batched AR generation (protocol parity with fact_model.py:103-132).

    Args:
      model: a FACT module.
      params: parameter pytree.
      inputs: dict with ``motion_input`` [B, motion_seq, motion_dim] seed and
        ``audio_input`` [B, T_audio, audio_dim] full-length audio features.
      steps: frames to generate.  Like the reference, generation stops when
        the audio window would run past the end; with a static scan we
        instead require T_audio >= steps + audio_seq - 1 and callers
        pre-truncate `steps` accordingly (see :func:`max_steps`).
      unroll: ``lax.scan`` unroll factor (XLA sees `unroll` consecutive
        steps per loop iteration, enabling cross-step scheduling).
        Measured on TPU v5e at the bench protocol (40x1200, bf16):
        unroll 1/2/4/8/12 -> 28.3/28.3/26.5/25.6/25.6 ms per step; 8 is
        the plateau (+11% throughput) and the default.
      dispatch_chunk: if set, split the scan into device dispatches of at
        most this many steps (the carry stays on device; equal-size chunks
        share one compiled program, so the math and the results are
        IDENTICAL to the single-dispatch path).  Bounding the wall time of
        each dispatch matters on the tunneled single-chip platform, whose
        worker can drop executions that run for minutes (observed with
        batch-64 f32 1200-step programs); it also lets a caller interleave
        host work between chunks.
      last_block_rows: query rows computed in the FINAL cross-modal block
        (exact in real arithmetic for any value >= 1 — the protocol keeps
        only row 0 and the math is row-local past the attention K/V;
        pinned to 1e-6 on CPU f32).  On TPU, different values tile the
        final block's matmuls differently, so outputs differ at ULP
        level, which long AR rollouts amplify (measured 0.02 over 100
        f32 steps with random params) — the same accepted class as the
        evaluator's batch-composition deltas (docs/E2E.md).  Default 48,
        the bf16 bench optimum; the f32 scoring path has its own sweep
        (docs/BENCHMARKS.md "f32 scoring decode").

    Returns:
      [B, steps, motion_dim] generated frames.
    """
    audio_seq = model.audio_seq_length
    motion_input = inputs["motion_input"]
    audio_input = inputs["audio_input"]
    _, t_audio, _ = audio_input.shape
    if t_audio < steps + audio_seq - 1:
        raise ValueError(
            f"audio too short: {t_audio} frames < steps + audio_seq - 1 = "
            f"{steps + audio_seq - 1}; clamp steps with max_steps() first "
            "(the reference breaks out of its Python loop at this point)")

    if dispatch_chunk is not None and dispatch_chunk <= 0:
        # 0 = "no chunking" (one dispatch); a negative value is a bug at
        # the call site.  Without this, n = min(chunk, remaining) never
        # advanced `done` and the loop below spun forever.
        if dispatch_chunk < 0:
            raise ValueError(
                f"dispatch_chunk must be positive or None/0 (= one "
                f"dispatch); got {dispatch_chunk}")
        dispatch_chunk = None

    # Hoist position-independent embeddings out of the scan.
    audio_emb_full = _embed(model, params, "audio", audio_input)
    motion_emb = _embed(model, params, "motion", motion_input)

    if dispatch_chunk is None or dispatch_chunk >= steps:
        _, frames = _decode_scan(model, params, motion_emb, audio_emb_full,
                                 jnp.int32(0), steps, unroll,
                                 last_block_rows)
    else:
        parts = []
        done = 0
        while done < steps:
            n = min(dispatch_chunk, steps - done)
            motion_emb, part = _decode_scan(
                model, params, motion_emb, audio_emb_full,
                jnp.int32(done), n, unroll, last_block_rows)
            parts.append(part)
            done += n
        frames = jnp.concatenate(parts, axis=0)
    # frames: [steps, B, motion_dim] -> [B, steps, motion_dim]
    return jnp.transpose(frames, (1, 0, 2))


def max_steps(model: FACT, audio_len: int, requested: int = 1200) -> int:
    """Number of frames the reference protocol would actually generate.

    The reference breaks when ``audio[i : i+audio_seq]`` is short
    (fact_model.py:124-126): it generates min(requested,
    audio_len - audio_seq + 1) frames.
    """
    return max(0, min(requested, audio_len - model.audio_seq_length + 1))


def quantize_steps(n: int, bucket: int, cap: int | None = None) -> int:
    """Round a generatable length UP to a multiple of `bucket` so nearby
    lengths share one compiled decode program (used by the evaluator's
    ``steps_bucket`` and the serving batcher — keep them in lockstep).
    `cap` bounds the overshoot (e.g. the eval CLI's --steps): without
    it, every capped clip would decode up to bucket-1 wasted frames."""
    q = -(-n // bucket) * bucket
    return min(q, cap) if cap is not None else q


def padded_batch_size(n_real: int, mesh=None, cap: int | None = None) -> int:
    """The shared batch-padding rule for decode entry points (evaluator
    bucket runs and the serving batcher — keep them in lockstep): pad a
    partial batch UP to the next power of two so compiled decode programs
    are bounded to log2 batch sizes, optionally capped at `cap` (but never
    below ``n_real``), then — when sharding over a mesh — round UP to a
    data-axis multiple so rows shard evenly (pow2 alone breaks on e.g. a
    6-device data axis)."""
    target = 1 << (n_real - 1).bit_length()
    if cap is not None:
        target = min(target, max(cap, n_real))
    if mesh is not None:
        from mint_tpu.parallel import mesh as mesh_lib
        data_size = mesh.shape[mesh_lib.DATA_AXIS]
        target += (-target) % data_size
    return target


def infer_auto_regressive_reference(model: FACT, params,
                                    inputs: Dict[str, jax.Array],
                                    steps: int = 1200) -> jax.Array:
    """Direct transcription of the reference eager loop, for parity tests
    and as the baseline protocol measurement (one full forward per frame,
    Python loop, no embedding hoisting)."""
    audio_seq = model.audio_seq_length
    outputs = []
    motion_input = inputs["motion_input"]
    audio_full = inputs["audio_input"]
    for i in range(steps):
        audio_input = audio_full[:, i:i + audio_seq]
        if audio_input.shape[1] < audio_seq:
            break
        out = model.apply(params, {"motion_input": motion_input,
                                   "audio_input": audio_input})
        out = out[:, 0:1, :]
        outputs.append(out)
        motion_input = jnp.concatenate([motion_input[:, 1:, :], out], axis=1)
    return jnp.concatenate(outputs, axis=1)
