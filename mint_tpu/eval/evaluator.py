"""Generation evaluator — the reference SingleTaskEvaluator, TPU-native.

Reference behavior (``mint/ctl/single_task_evaluator.py:59-97``): per eval
batch, autoregressively generate ``steps`` frames, prepend the 120-frame
seed motion, save each clip as ``{output_dir}/{motion_name}_{audio_name}
.npy``, update metrics; ``eval_end`` exports a metric dict.

The reference runs this eagerly, batch-1, one full forward per frame.
Here clips are BUCKETED BY GENERATABLE LENGTH (the reference stops when
the sliding audio window hits the end — fact_model.py:124-126) and each
bucket is generated with the compiled batched ``lax.scan`` decoder —
identical protocol, whole-bucket parallelism.
"""

from __future__ import annotations

import collections
import logging
import os
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mint_tpu.infer import decoder
from mint_tpu.models.fact import FACT
from mint_tpu.parallel import mesh as mesh_lib

_log = logging.getLogger(__name__)


#: Measured single-chip decode-batch optimum at the f32 scoring protocol
#: (docs/BENCHMARKS.md "f32 scoring decode BATCH sweep"): per-frame decode
#: throughput FALLS with batch on one chip, so the default keeps each
#: device's share of a dispatch at this size.
PER_DEVICE_DECODE_BATCH = 8


class Evaluator:
    """Batched AR-generation evaluator."""

    def __init__(self, model: FACT, dataset,
                 metrics: Sequence = (), output_dir: Optional[str] = None,
                 steps: int = 1200, decode_batch: Optional[int] = None,
                 mesh=None,
                 dispatch_chunk: Optional[int] = 200,
                 steps_bucket: Optional[int] = None,
                 fold_ln: bool = False,
                 cache_examples: bool = True,
                 decode_unroll: Optional[int] = None,
                 decode_rows: Optional[int] = None):
        """`dataset` is an iterable of batches, or a zero-arg callable
        returning one (for continuous eval, which runs a pass per
        checkpoint — reference re-iterates its tf.data.Dataset).  A plain
        one-shot iterator is drained once and its examples cached.

        `cache_examples` (default True) also caches the flattened corpus
        across passes for CALLABLE datasets: the eval corpus is a fixed
        file set for the duration of a run, so re-draining it per
        checkpoint yields identical examples while re-paying the tfrecord
        read+parse each pass (0.2 s on the warm-cache 187 MB E2E corpus —
        scripts/exp_eval_corpus_cache.py — but proportional to corpus
        size and cold-cache I/O).  Pass False to re-invoke the factory
        every pass (e.g. if eval tfrecords are appended to while a
        continuous eval is running).  Re-iterable non-callables (lists,
        containers with __iter__) honor the flag the same way; true
        one-shot iterators are always cached since a second drain would
        silently yield an empty corpus.

        `decode_batch` caps how many clips one decode dispatch carries.
        Default (None) is MESH-AWARE: ``PER_DEVICE_DECODE_BATCH (8) ×
        the mesh's data-axis size`` (×1 without a mesh).  At the f32
        scoring protocol, per-frame decode throughput FALLS with
        per-chip batch (1683 f/s at batch 8 vs 1061 at batch 64, full
        1200-step protocol, median of 3 — docs/BENCHMARKS.md "f32
        scoring decode BATCH sweep"), so several small dispatches finish
        the same clips 59% sooner than one big one — but the optimum is
        PER DEVICE: a fixed cap of 8 on an 8-wide data axis would put
        one clip per device per dispatch, wasting 7/8 of the fleet's
        measured batch capacity.  An explicit int pins the cap exactly
        (sweeps, protocol pinning).

        With `mesh` (a jax.sharding.Mesh), decode batches are sharded over
        the mesh's data axis — multi-chip generation; clip buckets are
        padded to a multiple of the data-axis size and trimmed after.

        `dispatch_chunk` bounds each device dispatch to that many decode
        steps (results identical; see decoder.infer_auto_regressive) —
        a full-eval f32 batch-64 1200-step program is minutes of device
        time in ONE dispatch, which the tunneled single-chip platform's
        worker can drop mid-run.

        `steps_bucket` (optional) quantizes generatable lengths UPWARD so
        nearby audio lengths share one compiled decode program instead of
        one per distinct length (compile dominates one-shot eval; real
        AIST++ music lengths vary).  Exact: decode frame i only reads
        audio rows [i, i+window), which are fully real for i < the
        clip's true length; the extra frames (decoded over zero-padded
        audio) are trimmed per clip before saving, and metrics are
        updated per true-length group on trimmed outputs (their
        ``audio_input`` retains the zero-padded tail — irrelevant to the
        reference metric, which reads only target/output).  Same scheme
        the serving path uses (serving/server.py).

        `decode_unroll` / `decode_rows` override the decoder's scan unroll
        and final-block query truncation (see
        decoder.infer_auto_regressive for the exactness notes).  Default
        None = the decoder defaults; docs/BENCHMARKS.md "f32 scoring
        decode" records the measured optimum at the f32 scoring protocol
        (batch 64, 200-step dispatch chunks).  The knobs exist so a
        dtype/hardware whose optimum differs can set them without
        touching the decoder.

        `fold_ln` folds the pre-LN affines into the adjacent kernels per
        restored checkpoint (mint_tpu/models/fold.py).  Default False:
        the fold is exact, but on TPU v5e the folded program measured 5%
        SLOWER end-to-end (the new QKV bias/schedule outweighs the
        removed affine — docs/BENCHMARKS.md, round-3 ablations); the
        knob exists for hardware where the trade flips.
        """
        self.model = model
        self.dataset = dataset
        self.metrics = list(metrics)
        self.output_dir = output_dir
        self.steps = steps
        if decode_batch is None:
            data = mesh.shape[mesh_lib.DATA_AXIS] if mesh is not None else 1
            decode_batch = PER_DEVICE_DECODE_BATCH * data
        self.decode_batch = int(decode_batch)
        if self.decode_batch < 1:
            # A negative value would make the bucket loop's range() step
            # backwards — zero clips decoded, yet the empty metric
            # accumulators would still "return" a result.
            raise ValueError(
                f"decode_batch must be >= 1, got {self.decode_batch}")
        self.mesh = mesh
        self.dispatch_chunk = dispatch_chunk
        self.steps_bucket = (int(steps_bucket)
                             if steps_bucket and steps_bucket > 0 else None)
        self.fold_ln = bool(fold_ln)
        self.cache_examples = bool(cache_examples)
        self.decode_unroll = decode_unroll
        self.decode_rows = decode_rows
        self._decode_model = model  # replaced per-evaluate when folding
        self._cache: Optional[List[Dict]] = None

    def _examples(self) -> List[Dict]:
        """Flatten the (possibly batched) dataset into per-clip examples."""
        if self._cache is not None:
            return self._cache
        source = self.dataset() if callable(self.dataset) else self.dataset
        examples = []
        for batch in source:
            motion = np.asarray(batch["motion_input"])
            audio = np.asarray(batch["audio_input"])
            if motion.ndim == 2:  # unbatched example
                motion, audio = motion[None], audio[None]
                names = [(batch.get("motion_name", b"motion"),
                          batch.get("audio_name", b"audio"))]
            else:
                names = list(zip(batch.get("motion_name",
                                           [b"motion"] * len(motion)),
                                 batch.get("audio_name",
                                           [b"audio"] * len(motion))))
            for i in range(len(motion)):
                examples.append({
                    "motion_input": motion[i],
                    "audio_input": audio[i],
                    "motion_name": names[i][0],
                    "audio_name": names[i][1],
                    "target": (np.asarray(batch["target"])[i]
                               if "target" in batch else None),
                })
        # One-shot ITERATORS (iter(x) is x) are always cached — a second
        # drain would silently yield an empty corpus.  Everything
        # re-iterable (callables, lists, custom __iter__ containers)
        # honors cache_examples, so the opt-out really does re-read a
        # dataset that may have grown between passes.
        one_shot = (not callable(self.dataset)
                    and iter(self.dataset) is self.dataset)
        if self.cache_examples or one_shot:
            self._cache = examples
        return examples

    def evaluate(self, params) -> Dict[str, float]:
        """One full eval pass; returns the metric dict."""
        t_pass = time.monotonic()
        if self.fold_ln:
            from mint_tpu.models.fold import fold_for_decode
            self._decode_model, params = fold_for_decode(self.model, params)
        else:
            self._decode_model = self.model
        if self.mesh is not None:
            # Restored params are single-device-committed; replicate
            # once per pass (no-op when already so placed — mesh_lib
            # docs).
            params = mesh_lib.replicate_params(params, self.mesh)
        for metric in self.metrics:
            metric.reset_states()
        if self.output_dir is not None:
            os.makedirs(self.output_dir, exist_ok=True)

        examples = self._examples()
        # Bucket clips by how many frames the reference protocol generates
        # (quantized upward when steps_bucket is set; trimmed per clip).
        buckets = collections.defaultdict(list)
        skipped = []
        for ex in examples:
            n = decoder.max_steps(self.model, ex["audio_input"].shape[0],
                                  self.steps)
            if n > 0:
                ex = dict(ex, true_steps=n)
                key = (n if self.steps_bucket is None
                       else decoder.quantize_steps(n, self.steps_bucket,
                                                   cap=self.steps))
                buckets[key].append(ex)
            else:
                skipped.append(_decode(ex["motion_name"]))
        if skipped:
            _log.warning(
                "skipping %d clip(s) whose audio (< %d frames) cannot "
                "fill one decode window: %s", len(skipped),
                self.model.audio_seq_length, ", ".join(skipped[:10]))

        for n_steps, bucket in sorted(buckets.items()):
            for i in range(0, len(bucket), self.decode_batch):
                self._run_bucket(params, bucket[i:i + self.decode_batch],
                                 n_steps)

        _log.info("eval pass done: %d clip(s), %d bucket(s), wall %.1f s",
                  len(examples) - len(skipped), len(buckets),
                  time.monotonic() - t_pass)
        return {m.name: float(m.result()) for m in self.metrics}

    def _run_bucket(self, params, bucket: List[Dict], n_steps: int) -> None:
        audio_len = n_steps + self.model.audio_seq_length - 1
        motion = np.stack([ex["motion_input"] for ex in bucket])
        # With quantized buckets a clip's audio may be shorter than the
        # bucket's decode horizon: zero-pad the tail.  Exact for the kept
        # frames — frame i < true_steps reads only real audio rows.
        audio = np.stack([
            np.pad(a := np.asarray(ex["audio_input"][:audio_len],
                                   np.float32),
                   [[0, audio_len - a.shape[0]], [0, 0]])
            for ex in bucket])
        n_real = len(bucket)
        # Pad a partial batch up to the next POWER OF TWO (capped at
        # decode_batch), repeating the last clip (trimmed below): compiled
        # decode programs are bounded to log2(decode_batch) batch sizes —
        # compile dominates one-shot eval wall time — while a 1-clip
        # length bucket no longer decodes decode_batch rows on every
        # checkpoint pass of a continuous eval.  With a mesh, the padded
        # total is then rounded UP to a data-axis multiple (padding to a
        # fixed decode_batch would break sharding whenever it is not
        # divisible by the data axis, e.g. 64 on 6 devices).  The rule is
        # shared with the serving batcher (decoder.padded_batch_size).
        target = decoder.padded_batch_size(
            n_real, mesh=self.mesh, cap=self.decode_batch)
        pad = target - n_real
        if pad:
            motion = np.concatenate(
                [motion, np.repeat(motion[-1:], pad, axis=0)])
            audio = np.concatenate(
                [audio, np.repeat(audio[-1:], pad, axis=0)])
        if self.mesh is not None:
            sharding = mesh_lib.batch_sharding(self.mesh)
            motion = jax.device_put(motion, sharding)
            audio = jax.device_put(audio, sharding)
        else:
            motion, audio = jnp.asarray(motion), jnp.asarray(audio)
        decode_kwargs = {}
        if self.decode_unroll is not None:
            decode_kwargs["unroll"] = self.decode_unroll
        if self.decode_rows is not None:
            decode_kwargs["last_block_rows"] = self.decode_rows
        t0 = time.monotonic()
        out = decoder.infer_auto_regressive(
            self._decode_model, params,
            {"motion_input": motion, "audio_input": audio}, steps=n_steps,
            dispatch_chunk=self.dispatch_chunk, **decode_kwargs)
        # Dispatch returns async; the np.asarray below blocks on the device
        # work, so t_dispatch is dominated by trace+compile on a program's
        # first use and ~0 after.
        t_dispatch = time.monotonic() - t0
        t0 = time.monotonic()
        # Prepend the seed (single_task_evaluator.py:71); drop pad clips.
        full = np.concatenate([np.asarray(motion), np.asarray(out)],
                              axis=1)[:n_real]
        _log.info("decode batch=%d(+%d pad) steps=%d: dispatch %.1f s, "
                  "execute+fetch %.1f s", n_real, pad, n_steps, t_dispatch,
                  time.monotonic() - t0)
        motion = np.asarray(motion)[:n_real]
        audio = np.asarray(audio)[:n_real]

        motion_seq = self.model.motion_seq_length
        if self.output_dir is not None:
            for i, ex in enumerate(bucket):
                name = "%s_%s.npy" % (_decode(ex["motion_name"]),
                                      _decode(ex["audio_name"]))
                # Trim quantization overshoot: seed + the clip's TRUE
                # generatable length (the reference protocol's output).
                np.save(os.path.join(self.output_dir, name),
                        full[i][:motion_seq + ex.get("true_steps", n_steps)])

        if self.metrics:
            # One update per CLIP: the reference evaluates with
            # eval batch_size=1 (configs/...config:119), so its metric
            # accumulation is per-clip — updating per clip both matches
            # that protocol and makes the accumulated value independent
            # of decode batching / bucket composition.  Overshoot frames
            # (quantized buckets) are trimmed to the clip's true length.
            for i, ex in enumerate(bucket):
                true_n = ex.get("true_steps", n_steps)
                inputs = {"motion_input": motion[i:i + 1],
                          "audio_input": audio[i:i + 1]}
                if ex.get("target") is not None:
                    inputs["target"] = np.stack([ex["target"]])
                for metric in self.metrics:
                    metric.update_state(
                        inputs, full[i:i + 1, :motion_seq + true_n])


def _decode(name) -> str:
    if isinstance(name, bytes):
        return name.decode("utf-8")
    return str(name)
