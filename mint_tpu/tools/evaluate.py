"""Continuous generation-eval CLI (reference evaluator.py).

Watches the model_dir for new checkpoints; for each one, autoregressively
generates the eval set (batched lax.scan decode, vs the reference's eager
batch-1 loop) and writes ``outputs/{motion_name}_{audio_name}.npy`` clips
of shape [seed 120 + generated, 225] for offline FID scoring.
"""

from __future__ import annotations

import os

from absl import app, flags

from mint_tpu.config.schema import load_pipeline_config
from mint_tpu.data import pipeline as data_pipeline
from mint_tpu.eval.evaluator import Evaluator
from mint_tpu.models import builder
from mint_tpu.models.fact import abstract_params
from mint_tpu.train.checkpoint import CheckpointManager
from mint_tpu.train.controller import Controller
from mint_tpu.train.trainer import TrainState

FLAGS = flags.FLAGS
flags.DEFINE_string("model_dir", None,
                    "Directory to write training checkpoints and logs")
flags.DEFINE_string("config_path", None, "Path to the config file.")
flags.DEFINE_string("eval_prefix", "valid",
                    "Prefix for evaluation summaries.")
flags.DEFINE_string("output_dir", "outputs", "Where to save the results.")
flags.DEFINE_integer("steps", 1200, "Frames to generate per clip.")
flags.DEFINE_float("timeout", 70000,
                   "Seconds to keep watching for new checkpoints.")
flags.DEFINE_bool("use_bfloat16", False,
                  "Decode in bfloat16 (the reference evaluates in f32 "
                  "eager; measured FID impact on the E2E corpus is in "
                  "docs/E2E.md).")
flags.DEFINE_integer("steps_bucket", 128,
                     "Quantize generatable lengths up to multiples of "
                     "this so nearby audio lengths share one compiled "
                     "decoder (0 = off; default matches the serving "
                     "batcher).  Protocol-exact: padded audio is never "
                     "read by kept frames and overshoot is trimmed per "
                     "clip.  Bucketing can regroup clips into different "
                     "decode-batch shapes, so saved floats may differ "
                     "from --steps_bucket=0 within XLA fusion tolerance "
                     "(metrics are batching-invariant, tests/test_eval).")
flags.DEFINE_integer("decode_batch", 0,
                     "Max clips per decode dispatch; 0 (default) = "
                     "mesh-aware auto: 8 per data-axis device (the "
                     "mesh comes from --data_parallelism).  Small "
                     "PER-DEVICE batches decode FASTER per frame (batch "
                     "8: 1683 f/s vs batch 64: 1061 f/s at the full f32 "
                     "scoring protocol — docs/BENCHMARKS.md 'f32 "
                     "scoring decode BATCH sweep'); metrics are "
                     "batching-invariant.")
flags.DEFINE_integer("data_parallelism", 0,
                     "Shard decode batches over this many devices "
                     "(0 = all visible devices; 1 = single-chip).  "
                     "Mirrors the serving CLI; clip buckets shard over "
                     "the mesh's data axis and params are replicated "
                     "once per checkpoint pass.")
flags.DEFINE_bool("reload_dataset_per_pass", False,
                  "Re-read the eval tfrecords for every checkpoint pass "
                  "instead of caching the parsed corpus after the first "
                  "(only needed if eval files are appended to while a "
                  "continuous eval is running; the re-read costs the "
                  "full corpus parse per checkpoint).")
# Unused flags kept for sweep compatibility (reference evaluator.py:36-41).
flags.DEFINE_float("initial_learning_rate", 0.1, "UNUSED FLAG.")
flags.DEFINE_float("weight_decay", None, "UNUSED FLAG.")


class _EvalAdapter:
    """Adapts Evaluator to the Controller's evaluator protocol."""

    def __init__(self, evaluator: Evaluator):
        self._evaluator = evaluator

    def evaluate(self, state):
        params = state.params if hasattr(state, "params") else state
        return self._evaluator.evaluate(params)


def evaluate():
    import jax.numpy as jnp

    from mint_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    pipeline = load_pipeline_config(FLAGS.config_path)
    model = builder.build(
        pipeline.multi_modal_model, is_training=True,
        compute_dtype=jnp.bfloat16 if FLAGS.use_bfloat16 else jnp.float32)
    metrics = []  # reference FACT.get_metrics returns [] (fact_model.py:138)

    # Factory: a fresh single-pass dataset per checkpoint evaluation
    # (the reference re-iterates its tf.data.Dataset each eval).
    def dataset():
        return data_pipeline.create_input(
            pipeline.eval_config, pipeline.eval_dataset, is_training=False,
            use_tpu=False)

    import jax
    mesh = None
    n_dev = FLAGS.data_parallelism or len(jax.devices())
    if n_dev > 1:
        from mint_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.make_mesh(data=n_dev, model=1,
                                  devices=jax.devices()[:n_dev])
    evaluator = Evaluator(model, dataset, metrics=metrics,
                          output_dir=FLAGS.output_dir, steps=FLAGS.steps,
                          steps_bucket=FLAGS.steps_bucket or None,
                          decode_batch=FLAGS.decode_batch or None,
                          mesh=mesh,
                          cache_examples=not FLAGS.reload_dataset_per_pass)

    # Abstract template only: every eval pass restores real params from a
    # checkpoint (a params-only partial restore against this skeleton —
    # checkpoint.py::restore_params), so materializing a random
    # 120M-param init here would be pure discarded work.
    params = abstract_params(model)
    state = TrainState(step=0, params=params, opt_state=None)
    manager = CheckpointManager(FLAGS.model_dir, max_to_keep=5)
    controller = Controller(
        evaluator=_EvalAdapter(evaluator), state=state,
        checkpoint_manager=manager,
        summary_dir=os.path.join(FLAGS.model_dir, FLAGS.eval_prefix))
    controller.evaluate_continuously(timeout=FLAGS.timeout)


def main(_):
    flags.mark_flag_as_required("config_path")
    flags.mark_flag_as_required("model_dir")
    evaluate()


def cli():
    """Console entry point (pyproject [project.scripts])."""
    app.run(main)


if __name__ == "__main__":
    app.run(main)
