"""Training CLI (reference trainer.py).

Builds the FACT model and a DP(xTP)-sharded jit train step over the device
mesh, with the reference's controller semantics: steps_per_loop=10,
checkpoint every 1000 steps (keep 5), summaries every 10 steps, and the
flag surface of the reference (config_path/model_dir/steps/
initial_learning_rate/warmup_steps/grad_clip_norm).  The reference's
``train_strategy`` TPU/GPU switch is replaced by the mesh shape flags —
data parallelism spans whatever devices JAX sees.
"""

from __future__ import annotations

import os

from absl import app, flags, logging

import jax

from mint_tpu.config.schema import load_pipeline_config
from mint_tpu.data import pipeline as data_pipeline
from mint_tpu.models import builder
from mint_tpu.models.fact import init_params
from mint_tpu.parallel import mesh as mesh_lib
from mint_tpu.train import schedules
from mint_tpu.train.checkpoint import CheckpointManager
from mint_tpu.train.controller import Controller
from mint_tpu.train.trainer import Trainer

FLAGS = flags.FLAGS
flags.DEFINE_string("config_path", None, "Path to the config file.")
flags.DEFINE_string("model_dir", None,
                    "Directory to write training checkpoints and logs")
flags.DEFINE_float("initial_learning_rate", 0.1,
                   "Initial learning rate for cosine decay schedule")
flags.DEFINE_integer("steps", 2400000, "Number of training steps")
flags.DEFINE_integer("warmup_steps", 1000,
                     "Number of learning rate warmup steps")
flags.DEFINE_float("grad_clip_norm", 0.0, "Clip gradients by norm.")
flags.DEFINE_integer("data_parallelism", 0,
                     "Data-parallel mesh axis (0 = all devices / tp).")
flags.DEFINE_integer("tensor_parallelism", 1, "Tensor-parallel mesh axis.")
flags.DEFINE_integer("steps_per_loop", 10, "Steps per controller loop.")
flags.DEFINE_integer("checkpoint_interval", 1000,
                     "Steps between checkpoints.")
flags.DEFINE_integer("summary_interval", 10, "Steps between summaries.")
flags.DEFINE_bool("use_bfloat16", False,
                  "Run forward/backward compute in bfloat16.")
flags.DEFINE_integer("loop_unroll", 1,
                     "lax.scan unroll for the fused train loop (XLA "
                     "schedules across step boundaries; measured neutral "
                     "at FACT shapes, knob kept for other models).")
flags.DEFINE_integer("accumulate_steps", 1,
                     "Micro-batches to average per optimizer update "
                     "(gradient accumulation).")
flags.DEFINE_enum("input_backend", "auto",
                  ["auto", "native", "python", "device"],
                  "Training input pipeline: the C++ reader thread "
                  "(native/mint_loader.cc), the NumPy pipeline, or "
                  "'device' — decode the whole corpus into HBM once and "
                  "sample windows ON-device inside the fused train scan "
                  "(zero per-step host->device input traffic; i.i.d. "
                  "window sampling instead of epoch shuffling, see "
                  "data/device_dataset.py).")
flags.DEFINE_bool("shard_corpus", False,
                  "With --input_backend=device: shard the resident "
                  "corpus over the mesh's data axis (per-device HBM = "
                  "corpus/d; each device samples its local shard inside "
                  "shard_map, no collectives).  Up to d-1 sequences get "
                  "one extra draw slot from round-robin padding.")


def _make_input(train_config, dataset_config):
    """Training batches: native C++ loader when available, else Python.

    Multi-host: the config's ``batch_size`` is the GLOBAL batch (the
    reference's distribute-strategy semantics); each host loads
    batch_size / process_count examples with a per-process shuffle seed,
    and ``Trainer.shard_batch`` assembles the global array.
    """
    nproc = jax.process_count()
    if train_config.batch_size % nproc:
        raise ValueError(
            f"global batch_size {train_config.batch_size} is not divisible "
            f"by process_count {nproc}")
    local_batch = train_config.batch_size // nproc
    seed = 1000003 * jax.process_index()  # decorrelate host shuffles
    backend = FLAGS.input_backend
    if backend in ("auto", "native"):
        from mint_tpu.data import native_loader, tfrecord
        if native_loader.available():
            params = data_pipeline.get_modality_to_param_dict(
                dataset_config)
            files = tfrecord.glob(dataset_config.data_files)
            if not files:
                raise FileNotFoundError(
                    f"no input files match "
                    f"{dataset_config.data_files!r}")
            logging.info("using native input loader (%d shards)",
                         len(files))
            return native_loader.NativeTrainLoader(
                files, batch_size=local_batch,
                motion_input_len=params["motion"]["input_length"],
                target_len=params["motion"]["target_length"],
                target_shift=params["motion"]["target_shift"],
                audio_input_len=params["audio"]["input_length"],
                motion_dim_raw=params["motion"]["feature_dim"],
                audio_dim=params["audio"]["feature_dim"],
                seed=seed)
        if backend == "native":
            raise RuntimeError(
                f"native loader unavailable: {native_loader.build_error()}")
        logging.warning("native loader unavailable (%s); Python pipeline",
                        native_loader.build_error())
    return data_pipeline.create_input(train_config, dataset_config,
                                      is_training=True,
                                      seed=seed if nproc > 1 else None,
                                      batch_size_override=(
                                          local_batch if nproc > 1 else None))


flags.DEFINE_bool("distributed", False,
                  "Multi-host: call jax.distributed.initialize() so the "
                  "mesh spans all hosts (DCN between hosts, ICI within; "
                  "the reference's TPUClusterResolver equivalent).")
flags.DEFINE_string("coordinator_address", None,
                    "host:port of process 0 for --distributed; None = "
                    "auto-detect from the cluster environment (TPU pods, "
                    "SLURM, ...).")
flags.DEFINE_integer("num_processes", None,
                     "Process count for --distributed manual bring-up.")
flags.DEFINE_integer("process_id", None,
                     "This process's id for --distributed manual bring-up.")


def train():
    from mint_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    if FLAGS.distributed:
        jax.distributed.initialize(
            coordinator_address=FLAGS.coordinator_address,
            num_processes=FLAGS.num_processes,
            process_id=FLAGS.process_id)
    pipeline = load_pipeline_config(FLAGS.config_path)
    train_config = pipeline.train_config
    # Chief-only host-side outputs: in --distributed runs every process
    # shares the model_dir (that is what makes the collective checkpoint
    # work), so per-process writes of the config snapshot and the
    # metrics/TensorBoard streams would interleave appends from N hosts
    # into one metrics.jsonl and stack N identical curves.  Orbit/TF
    # likewise summarize only on the chief.  Checkpointing is NOT gated:
    # orbax saves are collective across processes.
    is_chief = jax.process_index() == 0
    # Snapshot the effective config into the model dir (reference
    # config_util.save_pipeline_config, config_util.py:75-89).
    if is_chief:
        from mint_tpu.config.serialize import save_pipeline_config
        save_pipeline_config(pipeline, FLAGS.model_dir)

    mesh = mesh_lib.make_mesh(
        data=FLAGS.data_parallelism or None,
        model=FLAGS.tensor_parallelism)
    logging.info("mesh: %s over %d devices", mesh.shape,
                 len(jax.devices()))

    import jax.numpy as jnp
    use_bf16 = FLAGS.use_bfloat16 or train_config.use_bfloat16
    model = builder.build(
        pipeline.multi_modal_model, is_training=True,
        compute_dtype=jnp.bfloat16 if use_bf16 else jnp.float32)
    schedule = schedules.from_config(
        train_config.learning_rate,
        initial_learning_rate=FLAGS.initial_learning_rate,
        warmup_steps=FLAGS.warmup_steps)
    trainer = Trainer(model, schedule,
                      grad_clip_norm=FLAGS.grad_clip_norm, mesh=mesh,
                      accumulate_steps=FLAGS.accumulate_steps,
                      loop_unroll=FLAGS.loop_unroll)
    params = init_params(model, jax.random.PRNGKey(0))
    state = trainer.init_state(params)

    sharded_iter = None
    train_sampler = None
    if FLAGS.input_backend == "device":
        # Whole corpus resident in HBM; windows sampled on-device inside
        # the fused train scan.  Every process decodes the full corpus
        # (replicated stores keep the program SPMD-consistent).
        from mint_tpu.data import tfrecord
        from mint_tpu.data.device_dataset import DeviceDataset
        files = tfrecord.glob(pipeline.train_dataset.data_files)
        if not files:
            raise FileNotFoundError(
                f"no input files match "
                f"{pipeline.train_dataset.data_files!r}")
        train_sampler = DeviceDataset.from_files(
            files, pipeline.train_dataset,
            batch_size=train_config.batch_size, mesh=mesh,
            shard_over_data=FLAGS.shard_corpus)
        logging.info(
            "device-resident dataset: %d sequences, %.1f MB in HBM",
            train_sampler.n_sequences, train_sampler.nbytes / 2**20)
    else:
        data_iter = _make_input(train_config, pipeline.train_dataset)
        # The loader runs in a background thread, two batches ahead
        # (mint_tpu/data/prefetch.py); the controller fuses each
        # steps_per_loop window into one lax.scan dispatch, so batches
        # stay on host until the (single) fused transfer.
        from mint_tpu.data.prefetch import DevicePrefetcher
        sharded_iter = DevicePrefetcher(data_iter, lambda b: b)

    manager = CheckpointManager(
        FLAGS.model_dir, save_interval_steps=FLAGS.checkpoint_interval,
        max_to_keep=5)
    controller = Controller(
        trainer=trainer, train_iter=sharded_iter, state=state,
        steps_per_loop=FLAGS.steps_per_loop,
        checkpoint_manager=manager,
        summary_dir=(os.path.join(FLAGS.model_dir, "train")
                     if is_chief else None),
        summary_interval=FLAGS.summary_interval,
        fuse_loop=True,
        train_sampler=train_sampler)

    # Reference runs a single step first to bring everything up, then the
    # rest (trainer.py:177-178); train() is ABSOLUTE (until global_step
    # reaches the target), so a preempted run resumes and stops at the
    # same budget.
    controller.train(1)
    controller.train(FLAGS.steps)
    controller.save_checkpoint()
    controller.close()
    if sharded_iter is not None:
        sharded_iter.close()


def main(_):
    flags.mark_flag_as_required("config_path")
    flags.mark_flag_as_required("model_dir")
    train()


def cli():
    """Console entry point (pyproject [project.scripts])."""
    app.run(main)


if __name__ == "__main__":
    app.run(main)
