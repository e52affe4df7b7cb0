"""Device-resident dataset: window integrity, sampling distribution,
fused sampled training loop equivalence, resume determinism."""

import copy
import os

import jax
import jax.numpy as jnp
import numpy as np

from mint_tpu.config import load_pipeline_config
from mint_tpu.data.device_dataset import DeviceDataset
from mint_tpu.data.example import encode_example
from mint_tpu.data.tfrecord import TFRecordWriter
from mint_tpu.models import build, init_params
from mint_tpu.parallel import make_mesh
from mint_tpu.train import Controller, Trainer, schedules

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = os.path.join(REPO, "configs", "fact_v5_deeper_t10_cm12.config")


def small_dataset_config(input_sec=8.0, target_sec=2.0, shift_sec=8.0):
    """Flagship dataset config shrunk: motion rate 1, audio rate 2 (like
    the shipped config) -> motion_in 8, target 2, shift 8, audio_in 16."""
    ds = copy.deepcopy(load_pipeline_config(CONFIG).train_dataset)
    ds.input_length_sec = input_sec
    ds.target_length_sec = target_sec
    ds.target_shift_sec = shift_sec
    return ds


def write_corpus(tmp_path, lengths=(40, 25, 60), audio_extra=0):
    """Sequences whose content encodes (sequence, time, channel) so any
    sampled window can be traced back to its source rows exactly."""
    path = str(tmp_path / "corpus-0")
    with TFRecordWriter(path) as w:
        for s, t in enumerate(lengths):
            motion = (1000.0 * s
                      + np.arange(t)[:, None]
                      + 0.001 * np.arange(219)[None, :]).astype(np.float32)
            ta = t + audio_extra
            audio = (-1000.0 * s
                     - np.arange(ta)[:, None]
                     - 0.001 * np.arange(35)[None, :]).astype(np.float32)
            w.write(encode_example({
                "motion_sequence": motion.ravel(),
                "motion_sequence_shape": np.asarray(motion.shape, np.int64),
                "motion_name": [f"m{s}".encode()],
                "audio_sequence": audio.ravel(),
                "audio_sequence_shape": np.asarray(audio.shape, np.int64),
                "audio_name": [f"a{s}".encode()],
            }))
    return [path]


def test_sampled_windows_match_source(tmp_path):
    files = write_corpus(tmp_path, lengths=(40, 25, 60))
    ds_cfg = small_dataset_config()
    dset = DeviceDataset.from_files(files, ds_cfg, batch_size=16,
                                    mesh=make_mesh(8, 1))
    # window = max(8, 8+2, 16) = 16; all three sequences usable.
    assert dset.n_sequences == 3
    batch = jax.jit(dset.sample)(dset.arrays, jax.random.PRNGKey(0))
    motion = np.asarray(batch["motion_input"])
    target = np.asarray(batch["target"])
    audio = np.asarray(batch["audio_input"])
    assert motion.shape == (16, 8, 225)
    assert target.shape == (16, 2, 225)
    assert audio.shape == (16, 16, 35)
    for b in range(16):
        # Decode (sequence, start) from the motion content; cols 0-5 are
        # the 219->225 zero pad, col 6 is raw channel 0.
        val = motion[b, 0, 6]
        seq, start = int(val) // 1000, int(val) % 1000
        t_len = (40, 25, 60)[seq]
        assert 0 <= start <= t_len - 16
        np.testing.assert_array_equal(motion[b, :, :6], 0.0)
        # Motion rows are consecutive source rows from that window.
        np.testing.assert_allclose(
            motion[b, :, 6], 1000.0 * seq + start + np.arange(8), rtol=1e-6)
        # Target = rows [start+shift, start+shift+target) of the SAME seq.
        np.testing.assert_allclose(
            target[b, :, 6], 1000.0 * seq + start + 8 + np.arange(2),
            rtol=1e-6)
        # Audio rows come from the same window start of the same seq.
        np.testing.assert_allclose(
            audio[b, :, 0], -1000.0 * seq - (start + np.arange(16)),
            rtol=1e-6)


def test_short_sequences_dropped(tmp_path):
    files = write_corpus(tmp_path, lengths=(40, 10, 60))  # 10 < window 16
    dset = DeviceDataset.from_files(files, small_dataset_config(),
                                    batch_size=4, mesh=make_mesh(8, 1))
    assert dset.n_sequences == 2
    batch = jax.jit(dset.sample)(dset.arrays, jax.random.PRNGKey(1))
    # No sampled window may touch the dropped sequence (seq id 1).
    seqs = (np.asarray(batch["motion_input"])[:, 0, 6] // 1000).astype(int)
    assert set(seqs.tolist()) <= {0, 2}


def test_window_starts_cover_range(tmp_path):
    """Every valid start of a sequence is reachable, none beyond."""
    files = write_corpus(tmp_path, lengths=(20,))
    dset = DeviceDataset.from_files(files, small_dataset_config(),
                                    batch_size=64, mesh=make_mesh(8, 1))
    starts = set()
    sample = jax.jit(dset.sample)
    for i in range(40):
        batch = sample(dset.arrays, jax.random.PRNGKey(i))
        vals = np.asarray(batch["motion_input"])[:, 0, 6]
        starts.update(int(v) % 1000 for v in vals)
    assert starts == set(range(5))  # 20 - 16 + 1 valid starts


def test_sharded_stores_sample_valid_windows(tmp_path):
    """shard_over_data: every device samples only from its local shard,
    windows still trace back to exact source rows, memory is ~1/d."""
    lengths = tuple(20 + 3 * i for i in range(10))  # 10 seqs over 8 shards
    files = write_corpus(tmp_path, lengths=lengths)
    mesh = make_mesh(8, 1)
    repl = DeviceDataset.from_files(files, small_dataset_config(),
                                    batch_size=16, mesh=mesh)
    dset = DeviceDataset.from_files(files, small_dataset_config(),
                                    batch_size=16, mesh=mesh,
                                    shard_over_data=True)
    assert dset.shard_over_data
    # Each device's store block is far smaller than the replicated one.
    local = dset.arrays["motion"].addressable_shards[0].data
    assert local.shape[0] * 8 == dset.arrays["motion"].shape[0]

    sample = jax.jit(dset.sample)
    seen_seqs = set()
    for i in range(30):
        batch = sample(dset.arrays, jax.random.PRNGKey(i))
        motion = np.asarray(batch["motion_input"])
        target = np.asarray(batch["target"])
        audio = np.asarray(batch["audio_input"])
        assert motion.shape == (16, 8, 225)
        for b in range(16):
            val = motion[b, 0, 6]
            seq, start = int(val) // 1000, int(val) % 1000
            t_len = lengths[seq]
            seen_seqs.add(seq)
            assert 0 <= start <= t_len - 16, (seq, start)
            np.testing.assert_allclose(
                motion[b, :, 6], 1000.0 * seq + start + np.arange(8),
                rtol=1e-6)
            np.testing.assert_allclose(
                target[b, :, 6], 1000.0 * seq + start + 8 + np.arange(2),
                rtol=1e-6)
            np.testing.assert_allclose(
                audio[b, :, 0], -1000.0 * seq - (start + np.arange(16)),
                rtol=1e-6)
    assert seen_seqs == set(range(10))  # all sequences reachable

    # No store-sized collective: the compiled program must not all-gather
    # the sharded stores (the failure mode of naive sharding).
    txt = sample.lower(dset.arrays, jax.random.PRNGKey(0)) \
                .compile().as_text()
    assert "all-gather" not in txt, "sharded store was gathered"
    del repl


def test_sharded_training_runs_and_converges(tmp_path):
    files = write_corpus(tmp_path, lengths=(40, 60, 32, 48, 56, 36, 44,
                                            52, 28, 64))
    dset = DeviceDataset.from_files(files, small_dataset_config(),
                                    batch_size=16, mesh=make_mesh(4, 2),
                                    shard_over_data=True)
    model = _tiny_model()
    params = init_params(model, jax.random.PRNGKey(0))
    trainer = Trainer(model, schedules.constant(1e-3), mesh=dset.mesh)
    state = trainer.init_state(params)
    losses = []
    for start in range(0, 30, 10):
        state, metrics = trainer.train_steps_sampled(state, dset, loop=10)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 30
    assert losses[-1] < losses[0] / 2, losses


def _tiny_model():
    cfg = copy.deepcopy(load_pipeline_config(CONFIG).multi_modal_model)
    fact = cfg.fact_model
    for mod in fact.modality:
        tf = mod.model[0].transformer
        tf.hidden_size = 32
        tf.num_hidden_layers = 1
        tf.num_attention_heads = 2
        tf.intermediate_size = 64
    fact.modality_by_name("motion").sequence_length = 8
    fact.modality_by_name("motion").feature_dim = 225
    fact.modality_by_name("audio").sequence_length = 16
    cm = fact.cross_modal_model.transformer
    cm.hidden_size = 32
    cm.num_hidden_layers = 1
    cm.num_attention_heads = 2
    cm.intermediate_size = 64
    return build(cfg, is_training=True)


def test_fused_sampled_loop_matches_manual_steps(tmp_path):
    """train_steps_sampled must equal per-step train_step calls fed the
    SAME on-device-sampled batches (key schedule fold_in(seed, step))."""
    files = write_corpus(tmp_path, lengths=(40, 60))
    dset = DeviceDataset.from_files(files, small_dataset_config(),
                                    batch_size=8, mesh=make_mesh(8, 1))
    model = _tiny_model()
    params = init_params(model, jax.random.PRNGKey(0))

    trainer_a = Trainer(model, schedules.constant(1e-3), mesh=dset.mesh)
    state_a = trainer_a.init_state(params)
    base = jax.random.PRNGKey(5)
    sample = jax.jit(dset.sample)
    for step in range(6):
        batch = sample(dset.arrays, jax.random.fold_in(base, step))
        state_a, metrics_a = trainer_a.train_step(state_a, batch)

    trainer_b = Trainer(model, schedules.constant(1e-3), mesh=dset.mesh)
    state_b = trainer_b.init_state(params)
    state_b, metrics_b = trainer_b.train_steps_sampled(state_b, dset,
                                                       loop=6, seed=5)
    assert int(state_b.step) == 6
    np.testing.assert_allclose(float(metrics_b["loss"]),
                               float(metrics_a["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)


def test_sampled_resume_draws_same_windows(tmp_path):
    """Keys bind to ABSOLUTE steps: 3+3 resumed == 6 uninterrupted."""
    files = write_corpus(tmp_path, lengths=(40, 60))
    dset = DeviceDataset.from_files(files, small_dataset_config(),
                                    batch_size=8, mesh=make_mesh(8, 1))
    model = _tiny_model()
    params = init_params(model, jax.random.PRNGKey(0))

    t1 = Trainer(model, schedules.constant(1e-3), mesh=dset.mesh)
    s1 = t1.init_state(params)
    s1, _ = t1.train_steps_sampled(s1, dset, loop=6, seed=9)

    t2 = Trainer(model, schedules.constant(1e-3), mesh=dset.mesh)
    s2 = t2.init_state(params)
    s2, _ = t2.train_steps_sampled(s2, dset, loop=3, seed=9)
    s2, _ = t2.train_steps_sampled(s2, dset, loop=3, seed=9)

    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


def test_retired_dataset_is_garbage_collected(tmp_path):
    """The trainer's compiled-loop cache must not pin a retired
    DeviceDataset (its HBM stores are multi-GB at production scale).
    Regression: closing over the BOUND method dataset.sample made the
    weak-keyed cache entry's value reference its own key — immortal."""
    import gc
    import weakref

    files = write_corpus(tmp_path, lengths=(40, 60))
    dset = DeviceDataset.from_files(files, small_dataset_config(),
                                    batch_size=8, mesh=make_mesh(8, 1))
    model = _tiny_model()
    params = init_params(model, jax.random.PRNGKey(0))
    trainer = Trainer(model, schedules.constant(1e-3), mesh=dset.mesh)
    state = trainer.init_state(params)
    state, _ = trainer.train_steps_sampled(state, dset, loop=2)

    ref = weakref.ref(dset)
    del dset
    gc.collect()
    assert ref() is None, "trainer cache still pins the retired dataset"


def test_controller_with_sampler_trains_and_checkpoints(tmp_path):
    from mint_tpu.train import CheckpointManager

    files = write_corpus(tmp_path, lengths=(40, 60))
    dset = DeviceDataset.from_files(files, small_dataset_config(),
                                    batch_size=8, mesh=make_mesh(8, 1))
    model = _tiny_model()
    params = init_params(model, jax.random.PRNGKey(0))
    trainer = Trainer(model, schedules.constant(1e-3), mesh=dset.mesh)
    state = trainer.init_state(params)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_interval_steps=10,
                            max_to_keep=3)
    ctl = Controller(trainer=trainer, state=state, steps_per_loop=5,
                     checkpoint_manager=mgr,
                     summary_dir=str(tmp_path / "s"), summary_interval=5,
                     train_sampler=dset)
    metrics = ctl.train(15)
    assert ctl.global_step == 15
    assert np.isfinite(metrics["loss"])
    ctl.close()


def test_direct_construction_validation():
    """Direct constructions must fail loudly on inconsistent tables —
    a bad counts/offsets entry makes the on-device sampler silently
    read windows straddling sequence boundaries (dynamic_slice clamps,
    so there is no runtime error to catch)."""
    import pytest

    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    # Two sequences of 30 rows each; spans: motion max(8, 8+2)=10,
    # audio 16 -> span 16 -> max valid counts = 30 - 16 + 1 = 15.
    motion = np.zeros((60, 225), np.float32)
    audio = np.zeros((60, 35), np.float32)
    offsets = np.array([0, 30])

    def build_ds(counts, offs=offsets, audio_arr=audio):
        return DeviceDataset(motion, audio_arr, offs, np.asarray(counts),
                             motion_input_len=8, target_len=2,
                             target_shift=8, audio_input_len=16,
                             batch_size=4, mesh=mesh)

    build_ds([15, 15])  # exactly full: valid

    with pytest.raises(ValueError, match="counts entry must be >= 1"):
        build_ds([0, 15])
    with pytest.raises(ValueError, match="sorted"):
        build_ds([15, 15], offs=np.array([30, 0]))
    with pytest.raises(ValueError, match="exceeds"):
        build_ds([16, 15])  # window 15..31 straddles sequence 1
    with pytest.raises(ValueError, match="exceeds"):
        build_ds([15, 16])  # window past the corpus tail
    with pytest.raises(ValueError, match="row-aligned"):
        build_ds([15, 15], audio_arr=np.zeros((59, 35), np.float32))
