"""Data-path tests: TFRecord framing, Example wire format (validated against
TensorFlow's own encoders when available), FACT windowing parity, batching.
"""

import copy
import os

import numpy as np
import pytest

from mint_tpu.config import load_pipeline_config
from mint_tpu.data import (
    TFRecordWriter,
    create_input,
    crc32c,
    decode_example,
    encode_example,
    fact_preprocessing,
    get_modality_to_param_dict,
    parse_example,
    read_records,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = os.path.join(REPO, "configs", "fact_v5_deeper_t10_cm12.config")


def test_crc32c_known_vectors():
    # Standard CRC-32C test vectors.
    assert crc32c(b"") == 0x0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"a") == 0xC1D04330


def test_tfrecord_roundtrip(tmp_path):
    path = str(tmp_path / "test.tfrecord")
    records = [b"hello", b"", b"x" * 1000]
    with TFRecordWriter(path) as w:
        for r in records:
            w.write(r)
    got = list(read_records(path, verify_crc=True))
    assert got == records


def test_tfrecord_tf_compat(tmp_path):
    """Files we write must be readable by TensorFlow and vice versa."""
    tf = pytest.importorskip("tensorflow")
    ours = str(tmp_path / "ours.tfrecord")
    with TFRecordWriter(ours) as w:
        w.write(b"payload-1")
        w.write(b"payload-2")
    got = [bytes(r.numpy()) for r in tf.data.TFRecordDataset(ours)]
    assert got == [b"payload-1", b"payload-2"]

    theirs = str(tmp_path / "theirs.tfrecord")
    with tf.io.TFRecordWriter(theirs) as w:
        w.write(b"tf-payload")
    assert list(read_records(theirs, verify_crc=True)) == [b"tf-payload"]


def test_example_roundtrip():
    feats = {
        "motion_sequence": np.arange(12, dtype=np.float32).reshape(4, 3),
        "motion_sequence_shape": np.array([4, 3], dtype=np.int64),
        "motion_name": [b"seq_001"],
        "neg_ints": np.array([-1, -2, 3], dtype=np.int64),
    }
    data = encode_example(feats)
    out = decode_example(data)
    np.testing.assert_allclose(out["motion_sequence"],
                               feats["motion_sequence"].ravel())
    np.testing.assert_array_equal(out["motion_sequence_shape"], [4, 3])
    assert out["motion_name"] == [b"seq_001"]
    np.testing.assert_array_equal(out["neg_ints"], [-1, -2, 3])


def test_example_tf_compat():
    """Our wire format must parse TF-encoded Examples and vice versa."""
    tf = pytest.importorskip("tensorflow")
    motion = np.random.RandomState(0).randn(5, 7).astype(np.float32)
    tf_example = tf.train.Example(features=tf.train.Features(feature={
        "motion_sequence": tf.train.Feature(
            float_list=tf.train.FloatList(value=motion.flatten())),
        "motion_sequence_shape": tf.train.Feature(
            int64_list=tf.train.Int64List(value=motion.shape)),
        "motion_name": tf.train.Feature(
            bytes_list=tf.train.BytesList(value=[b"name_x"])),
    }))
    decoded = decode_example(tf_example.SerializeToString())
    np.testing.assert_allclose(decoded["motion_sequence"], motion.ravel(),
                               rtol=1e-6)
    np.testing.assert_array_equal(decoded["motion_sequence_shape"], [5, 7])
    assert decoded["motion_name"] == [b"name_x"]

    ours = encode_example({
        "motion_sequence": motion,
        "motion_sequence_shape": np.asarray(motion.shape, np.int64),
        "motion_name": [b"name_x"],
    })
    parsed = tf.io.parse_single_example(ours, {
        "motion_sequence": tf.io.VarLenFeature(tf.float32),
        "motion_sequence_shape": tf.io.FixedLenFeature([2], tf.int64),
        "motion_name": tf.io.FixedLenFeature([], tf.string),
    })
    np.testing.assert_allclose(
        tf.sparse.to_dense(parsed["motion_sequence"]).numpy(),
        motion.ravel(), rtol=1e-6)
    assert parsed["motion_name"].numpy() == b"name_x"


def _modality_params():
    pipeline = load_pipeline_config(CONFIG)
    return get_modality_to_param_dict(pipeline.train_dataset)


def test_modality_param_dict():
    """inputs_util_test.py:22-49: seconds x rate -> frames."""
    params = _modality_params()
    assert params["motion"]["input_length"] == 120
    assert params["motion"]["target_length"] == 20
    assert params["motion"]["target_shift"] == 120
    assert params["audio"]["input_length"] == 240
    assert params["motion"]["feature_dim"] == 219
    assert params["audio"]["feature_dim"] == 35


def _fake_sequence(t_motion=300, t_audio=600):
    rng = np.random.RandomState(0)
    return {
        "motion_sequence": rng.randn(t_motion, 219).astype(np.float32),
        "audio_sequence": rng.randn(t_audio, 35).astype(np.float32),
        "motion_name": "gBR_sBM_c01",
        "audio_name": "mBR0",
    }


def test_fact_preprocessing_train():
    params = _modality_params()
    ex = _fake_sequence()
    rng = np.random.default_rng(0)
    out = fact_preprocessing(ex, params, is_training=True, rng=rng)
    assert out["motion_input"].shape == (120, 225)
    assert out["target"].shape == (20, 225)
    assert out["audio_input"].shape == (240, 35)
    # 6 leading zero-pad columns on motion.
    assert np.all(out["motion_input"][:, :6] == 0)
    # Window alignment: target starts target_shift frames after input start.
    motion_padded = np.pad(ex["motion_sequence"], [[0, 0], [6, 0]])
    starts = np.where(
        (motion_padded == out["motion_input"][0]).all(axis=1))[0]
    assert len(starts) >= 1
    s = starts[0]
    np.testing.assert_array_equal(out["target"],
                                  motion_padded[s + 120:s + 140])
    np.testing.assert_array_equal(out["audio_input"],
                                  ex["audio_sequence"][s:s + 240])


def test_fact_preprocessing_eval_keeps_full_audio():
    params = _modality_params()
    ex = _fake_sequence()
    out = fact_preprocessing(ex, params, is_training=False,
                             rng=np.random.default_rng(0))
    assert out["motion_input"].shape == (120, 225)
    assert out["audio_input"].shape == (600, 35)  # full length
    assert "target" not in out
    np.testing.assert_array_equal(
        out["motion_input"][:, 6:], ex["motion_sequence"][:120])


def test_create_input_end_to_end(tmp_path):
    """Write shards, read them back through the full pipeline."""
    import dataclasses
    pipeline = load_pipeline_config(CONFIG)
    ds_cfg = copy.deepcopy(pipeline.train_dataset)
    ds_cfg.data_files = str(tmp_path / "shard-*")

    for shard in range(2):
        with TFRecordWriter(str(tmp_path / f"shard-{shard}")) as w:
            for i in range(6):
                ex = _fake_sequence()
                w.write(encode_example({
                    "motion_sequence": ex["motion_sequence"],
                    "motion_sequence_shape":
                        np.asarray(ex["motion_sequence"].shape, np.int64),
                    "motion_name": [ex["motion_name"].encode()],
                    "audio_sequence": ex["audio_sequence"],
                    "audio_sequence_shape":
                        np.asarray(ex["audio_sequence"].shape, np.int64),
                    "audio_name": [ex["audio_name"].encode()],
                }))

    tc = copy.deepcopy(pipeline.train_config)
    tc.batch_size = 4
    it = create_input(tc, ds_cfg, is_training=True, seed=0, prefetch=False)
    batch = next(iter(it))
    assert batch["motion_input"].shape == (4, 120, 225)
    assert batch["target"].shape == (4, 20, 225)
    assert batch["audio_input"].shape == (4, 240, 35)

    # Eval: single pass, full audio, batch 1 keeps remainder.
    ec = copy.deepcopy(pipeline.eval_config)
    eval_batches = list(create_input(ec, ds_cfg, is_training=False,
                                     use_tpu=False, prefetch=False))
    assert len(eval_batches) == 12
    assert eval_batches[0]["audio_input"].shape == (1, 600, 35)


def test_create_input_deterministic_with_seed(tmp_path):
    """Same seed -> identical batch stream (input-pipeline determinism)."""
    import dataclasses
    pipeline = load_pipeline_config(CONFIG)
    ds_cfg = copy.deepcopy(pipeline.train_dataset)
    ds_cfg.data_files = str(tmp_path / "det-*")
    with TFRecordWriter(str(tmp_path / "det-0")) as w:
        for i in range(5):
            ex = _fake_sequence()
            w.write(encode_example({
                "motion_sequence": ex["motion_sequence"],
                "motion_sequence_shape":
                    np.asarray(ex["motion_sequence"].shape, np.int64),
                "motion_name": [ex["motion_name"].encode()],
                "audio_sequence": ex["audio_sequence"],
                "audio_sequence_shape":
                    np.asarray(ex["audio_sequence"].shape, np.int64),
                "audio_name": [ex["audio_name"].encode()],
            }))
    tc = copy.deepcopy(pipeline.train_config)
    tc.batch_size = 2
    def first_batches(seed):
        it = create_input(tc, ds_cfg, is_training=True, seed=seed,
                          prefetch=False)
        return [next(it) for _ in range(3)]
    a = first_batches(7)
    b = first_batches(7)
    c = first_batches(8)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["motion_input"], y["motion_input"])
        np.testing.assert_array_equal(x["target"], y["target"])
    assert any(not np.array_equal(x["motion_input"], y["motion_input"])
               for x, y in zip(a, c))


def test_prefetcher_propagates_producer_errors():
    from mint_tpu.data.pipeline import _Prefetcher

    def boom():
        yield {"a": 1}
        raise IOError("corrupt record")

    it = _Prefetcher(boom())
    assert next(it) == {"a": 1}
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="producer failed"):
        next(it)


def test_batch_rejects_ragged_features():
    from mint_tpu.data.pipeline import _batch
    import pytest as _pytest
    with _pytest.raises(ValueError, match="ragged"):
        _batch([{"audio_input": np.zeros((5, 3))},
                {"audio_input": np.zeros((7, 3))}])


def test_training_stream_drops_short_sequences(tmp_path):
    """An example too short for one window is DROPPED from the training
    stream (with a warning), matching the native loader and
    DeviceDataset.from_files — it used to raise and kill the whole
    pipeline on corpora the other two backends train on."""
    import copy as _copy
    pipeline = load_pipeline_config(CONFIG)
    ds_cfg = _copy.deepcopy(pipeline.train_dataset)
    ds_cfg.data_files = str(tmp_path / "shard-*")

    with TFRecordWriter(str(tmp_path / "shard-0")) as w:
        for t_motion, t_audio in ((100, 100), (300, 600), (300, 600)):
            ex = _fake_sequence(t_motion=t_motion, t_audio=t_audio)
            w.write(encode_example({
                "motion_sequence": ex["motion_sequence"],
                "motion_sequence_shape":
                    np.asarray(ex["motion_sequence"].shape, np.int64),
                "motion_name": [ex["motion_name"].encode()],
                "audio_sequence": ex["audio_sequence"],
                "audio_sequence_shape":
                    np.asarray(ex["audio_sequence"].shape, np.int64),
                "audio_name": [ex["audio_name"].encode()],
            }))

    tc = _copy.deepcopy(pipeline.train_config)
    tc.batch_size = 2
    it = create_input(tc, ds_cfg, is_training=True, seed=0, prefetch=False)
    batch = next(iter(it))  # must not raise
    assert batch["motion_input"].shape == (2, 120, 225)


def test_training_audio_tail_zero_padded():
    """Audio shorter than motion: the window's audio tail is zero-padded
    to audio_input_length, exactly like the native loader
    (mint_loader.cc MakeWindow) — a short row used to crash batching."""
    from mint_tpu.data.pipeline import fact_preprocessing

    params = _modality_params()
    # motion 300, audio 295: window 240 -> starts up to 60; start > 55
    # leaves a short audio tail.
    ex = _fake_sequence(t_motion=300, t_audio=295)
    rng = np.random.default_rng(0)
    padded_seen = False
    for _ in range(50):
        out = fact_preprocessing(dict(ex), params, is_training=True,
                                 rng=rng)
        assert out["audio_input"].shape == (240, 35)
        tail = out["audio_input"][-1]
        if np.all(tail == 0):
            padded_seen = True
    assert padded_seen  # at least one sampled window needed the pad


def test_training_stream_drops_audio_shorter_than_window(tmp_path):
    """Audio shorter than the WINDOW drops the example (native-loader
    parity: mint_loader.cc line 'ex.t_audio < window')."""
    from mint_tpu.data.pipeline import SequenceTooShort, fact_preprocessing

    params = _modality_params()
    ex = _fake_sequence(t_motion=300, t_audio=100)  # 100 < window 240
    import pytest as _pytest
    with _pytest.raises(SequenceTooShort):
        fact_preprocessing(dict(ex), params, is_training=True,
                           rng=np.random.default_rng(0))


def test_prefetcher_close_unblocks_producer():
    """close() must stop a producer parked on a full queue and close the
    upstream generator — abandoning an eval pass used to leave the
    thread blocked forever holding shard file handles."""
    from mint_tpu.data.pipeline import _Prefetcher
    import threading as _threading

    released = []

    def producer():
        try:
            i = 0
            while True:
                yield {"i": i}
                i += 1
        finally:
            released.append(True)  # generator .close() reached us

    it = _Prefetcher(producer(), depth=2)
    assert next(it)["i"] == 0
    it.close()
    assert released == [True]
    # The producer thread exits promptly.
    assert not it._thread.is_alive() or (
        it._thread.join(timeout=5) or not it._thread.is_alive())
    # A straggling consumer stops instead of hanging.
    import pytest as _pytest
    with _pytest.raises(StopIteration):
        while True:
            next(it)


def test_prefetcher_close_skips_generator_close_while_executing():
    # close() must not call the upstream generator's close() while the
    # producer thread is still executing inside it (ValueError:
    # "generator already executing"); it leaks the daemon thread
    # instead, like DevicePrefetcher.
    import threading
    from mint_tpu.data.pipeline import _Prefetcher

    release = threading.Event()

    def wedged():
        yield {"x": 1}
        release.wait(30)  # producer stuck inside the generator
        yield {"x": 2}

    it = _Prefetcher(wedged(), depth=1)
    next(it)
    it.close()  # join(5) times out; must NOT raise ValueError
    release.set()
