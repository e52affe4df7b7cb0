"""Native C++ data loader tests: CRC parity, windowing contract, shapes."""

import os

import numpy as np
import pytest

from mint_tpu.data import native_loader, tfrecord
from mint_tpu.data.example import encode_example
from mint_tpu.data.tfrecord import TFRecordWriter

pytestmark = pytest.mark.skipif(
    not native_loader.available(),
    reason=f"native loader unavailable: {native_loader.build_error()}")

RNG = np.random.default_rng(21)


def _write_shards(tmp_path, n_shards=2, per_shard=5, t_motion=40,
                  t_audio=60):
    files = []
    for shard in range(n_shards):
        path = str(tmp_path / f"shard-{shard}")
        files.append(path)
        with TFRecordWriter(path) as w:
            for i in range(per_shard):
                motion = RNG.standard_normal(
                    (t_motion, 219)).astype(np.float32)
                audio = RNG.standard_normal(
                    (t_audio, 35)).astype(np.float32)
                w.write(encode_example({
                    "motion_sequence": motion.ravel(),
                    "motion_sequence_shape":
                        np.asarray(motion.shape, np.int64),
                    "motion_name": [f"m{shard}_{i}".encode()],
                    "audio_sequence": audio.ravel(),
                    "audio_sequence_shape":
                        np.asarray(audio.shape, np.int64),
                    "audio_name": [f"a{shard}_{i}".encode()],
                }))
    return files


def test_crc_parity_with_python():
    for size in (0, 1, 7, 64, 1000):
        data = bytes(RNG.integers(0, 256, size, dtype=np.uint8))
        assert (native_loader.masked_crc32c(data)
                == tfrecord.masked_crc32c(data))


def test_batch_shapes_and_padding(tmp_path):
    files = _write_shards(tmp_path)
    ld = native_loader.NativeTrainLoader(
        files, batch_size=4, motion_input_len=10, target_len=3,
        target_shift=10, audio_input_len=20, seed=7)
    batch = next(ld)
    assert batch["motion_input"].shape == (4, 10, 225)
    assert batch["target"].shape == (4, 3, 225)
    assert batch["audio_input"].shape == (4, 20, 35)
    # 6 leading zero-pad dims (inputs_util.py:70-73).
    assert (batch["motion_input"][..., :6] == 0).all()
    assert (batch["target"][..., :6] == 0).all()
    assert np.abs(batch["motion_input"][..., 6:]).max() > 0
    ld.close()


def test_endless_and_randomized(tmp_path):
    files = _write_shards(tmp_path, per_shard=3)
    ld = native_loader.NativeTrainLoader(
        files, batch_size=2, motion_input_len=10, target_len=3,
        target_shift=10, audio_input_len=20, seed=1)
    # More batches than examples: loader must repeat endlessly.
    batches = [next(ld) for _ in range(20)]
    ld.close()
    # Random windows: not all batches identical.
    assert any(not np.array_equal(batches[0]["motion_input"],
                                  b["motion_input"]) for b in batches[1:])


def test_window_values_come_from_source(tmp_path):
    # Single example, deterministic content: every window must be a
    # contiguous slice of the source motion.
    t_motion = 30
    motion = np.arange(t_motion, dtype=np.float32)[:, None].repeat(219, 1)
    audio = np.arange(40, dtype=np.float32)[:, None].repeat(35, 1)
    path = str(tmp_path / "one")
    with TFRecordWriter(path) as w:
        w.write(encode_example({
            "motion_sequence": motion.ravel(),
            "motion_sequence_shape": np.asarray(motion.shape, np.int64),
            "audio_sequence": audio.ravel(),
            "audio_sequence_shape": np.asarray(audio.shape, np.int64),
        }))
    ld = native_loader.NativeTrainLoader(
        [path], batch_size=1, motion_input_len=8, target_len=4,
        target_shift=8, audio_input_len=12, seed=3)
    for _ in range(5):
        b = next(ld)
        start = int(b["motion_input"][0, 0, 6])
        # Motion window is frames [start, start+8).
        np.testing.assert_array_equal(
            b["motion_input"][0, :, 6],
            np.arange(start, start + 8, dtype=np.float32))
        # Target is frames [start+8, start+12).
        np.testing.assert_array_equal(
            b["target"][0, :, 6],
            np.arange(start + 8, start + 12, dtype=np.float32))
        # Audio window aligns with the same start.
        np.testing.assert_array_equal(
            b["audio_input"][0, :, 0],
            np.arange(start, start + 12, dtype=np.float32))
        # Window start respects the max-window bound (<= 30-12=18).
        assert 0 <= start <= 18
    ld.close()


def test_skips_corrupt_records(tmp_path):
    """A shard with a corrupted record mid-file: the loader keeps serving
    the parseable examples instead of crashing."""
    files = _write_shards(tmp_path, n_shards=1, per_shard=4)
    # Append garbage framing at the end of the shard.
    with open(files[0], "ab") as f:
        f.write(b"\x10\x00\x00\x00\x00\x00\x00\x00XXXXgarbagegarbage??")
    ld = native_loader.NativeTrainLoader(
        files, batch_size=2, motion_input_len=10, target_len=3,
        target_shift=10, audio_input_len=20, seed=5)
    batch = next(ld)
    assert batch["motion_input"].shape == (2, 10, 225)
    assert np.isfinite(batch["motion_input"]).all()
    ld.close()


def test_missing_shard_skipped(tmp_path):
    files = _write_shards(tmp_path, n_shards=1, per_shard=4)
    ld = native_loader.NativeTrainLoader(
        files + [str(tmp_path / "does-not-exist")],
        batch_size=2, motion_input_len=10, target_len=3,
        target_shift=10, audio_input_len=20, seed=5)
    batch = next(ld)
    assert batch["motion_input"].shape == (2, 10, 225)
    ld.close()


def test_examples_too_short_for_window_are_dropped(tmp_path):
    files = _write_shards(tmp_path, n_shards=1, per_shard=3, t_motion=8,
                          t_audio=8)  # window=20 > 8: all dropped
    ok_files = _write_shards(tmp_path / "ok", n_shards=1, per_shard=3)
    ld = native_loader.NativeTrainLoader(
        files + ok_files, batch_size=2, motion_input_len=10,
        target_len=3, target_shift=10, audio_input_len=20, seed=5)
    batch = next(ld)  # served entirely from the valid shard
    assert batch["motion_input"].shape == (2, 10, 225)
    ld.close()


def test_all_unusable_shards_stop_instead_of_hanging(tmp_path):
    """Every record too short for the window: the loader signals
    exhaustion (StopIteration) rather than spinning/blocking forever."""
    files = _write_shards(tmp_path, n_shards=1, per_shard=2, t_motion=5,
                          t_audio=5)
    ld = native_loader.NativeTrainLoader(
        files, batch_size=2, motion_input_len=10, target_len=3,
        target_shift=10, audio_input_len=20, seed=9)
    with pytest.raises(StopIteration):
        next(ld)
    ld.close()  # must not deadlock


def test_shape_metadata_mismatch_rejected(tmp_path):
    """Records whose float payload disagrees with the declared shape are
    skipped instead of read out of bounds."""
    path = str(tmp_path / "bad")
    motion = RNG.standard_normal((40, 219)).astype(np.float32)
    audio = RNG.standard_normal((60, 35)).astype(np.float32)
    with TFRecordWriter(path) as w:
        w.write(encode_example({
            # Declared 400 frames but only 40 frames of data.
            "motion_sequence": motion.ravel(),
            "motion_sequence_shape": np.asarray([400, 219], np.int64),
            "audio_sequence": audio.ravel(),
            "audio_sequence_shape": np.asarray(audio.shape, np.int64),
        }))
    ld = native_loader.NativeTrainLoader(
        [path], batch_size=1, motion_input_len=10, target_len=3,
        target_shift=10, audio_input_len=20, seed=9)
    with pytest.raises(StopIteration):  # nothing usable
        next(ld)
    ld.close()


def test_audio_shorter_than_motion_no_crash(tmp_path):
    """t_motion >> t_audio: the sampled window may start past the audio;
    must not segfault (and such windows are skipped)."""
    path = str(tmp_path / "short_audio")
    motion = RNG.standard_normal((1000, 219)).astype(np.float32)
    audio = RNG.standard_normal((60, 35)).astype(np.float32)
    with TFRecordWriter(path) as w:
        w.write(encode_example({
            "motion_sequence": motion.ravel(),
            "motion_sequence_shape": np.asarray(motion.shape, np.int64),
            "audio_sequence": audio.ravel(),
            "audio_sequence_shape": np.asarray(audio.shape, np.int64),
        }))
    ld = native_loader.NativeTrainLoader(
        [path], batch_size=1, motion_input_len=10, target_len=3,
        target_shift=10, audio_input_len=20, seed=11)
    # Most random starts fall past the 60-frame audio and are skipped;
    # starts inside it are served zero-padded. Either way: no crash.
    try:
        batch = next(ld)
        assert batch["motion_input"].shape == (1, 10, 225)
    except StopIteration:
        pass
    ld.close()


def test_corrupt_payload_data_crc_rejected(tmp_path):
    """A flipped payload byte with intact framing (length + length-CRC
    still valid) must fail the record-data CRC and never be consumed as
    training data — matching TF's RecordReader."""
    files = _write_shards(tmp_path, n_shards=1, per_shard=1)
    with open(files[0], "r+b") as f:
        f.seek(40)  # well inside the protobuf payload (starts at byte 12)
        byte = f.read(1)
        f.seek(40)
        f.write(bytes([byte[0] ^ 0xFF]))
    ld = native_loader.NativeTrainLoader(
        files, batch_size=1, motion_input_len=10, target_len=3,
        target_shift=10, audio_input_len=20, seed=9)
    with pytest.raises(StopIteration):  # sole record rejected, shard dry
        next(ld)
    ld.close()


def test_shard_truncated_mid_record_other_shards_serve(tmp_path):
    """A shard cut off in the middle of a record (e.g. a partial copy):
    the loader abandons it at the truncation point and keeps serving the
    intact shard."""
    files = _write_shards(tmp_path, n_shards=2, per_shard=4)
    size = os.path.getsize(files[0])
    with open(files[0], "r+b") as f:
        f.truncate(size - 100)  # cut inside the final record body
    ld = native_loader.NativeTrainLoader(
        files, batch_size=4, motion_input_len=10, target_len=3,
        target_shift=10, audio_input_len=20, seed=7)
    for _ in range(5):  # several batches: loops shards without hanging
        batch = next(ld)
        assert batch["motion_input"].shape == (4, 10, 225)
        assert np.isfinite(batch["motion_input"]).all()
    ld.close()


def test_corrupt_length_field_stops_file(tmp_path):
    """A bit-flipped record length (bad length-CRC) must not abort the
    process; the rest of the stream is abandoned safely."""
    files = _write_shards(tmp_path, n_shards=1, per_shard=3)
    with open(files[0], "r+b") as f:
        f.seek(0)
        f.write(b"\xff\xff\xff\xff\xff\xff\xff\x7f")  # absurd length
    ld = native_loader.NativeTrainLoader(
        files, batch_size=1, motion_input_len=10, target_len=3,
        target_shift=10, audio_input_len=20, seed=9)
    with pytest.raises(StopIteration):  # whole (single) shard abandoned
        next(ld)
    ld.close()


def test_cached_epochs_serve_correct_windows(tmp_path):
    """After the first epoch the loader serves from the decoded-record
    cache; window contents must still be contiguous slices of the source
    (same contract as test_window_values_come_from_source) far past the
    first epoch."""
    t_motion = 30
    motion = np.arange(t_motion, dtype=np.float32)[:, None].repeat(219, 1)
    audio = np.arange(40, dtype=np.float32)[:, None].repeat(35, 1)
    path = str(tmp_path / "one")
    with TFRecordWriter(path) as w:
        w.write(encode_example({
            "motion_sequence": motion.ravel(),
            "motion_sequence_shape": np.asarray(motion.shape, np.int64),
            "audio_sequence": audio.ravel(),
            "audio_sequence_shape": np.asarray(audio.shape, np.int64),
        }))
    ld = native_loader.NativeTrainLoader(
        [path], batch_size=4, motion_input_len=8, target_len=4,
        target_shift=8, audio_input_len=12, seed=3,
        cache_bytes=64 << 20)
    starts = set()
    for _ in range(100):  # 400 windows from a 1-example corpus
        b = next(ld)
        for row in range(4):
            start = int(b["motion_input"][row, 0, 6])
            np.testing.assert_array_equal(
                b["motion_input"][row, :, 6],
                np.arange(start, start + 8, dtype=np.float32))
            np.testing.assert_array_equal(
                b["target"][row, :, 6],
                np.arange(start + 8, start + 12, dtype=np.float32))
            assert 0 <= start <= 18
            starts.add(start)
    ld.close()
    assert len(starts) > 3  # windows keep re-randomizing across epochs


def test_cache_overflow_falls_back_to_streaming(tmp_path):
    """A cache budget smaller than the corpus must not break anything:
    the loader drops the cache and streams every epoch."""
    files = _write_shards(tmp_path)
    ld = native_loader.NativeTrainLoader(
        files, batch_size=2, motion_input_len=8, target_len=4,
        target_shift=8, audio_input_len=12, seed=0, cache_bytes=1)
    for _ in range(30):  # many epochs over 10 examples
        b = next(ld)
        assert b["motion_input"].shape == (2, 8, 225)
        assert np.isfinite(b["motion_input"]).all()
    ld.close()


def test_cache_disabled_matches_streaming_shapes(tmp_path):
    files = _write_shards(tmp_path)
    ld = native_loader.NativeTrainLoader(
        files, batch_size=2, motion_input_len=8, target_len=4,
        target_shift=8, audio_input_len=12, seed=0, cache_bytes=0)
    for _ in range(30):
        b = next(ld)
        assert b["audio_input"].shape == (2, 12, 35)
    ld.close()
