"""Tools & evaluator runtime tests: preprocessing codec, batched
generation evaluator, Euler metric, BVH export, AIST loader."""

import copy
import os
import pickle

import jax
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from mint_tpu.config import load_pipeline_config
from mint_tpu.data import aist
from mint_tpu.data.pipeline import parse_example
from mint_tpu.eval.evaluator import Evaluator
from mint_tpu.eval.metrics import EulerAnglesError
from mint_tpu.models import build, init_params
from mint_tpu.tools.bvh_export import BVHWriter
from mint_tpu.tools.preprocessing import motion_to_features, to_example

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = os.path.join(REPO, "configs", "fact_v5_deeper_t10_cm12.config")
RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = copy.deepcopy(load_pipeline_config(CONFIG).multi_modal_model)
    fact = cfg.fact_model
    for mod in fact.modality:
        tf = mod.model[0].transformer
        tf.hidden_size = 32
        tf.num_hidden_layers = 1
        tf.num_attention_heads = 2
        tf.intermediate_size = 64
    fact.modality_by_name("motion").sequence_length = 12
    fact.modality_by_name("motion").feature_dim = 225
    fact.modality_by_name("audio").sequence_length = 24
    cm = fact.cross_modal_model.transformer
    cm.hidden_size = 32
    cm.num_hidden_layers = 1
    cm.num_attention_heads = 2
    cm.intermediate_size = 64
    model = build(cfg, is_training=False)
    params = init_params(model, jax.random.PRNGKey(1), batch_size=2)
    return model, params


class TestPreprocessing:
    def test_motion_to_features_layout(self):
        t = 7
        poses = RNG.uniform(-1, 1, (t, 72))
        scaling = np.array([90.0])
        trans = RNG.uniform(-50, 50, (t, 3))
        feats = motion_to_features(poses, scaling, trans)
        assert feats.shape == (t, 219)
        np.testing.assert_allclose(feats[:, :3], trans / 90.0, atol=1e-6)
        # Rotmat block matches scipy.
        ref = Rotation.from_rotvec(poses.reshape(-1, 3)).as_matrix()
        np.testing.assert_allclose(feats[:, 3:].reshape(-1, 9),
                                   ref.reshape(-1, 9), atol=1e-5)

    def test_example_roundtrip_through_pipeline_parser(self):
        motion = RNG.standard_normal((9, 219)).astype(np.float32)
        audio = RNG.standard_normal((20, 35)).astype(np.float32)
        record = to_example(motion, audio, "gWA_sBM_c01_d25_mWA2_ch01",
                            "mWA2")
        ex = parse_example(record)
        np.testing.assert_allclose(ex["motion_sequence"], motion,
                                   atol=1e-6)
        np.testing.assert_allclose(ex["audio_sequence"], audio, atol=1e-6)
        assert ex["motion_name"] in ("gWA_sBM_c01_d25_mWA2_ch01", b"gWA_sBM_c01_d25_mWA2_ch01")
        assert ex["audio_name"] in ("mWA2", b"mWA2")


class TestEvaluator:
    def _dataset(self, n_clips=3, audio_len=40):
        for i in range(n_clips):
            yield {
                "motion_input": RNG.standard_normal(
                    (1, 12, 225)).astype(np.float32),
                "audio_input": RNG.standard_normal(
                    (1, audio_len, 35)).astype(np.float32),
                "motion_name": [f"motion{i}".encode()],
                "audio_name": [f"audio{i}".encode()],
            }

    def test_generates_and_saves_clips(self, tiny_model, tmp_path):
        model, params = tiny_model
        steps = 10
        ev = Evaluator(model, self._dataset(), output_dir=str(tmp_path),
                       steps=steps)
        metrics = ev.evaluate(params)
        assert metrics == {}
        files = sorted(os.listdir(tmp_path))
        assert files == [f"motion{i}_audio{i}.npy" for i in range(3)]
        out = np.load(tmp_path / files[0])
        assert out.shape == (12 + steps, 225)  # seed + generated

    def test_partial_bucket_pad_divisible_by_data_axis(self, tiny_model,
                                                       tmp_path):
        """Regression: padding a partial bucket to decode_batch must then
        round UP to a data-axis multiple — decode_batch=8 on a 6-wide
        data axis previously produced an 8-row batch that device_put
        rejected (8 % 6 != 0)."""
        import jax
        from mint_tpu.parallel import make_mesh

        model, params = tiny_model
        mesh = make_mesh(data=6, model=1, devices=jax.devices()[:6])
        ev = Evaluator(model, self._dataset(n_clips=2), steps=5,
                       output_dir=str(tmp_path), decode_batch=8, mesh=mesh)
        ev.evaluate(params)  # 2 clips -> target 8 -> padded to 12
        assert len(os.listdir(tmp_path)) == 2  # pad clips trimmed

    def test_default_decode_batch_is_mesh_aware(self, tiny_model, tmp_path):
        """Default decode_batch scales with the mesh's data axis (8 per
        data-axis device) so a multi-chip eval keeps every device at the
        measured single-chip per-device optimum instead of one clip per
        device per dispatch; buckets shard evenly at defaults."""
        import jax
        from mint_tpu.parallel import make_mesh

        model, params = tiny_model
        assert Evaluator(model, self._dataset()).decode_batch == 8
        mesh = make_mesh(data=4, model=2, devices=jax.devices()[:8])
        ev = Evaluator(model, self._dataset(n_clips=9), steps=5,
                       output_dir=str(tmp_path), mesh=mesh)
        assert ev.decode_batch == 32  # 8 per device x 4-wide data axis
        ev.evaluate(params)  # 9 clips -> one dispatch, padded to 16
        assert len(os.listdir(tmp_path)) == 9  # pad clips trimmed

    def test_protocol_clamps_to_audio_length(self, tiny_model, tmp_path):
        # audio 30 frames, window 24 -> reference generates 7 frames max.
        model, params = tiny_model
        ev = Evaluator(model, self._dataset(n_clips=1, audio_len=30),
                       output_dir=str(tmp_path), steps=1200)
        ev.evaluate(params)
        out = np.load(tmp_path / "motion0_audio0.npy")
        assert out.shape == (12 + 7, 225)

    def test_buckets_mixed_lengths(self, tiny_model, tmp_path):
        model, params = tiny_model

        def mixed():
            yield from self._dataset(n_clips=1, audio_len=30)   # 7 frames
            for batch in self._dataset(n_clips=1, audio_len=40):
                batch["motion_name"] = [b"long"]
                yield batch                                      # 17 frames

        ev = Evaluator(model, mixed(), output_dir=str(tmp_path),
                       steps=1200)
        ev.evaluate(params)
        assert np.load(tmp_path / "motion0_audio0.npy").shape[0] == 19
        assert np.load(tmp_path / "long_audio0.npy").shape[0] == 29

    def test_callable_corpus_cached_across_passes(self, tiny_model,
                                                  tmp_path):
        """Continuous eval runs one pass per checkpoint; the eval corpus
        is a fixed file set, so the dataset factory should be drained
        ONCE and the parsed examples reused instead of re-paying the
        corpus read+parse per checkpoint.  cache_examples=False opts
        back into a fresh drain per pass."""
        model, params = tiny_model
        calls = []

        def factory():
            calls.append(1)
            return self._dataset(n_clips=2)

        ev = Evaluator(model, factory, output_dir=str(tmp_path / "a"),
                       steps=5)
        ev.evaluate(params)
        ev.evaluate(params)
        assert len(calls) == 1  # cached after the first pass
        assert len(os.listdir(tmp_path / "a")) == 2

        calls.clear()
        ev = Evaluator(model, factory, output_dir=str(tmp_path / "b"),
                       steps=5, cache_examples=False)
        ev.evaluate(params)
        ev.evaluate(params)
        assert len(calls) == 2  # factory re-invoked per pass

    def test_reiterable_honors_cache_opt_out(self, tiny_model, tmp_path):
        """A re-iterable container with cache_examples=False is re-drained
        per pass (it may have grown between passes); a true one-shot
        iterator is always cached — re-draining it would silently yield
        an empty corpus."""
        model, params = tiny_model
        data = list(self._dataset(n_clips=1))
        ev = Evaluator(model, data, output_dir=str(tmp_path / "grow"),
                       steps=5, cache_examples=False)
        ev.evaluate(params)
        data.extend(self._dataset(n_clips=2))  # corpus grew: clips 0,1
        ev.evaluate(params)
        assert len(os.listdir(tmp_path / "grow")) == 2

        it = self._dataset(n_clips=2)  # generator: one-shot iterator
        ev = Evaluator(model, it, output_dir=str(tmp_path / "oneshot"),
                       steps=5, cache_examples=False)
        ev.evaluate(params)
        ev.evaluate(params)  # must reuse the cache, not re-drain empty
        assert len(os.listdir(tmp_path / "oneshot")) == 2

    def test_steps_bucket_quantization_is_exact(self, tiny_model, tmp_path):
        """steps_bucket shares one compiled decoder across nearby audio
        lengths by zero-padding the audio tail and trimming per clip —
        every clip's saved output must be IDENTICAL to the unbucketed
        run (kept frames never read padded audio rows)."""
        model, params = tiny_model

        def mixed():
            # True generatable lengths 7, 12, 17 -> buckets {10: [7],
            # 20: [12, 17]} at steps_bucket=10.
            for j, alen in enumerate((30, 35, 40)):
                for batch in self._dataset(n_clips=1, audio_len=alen):
                    batch["motion_name"] = [f"clip{j}".encode()]
                    yield batch

        data = list(mixed())  # materialize ONCE: same inputs both runs
        # decode_batch=1 in BOTH runs: batch composition changes fp
        # summation order, which is not what this test is pinning.
        exact_dir = tmp_path / "exact"
        ev = Evaluator(model, data, output_dir=str(exact_dir),
                       steps=1200, decode_batch=1)
        ev.evaluate(params)

        bucket_dir = tmp_path / "bucketed"
        ev2 = Evaluator(model, data, output_dir=str(bucket_dir),
                        steps=1200, steps_bucket=10, decode_batch=1)
        ev2.evaluate(params)

        files = sorted(os.listdir(exact_dir))
        assert files == sorted(os.listdir(bucket_dir))
        for f in files:
            a = np.load(exact_dir / f)
            b = np.load(bucket_dir / f)
            assert a.shape == b.shape, f
            np.testing.assert_array_equal(a, b, err_msg=f)

    def test_metrics_invariant_to_bucketing_and_batching(self, tiny_model):
        """Metric updates are per CLIP (the reference's eval batch_size
        is 1, configs/...config:119), so the accumulated value must not
        depend on decode batching or steps_bucket composition."""

        class LastFrameMean:
            """Toy metric touching outputs only (FACT's get_metrics is
            empty, so exercise the contract with a stand-in)."""
            name = "last_frame_mean"

            def __init__(self):
                self.total = 0.0

            def reset_states(self):
                self.total = 0.0

            def update_state(self, inputs, outputs):
                self.total += float(np.mean(outputs[:, -1]))

            def result(self):
                return self.total

        model, params = tiny_model
        data = []
        for j, alen in enumerate((30, 35, 40, 35)):
            for batch in self._dataset(n_clips=1, audio_len=alen):
                batch["motion_name"] = [f"c{j}".encode()]
                data.append(batch)

        results = []
        for kwargs in ({"decode_batch": 1},
                       {"decode_batch": 4},
                       {"decode_batch": 4, "steps_bucket": 10}):
            m = LastFrameMean()
            Evaluator(model, data, metrics=[m], steps=1200,
                      **kwargs).evaluate(params)
            results.append(m.result())
        assert results[0] == pytest.approx(results[1], rel=1e-5)
        assert results[0] == pytest.approx(results[2], rel=1e-5)


class TestEulerMetric:
    def test_zero_for_identical(self):
        m = EulerAnglesError(num_joints=24)
        target = np.zeros((2, 5, 225), np.float32)
        eye = np.eye(3).reshape(9)
        target[:, :, 9:] = np.tile(eye, 24)
        m.update_state({"target": target}, target.copy())
        assert m.result() == pytest.approx(0.0, abs=1e-5)

    def test_positive_for_rotated(self):
        m = EulerAnglesError(num_joints=24)
        target = np.zeros((1, 3, 225), np.float32)
        eye = np.eye(3).reshape(9)
        target[:, :, 9:] = np.tile(eye, 24)
        pred = target.copy()
        rot = Rotation.from_euler("xyz", [0.3, 0, 0]).as_matrix().reshape(9)
        pred[:, :, 9:18] = rot
        m.update_state({"target": target}, pred)
        assert m.result() > 0.1


class TestBVH:
    def test_export_from_smpl_poses(self, tmp_path):
        t = 5
        data = {"smpl_poses": RNG.uniform(-0.3, 0.3, (t, 72)),
                "smpl_trans": RNG.uniform(-1, 1, (t, 3))}
        pkl = tmp_path / "motion.pkl"
        with open(pkl, "wb") as f:
            pickle.dump(data, f)
        w = BVHWriter("smpl", motion_pkl_filename=str(pkl))
        w.fill_header(60.0)
        w.fill_motion()
        out = tmp_path / "out.bvh"
        w.write_to_bvh(str(out))
        text = out.read_text()
        assert text.startswith("HIERARCHY\nROOT Hips")
        assert f"Frames: {t}" in text
        # First line after the split is the frame-time value itself.
        motion_lines = text.split("Frame Time:")[1].strip().splitlines()[1:]
        assert len(motion_lines) == t
        # 3 root pos + 24 joints x 3 rot channels = 75 values per line.
        assert len(motion_lines[0].split()) == 75

    def test_export_from_pred_motion(self, tmp_path):
        t = 4
        aa = RNG.uniform(-0.3, 0.3, (t, 24, 3))
        rot = Rotation.from_rotvec(aa.reshape(-1, 3)).as_matrix()
        data = {"pred_motion": rot.reshape(t, 24, 9),
                "pred_trans": RNG.uniform(-1, 1, (t, 3))}
        pkl = tmp_path / "pred.pkl"
        with open(pkl, "wb") as f:
            pickle.dump(data, f)
        w = BVHWriter("smpl", motion_pkl_filename=str(pkl))
        w.fill_header()
        w.fill_motion()
        w.write_to_bvh(str(tmp_path / "pred.bvh"))
        assert (tmp_path / "pred.bvh").exists()

    def test_requires_fill_before_write(self, tmp_path):
        w = BVHWriter("smpl")
        with pytest.raises(ValueError):
            w.write_to_bvh(str(tmp_path / "x.bvh"))


class TestAISTLoader:
    def test_split_and_motion(self, tmp_path):
        os.makedirs(tmp_path / "splits")
        os.makedirs(tmp_path / "motions")
        names = ["gWA_sBM_c01_d25_mWA2_ch01", "gBR_sBM_c01_d04_mBR0_ch01",
                 "gHO_sBM_c01_d19_mHO5_ch02"]
        (tmp_path / "splits" / "crossmodal_train.txt").write_text(
            "\n".join(names))
        (tmp_path / "ignore_list.txt").write_text(names[2])
        for n in names:
            with open(tmp_path / "motions" / f"{n}.pkl", "wb") as f:
                pickle.dump({"smpl_poses": np.zeros((6, 72)),
                             "smpl_scaling": np.array([93.0]),
                             "smpl_trans": np.ones((6, 3))}, f)
        split = aist.load_split(str(tmp_path), "train")
        assert split == names[:2]
        poses, scaling, trans = aist.load_motion(
            str(tmp_path / "motions"), names[0])
        assert poses.shape == (6, 72)
        assert scaling[0] == 93.0
        assert aist.audio_name_of(names[0]) == "mWA2"
