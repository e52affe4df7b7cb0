"""Beat Alignment Score tests + mesh-sharded evaluator decode."""

import numpy as np
import pytest

import jax

from mint_tpu.eval import beat_align
from mint_tpu.motion.smpl import default_rest_joints

RNG = np.random.default_rng(23)


def _bouncing_motion(t, period):
    """Skeleton that pauses (zero velocity) every `period` frames."""
    base = default_rest_joints()
    # Triangle-wave vertical offset: velocity crosses zero at multiples
    # of period (peaks) and period/2 (valleys).
    phase = (np.arange(t) % period) / period
    height = np.where(phase < 0.5, phase, 1.0 - phase)
    joints = np.broadcast_to(base, (t, 24, 3)).copy()
    joints[:, :, 1] += height[:, None]
    return joints


class TestBeatAlign:
    def test_perfect_alignment_scores_high(self):
        period = 12
        joints = _bouncing_motion(240, period)
        motion_beats = beat_align.kinematic_beats(joints, smooth=1)
        # Music beats placed exactly at the motion's pause frames.
        score = beat_align.beat_alignment_score(motion_beats, motion_beats)
        assert score == pytest.approx(1.0)

    def test_offset_beats_score_lower(self):
        music = np.arange(0, 240, 12)
        aligned = beat_align.beat_alignment_score(music, music)
        shifted = beat_align.beat_alignment_score(music, music + 6)
        assert aligned == pytest.approx(1.0)
        assert shifted < aligned
        assert 0.0 < shifted < 0.4  # exp(-36/18) ~ 0.135

    def test_empty_inputs(self):
        assert beat_align.beat_alignment_score([], [1, 2]) == 0.0
        assert beat_align.beat_alignment_score([1], []) == 0.0

    def test_clip_beat_alignment_uses_column_34(self):
        t, period = 120, 12
        joints = _bouncing_motion(t, period)
        feats = np.zeros((t + 50, 35), np.float32)
        feats[::period, 34] = 1.0
        score = beat_align.clip_beat_alignment(joints, feats,
                                               start_frame=0)
        assert score is not None and 0.5 < score <= 1.0
        # No beats in window -> None.
        assert beat_align.clip_beat_alignment(
            joints, np.zeros((t + 50, 35), np.float32)) is None

    def test_kinematic_beats_of_static_pose(self):
        joints = np.broadcast_to(default_rest_joints(), (60, 24, 3)).copy()
        beats = beat_align.kinematic_beats(joints)
        # Flat envelope: the strict < on the left edge rejects plateaus.
        assert len(beats) == 0


class TestShardedEvaluator:
    def test_mesh_decode_matches_single_device(self, tmp_path):
        import copy
        import os as _os
        import jax.numpy as jnp
        from mint_tpu.config import load_pipeline_config
        from mint_tpu.eval.evaluator import Evaluator
        from mint_tpu.models import build, init_params
        from mint_tpu.parallel import mesh as mesh_lib

        repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
        cfg = copy.deepcopy(load_pipeline_config(_os.path.join(
            repo, "configs", "fact_v5_deeper_t10_cm12.config"
        )).multi_modal_model)
        fact = cfg.fact_model
        for mod in fact.modality:
            t = mod.model[0].transformer
            t.hidden_size = 32
            t.num_hidden_layers = 1
            t.num_attention_heads = 2
            t.intermediate_size = 64
        fact.modality_by_name("motion").sequence_length = 12
        fact.modality_by_name("motion").feature_dim = 225
        fact.modality_by_name("audio").sequence_length = 24
        cm = fact.cross_modal_model.transformer
        cm.hidden_size = 32
        cm.num_hidden_layers = 1
        cm.num_attention_heads = 2
        cm.intermediate_size = 64
        model = build(cfg, is_training=False)
        params = init_params(model, jax.random.PRNGKey(1))

        def dataset():
            # 3 clips: NOT a multiple of the 4-wide data axis (pads to 4).
            for i in range(3):
                r = np.random.default_rng(i)
                yield {
                    "motion_input": r.standard_normal(
                        (1, 12, 225)).astype(np.float32),
                    "audio_input": r.standard_normal(
                        (1, 40, 35)).astype(np.float32),
                    "motion_name": [f"m{i}".encode()],
                    "audio_name": [f"a{i}".encode()],
                }

        single_dir = tmp_path / "single"
        Evaluator(model, dataset, output_dir=str(single_dir),
                  steps=10).evaluate(params)

        mesh = mesh_lib.make_mesh(data=4, model=2)
        mesh_dir = tmp_path / "mesh"
        # COMMITTED params (what a checkpoint restore returns — orbax
        # SingleDeviceSharding): the evaluator must replicate them over
        # the mesh or jit raises 'Received incompatible devices'.
        committed = jax.device_put(params, jax.devices()[0])
        Evaluator(model, dataset, output_dir=str(mesh_dir),
                  steps=10, mesh=mesh).evaluate(committed)

        files = sorted(_os.listdir(single_dir))
        assert files == sorted(_os.listdir(mesh_dir)) and len(files) == 3
        for f in files:
            a = np.load(single_dir / f)
            b = np.load(mesh_dir / f)
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
