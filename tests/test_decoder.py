"""AR decoder tests: the lax.scan decoder must be protocol-exact vs the
reference per-frame loop (mint/core/fact_model.py:103-132)."""

import copy
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mint_tpu.config import load_pipeline_config
from mint_tpu.infer import (
    infer_auto_regressive,
    infer_auto_regressive_reference,
    max_steps,
)
from mint_tpu.models import build, init_params

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = os.path.join(REPO, "configs", "fact_v5_deeper_t10_cm12.config")


@pytest.fixture(scope="module")
def tiny_model():
    """Tiny FACT: short windows so the Python-loop reference is cheap."""
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


def test_scan_decoder_matches_reference_loop(tiny_model):
    model, params = tiny_model
    rng = np.random.RandomState(0)
    steps = 10
    b = 2
    audio_len = steps + model.audio_seq_length - 1 + 3  # some slack
    inputs = {
        "motion_input": jnp.asarray(
            rng.randn(b, model.motion_seq_length, 225) * 0.1, jnp.float32),
        "audio_input": jnp.asarray(
            rng.randn(b, audio_len, 35) * 0.1, jnp.float32),
    }
    ref = infer_auto_regressive_reference(model, params, inputs, steps=steps)
    got = infer_auto_regressive(model, params, inputs, steps=steps)
    assert got.shape == (b, steps, 225)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_chunked_dispatch_is_identical(tiny_model):
    """dispatch_chunk only splits device dispatches; the math is the same
    scan, so results must be BIT-identical to the single-dispatch path
    (including an uneven final chunk)."""
    model, params = tiny_model
    rng = np.random.RandomState(3)
    steps, b = 11, 2
    audio_len = steps + model.audio_seq_length - 1
    inputs = {
        "motion_input": jnp.asarray(
            rng.randn(b, model.motion_seq_length, 225) * 0.1, jnp.float32),
        "audio_input": jnp.asarray(
            rng.randn(b, audio_len, 35) * 0.1, jnp.float32),
    }
    whole = infer_auto_regressive(model, params, inputs, steps=steps)
    for chunk in (1, 4, 11, 100):
        got = infer_auto_regressive(model, params, inputs, steps=steps,
                                    dispatch_chunk=chunk)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(whole))
    # 0 = "one dispatch" (it used to spin forever: n = min(0, rest)
    # never advanced); negative is a call-site bug and raises.
    got0 = infer_auto_regressive(model, params, inputs, steps=steps,
                                 dispatch_chunk=0)
    np.testing.assert_array_equal(np.asarray(got0), np.asarray(whole))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="dispatch_chunk"):
        infer_auto_regressive(model, params, inputs, steps=steps,
                              dispatch_chunk=-1)


def test_batch_split_decode_is_identical(tiny_model):
    """Splitting a decode batch into smaller sequential dispatches (the
    bench protocol runs 40 clips as 2 x batch-20 — bench.py DISPATCH;
    the evaluator and server cap dispatches the same way) must decode
    each clip to the same frames as one full-batch dispatch: no op in
    the decode scan couples clips across the batch axis.  Equality is
    numerical, not bitwise — XLA picks different reduction orders for
    different compiled batch shapes (measured max |delta| 2.6e-7 over a
    9-step AR rollout here; bitwise equality DOES hold for same-shape
    dispatch_chunk splits, pinned above)."""
    model, params = tiny_model
    rng = np.random.RandomState(7)
    steps, b = 9, 5
    audio_len = steps + model.audio_seq_length - 1
    inputs = {
        "motion_input": jnp.asarray(
            rng.randn(b, model.motion_seq_length, 225) * 0.1, jnp.float32),
        "audio_input": jnp.asarray(
            rng.randn(b, audio_len, 35) * 0.1, jnp.float32),
    }
    whole = np.asarray(
        infer_auto_regressive(model, params, inputs, steps=steps))
    for split in (1, 2, 3):  # 3 leaves an uneven final dispatch (2+2+1)
        parts = [
            np.asarray(infer_auto_regressive(
                model, params,
                {k: v[i:i + split] for k, v in inputs.items()},
                steps=steps))
            for i in range(0, b, split)
        ]
        np.testing.assert_allclose(np.concatenate(parts), whole,
                                   rtol=2e-4, atol=1e-5)


def test_unroll_and_rows_knobs_are_exact(tiny_model):
    """The sweepable decode knobs (scan unroll, final-block query rows)
    must not change the math: any combination decodes the same frames as
    the defaults (rows are row-local past the attention K/V; unroll only
    changes XLA scheduling).  Pinned here on the CPU mesh at f32; on TPU
    the knobs retile matmuls, so ULP-level deltas amplified by the AR
    rollout are expected (decoder docstring).  These are the knobs the
    f32 scoring sweep and Evaluator(decode_unroll/decode_rows) turn."""
    model, params = tiny_model
    rng = np.random.RandomState(7)
    steps, b = 9, 2
    audio_len = steps + model.audio_seq_length - 1
    inputs = {
        "motion_input": jnp.asarray(
            rng.randn(b, model.motion_seq_length, 225) * 0.1, jnp.float32),
        "audio_input": jnp.asarray(
            rng.randn(b, audio_len, 35) * 0.1, jnp.float32),
    }
    base = np.asarray(infer_auto_regressive(model, params, inputs,
                                            steps=steps))
    for unroll, rows in ((1, 48), (3, 48), (8, 1), (8, 16), (4, 1000)):
        got = infer_auto_regressive(model, params, inputs, steps=steps,
                                    unroll=unroll, last_block_rows=rows)
        np.testing.assert_allclose(np.asarray(got), base,
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=f"unroll={unroll} rows={rows}")


def test_evaluator_decode_knobs_thread_through(tiny_model, tmp_path):
    """Evaluator(decode_unroll=, decode_rows=) must reach the decoder and
    produce the same clips as the defaults."""
    from mint_tpu.eval.evaluator import Evaluator

    model, params = tiny_model
    rng = np.random.RandomState(11)
    audio_len = model.audio_seq_length + 6
    examples = [{
        "motion_input": rng.randn(
            model.motion_seq_length, 225).astype(np.float32) * 0.1,
        "audio_input": rng.randn(audio_len, 35).astype(np.float32) * 0.1,
        "motion_name": b"m0", "audio_name": b"a0",
    }]
    outs = {}
    for tag, kw in (("default", {}),
                    ("knobs", dict(decode_unroll=2, decode_rows=5))):
        out_dir = tmp_path / tag
        ev = Evaluator(model, [examples[0]], output_dir=str(out_dir),
                       steps=7, **kw)
        ev.evaluate(params)
        outs[tag] = np.load(out_dir / "m0_a0.npy")
    np.testing.assert_allclose(outs["knobs"], outs["default"],
                               rtol=1e-6, atol=1e-6)


def test_max_steps_protocol(tiny_model):
    model, _ = tiny_model
    audio_seq = model.audio_seq_length
    # Reference breaks when the audio window runs short.
    assert max_steps(model, audio_len=audio_seq, requested=100) == 1
    assert max_steps(model, audio_len=audio_seq + 9, requested=100) == 10
    assert max_steps(model, audio_len=audio_seq + 999, requested=100) == 100
    assert max_steps(model, audio_len=audio_seq - 1, requested=100) == 0


def test_decoder_rejects_short_audio(tiny_model):
    model, params = tiny_model
    inputs = {
        "motion_input": jnp.zeros((1, model.motion_seq_length, 225)),
        "audio_input": jnp.zeros((1, model.audio_seq_length, 35)),
    }
    with pytest.raises(ValueError, match="audio too short"):
        infer_auto_regressive(model, params, inputs, steps=5)


@pytest.mark.integration
def test_scan_decoder_parity_flagship_config():
    """Protocol-exactness on the FULL fact_v5_deeper_t10_cm12 shapes
    (16 layers, 800 hidden, motion 120 + audio 240), f32, 3 AR steps."""
    cfg = load_pipeline_config(CONFIG).multi_modal_model
    model = build(cfg, is_training=False)
    params = init_params(model, jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    steps, b = 3, 1
    inputs = {
        "motion_input": jnp.asarray(rng.randn(b, 120, 225) * 0.1,
                                    jnp.float32),
        "audio_input": jnp.asarray(
            rng.randn(b, steps + 239, 35) * 0.1, jnp.float32),
    }
    ref = infer_auto_regressive_reference(model, params, inputs,
                                          steps=steps)
    got = infer_auto_regressive(model, params, inputs, steps=steps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_padded_batch_size_rule():
    """The shared evaluator/serving batch-padding rule: next pow2,
    optionally capped (never below n_real), then rounded up to a
    data-axis multiple when a mesh is given."""
    from mint_tpu.infer.decoder import padded_batch_size
    from mint_tpu.parallel import make_mesh

    assert padded_batch_size(1) == 1
    assert padded_batch_size(3) == 4
    assert padded_batch_size(5) == 8
    assert padded_batch_size(64) == 64
    # Cap bounds the pow2 growth but never truncates real rows.
    assert padded_batch_size(5, cap=4) == 5
    assert padded_batch_size(33, cap=64) == 64
    assert padded_batch_size(65, cap=64) == 65
    # On a mesh the padded total shards evenly over the data axis.
    mesh6 = make_mesh(data=6, model=1, devices=jax.devices()[:6])
    assert padded_batch_size(1, mesh=mesh6) == 6
    assert padded_batch_size(5, mesh=mesh6) == 12  # pow2 8 -> 12
    mesh8 = make_mesh(data=8, model=1)
    assert padded_batch_size(3, mesh=mesh8) == 8
    assert padded_batch_size(16, mesh=mesh8) == 16
