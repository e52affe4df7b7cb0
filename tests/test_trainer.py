"""Training-loop tests: convergence (reference single_task_trainer_test
trains to loss/2), DP+TP mesh sharding, checkpoint save/resume."""

import copy
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mint_tpu.config import load_pipeline_config
from mint_tpu.models import build, init_params
from mint_tpu.parallel import make_mesh, params_shardings, param_spec
from mint_tpu.train import CheckpointManager, Controller, Trainer, schedules
from jax.sharding import PartitionSpec as P

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = os.path.join(REPO, "configs", "fact_v5_deeper_t10_cm12.config")


def tiny_cfg(hidden=32, heads=2, inter=64):
    cfg = copy.deepcopy(load_pipeline_config(CONFIG).multi_modal_model)
    fact = cfg.fact_model
    for mod in fact.modality:
        tf = mod.model[0].transformer
        tf.hidden_size = hidden
        tf.num_hidden_layers = 1
        tf.num_attention_heads = heads
        tf.intermediate_size = inter
    fact.modality_by_name("motion").sequence_length = 8
    fact.modality_by_name("motion").feature_dim = 225
    fact.modality_by_name("audio").sequence_length = 16
    cm = fact.cross_modal_model.transformer
    cm.hidden_size = hidden
    cm.num_hidden_layers = 1
    cm.num_attention_heads = heads
    cm.intermediate_size = inter
    return cfg


def make_batch(rng, b, model):
    return {
        "motion_input": jnp.asarray(
            rng.randn(b, model.motion_seq_length, 225) * 0.1, jnp.float32),
        "audio_input": jnp.asarray(
            rng.randn(b, model.audio_seq_length, 35) * 0.1, jnp.float32),
        "target": jnp.asarray(rng.randn(b, 4, 225) * 0.1, jnp.float32),
    }


def run_overfit(mesh, steps=30):
    model = build(tiny_cfg(), is_training=True)
    params = init_params(model, jax.random.PRNGKey(0), batch_size=1)
    trainer = Trainer(model, schedules.constant(1e-3), grad_clip_norm=1.0,
                      mesh=mesh)
    state = trainer.init_state(params)
    rng = np.random.RandomState(0)
    batch = trainer.shard_batch(make_batch(rng, 8, model))
    losses = []
    for _ in range(steps):
        state, metrics = trainer.train_step(state, batch)
        losses.append(float(metrics["loss"]))
    return losses, state


def test_overfit_single_batch_dp():
    """Loss must drop by >2x on a fixed batch (cf. reference
    single_task_trainer_test.py convergence check)."""
    losses, state = run_overfit(make_mesh(8, 1))
    assert losses[-1] < losses[0] / 2, losses
    assert int(state.step) == 30


def test_overfit_dp_tp_mesh_matches_dp():
    """A 4x2 dp x tp mesh computes the same update math as pure DP."""
    losses_dp, _ = run_overfit(make_mesh(8, 1), steps=10)
    losses_tp, _ = run_overfit(make_mesh(4, 2), steps=10)
    np.testing.assert_allclose(losses_dp, losses_tp, rtol=1e-4, atol=1e-6)


def test_param_spec_rules():
    assert param_spec("audio_transformer/block_0/attn/to_qkv/kernel") == \
        P(None, "model")
    assert param_spec("cross_modal_layer/transformer/block_3/mlp/fc1/kernel"
                      ) == P(None, "model")
    assert param_spec("motion_pos_embedding/pos_embedding") == P()
    assert param_spec("attn/to_out/kernel") == P("model", None)


def test_params_sharded_on_mesh():
    mesh = make_mesh(4, 2)
    model = build(tiny_cfg(), is_training=True)
    params = init_params(model, jax.random.PRNGKey(0))
    shardings = params_shardings(params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    qkv = [s for kp, s in flat if "to_qkv" in str(kp) and "kernel" in str(kp)]
    assert qkv and all(s.spec == P(None, "model") for s in qkv)


def test_checkpoint_save_restore(tmp_path):
    model = build(tiny_cfg(), is_training=True)
    params = init_params(model, jax.random.PRNGKey(0))
    trainer = Trainer(model, schedules.constant(1e-3), mesh=make_mesh(8, 1))
    state = trainer.init_state(params)
    rng = np.random.RandomState(1)
    batch = trainer.shard_batch(make_batch(rng, 8, model))
    for _ in range(3):
        state, _ = trainer.train_step(state, batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_interval_steps=1,
                            max_to_keep=5)
    assert mgr.save(int(state.step), state)
    mgr.wait_until_finished()
    assert mgr.latest_step() == 3

    template = trainer.init_state(init_params(model, jax.random.PRNGKey(9)))
    restored = mgr.restore(template)
    assert int(restored.step) == 3
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_controller_trains_and_checkpoints(tmp_path):
    model = build(tiny_cfg(), is_training=True)
    params = init_params(model, jax.random.PRNGKey(0))
    trainer = Trainer(model, schedules.constant(1e-3), mesh=make_mesh(8, 1))
    state = trainer.init_state(params)
    rng = np.random.RandomState(2)
    batch = trainer.shard_batch(make_batch(rng, 8, model))

    def batches():
        while True:
            yield batch

    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_interval_steps=10,
                            max_to_keep=5)
    ctl = Controller(trainer=trainer, train_iter=batches(), state=state,
                     steps_per_loop=5, checkpoint_manager=mgr,
                     summary_dir=str(tmp_path / "summaries"),
                     summary_interval=5)
    metrics = ctl.train(20)
    assert ctl.global_step == 20
    assert "loss" in metrics and "learning_rate" in metrics
    ctl.save_checkpoint()
    assert mgr.latest_step() == 20
    assert (tmp_path / "summaries" / "metrics.jsonl").exists()

    # Resume: a fresh controller restores from the checkpoint dir.
    state2 = trainer.init_state(init_params(model, jax.random.PRNGKey(7)))
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"), save_interval_steps=10)
    ctl2 = Controller(trainer=trainer, train_iter=batches(), state=state2,
                      checkpoint_manager=mgr2)
    assert ctl2.global_step == 20
    ctl.close()
    ctl2.close()


def test_controller_flushes_pending_metrics_on_loop_exception(tmp_path):
    """The loop-boundary metric fetch is deferred until the NEXT loop is
    in flight (overlap, docs/BENCHMARKS.md); if that next loop raises —
    TPU worker drop, exhausted iterator — the completed loop's summary
    must still be written before the exception propagates (a resumed run
    never rewrites a passed interval)."""
    import json

    model = build(tiny_cfg(), is_training=True)
    params = init_params(model, jax.random.PRNGKey(0))
    trainer = Trainer(model, schedules.constant(1e-3), mesh=make_mesh(8, 1))
    state = trainer.init_state(params)
    rng = np.random.RandomState(3)
    batch = trainer.shard_batch(make_batch(rng, 8, model))

    def batches(n):
        for _ in range(n):
            yield batch
        raise RuntimeError("simulated worker drop")

    ctl = Controller(trainer=trainer, train_iter=batches(5), state=state,
                     steps_per_loop=5,
                     summary_dir=str(tmp_path / "summaries"),
                     summary_interval=5)
    with pytest.raises(RuntimeError, match="simulated worker drop"):
        ctl.train(20)
    ctl.close()
    path = tmp_path / "summaries" / "metrics.jsonl"
    assert path.exists()
    rows = [json.loads(line) for line in path.read_text().splitlines()]
    assert [r["step"] for r in rows] == [5]
    assert "loss" in rows[0]


def test_checkpoint_save_implies_summary_written(tmp_path):
    """A checkpoint at step N must never exist without step N's summary
    row: the deferred (overlapped) flush only covers exceptions, not a
    SIGKILL — and the save is finalized asynchronously, so the summary
    must be written BEFORE the save is even initiated."""
    model = build(tiny_cfg(), is_training=True)
    params = init_params(model, jax.random.PRNGKey(0))
    trainer = Trainer(model, schedules.constant(1e-3), mesh=make_mesh(8, 1))
    state = trainer.init_state(params)
    rng = np.random.RandomState(5)
    batch = trainer.shard_batch(make_batch(rng, 8, model))

    events = []
    orig_step = trainer.train_step

    def spy_step(state, b):
        events.append("dispatch")
        return orig_step(state, b)

    trainer.train_step = spy_step

    def batches():
        while True:
            yield batch

    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_interval_steps=5,
                            max_to_keep=5)
    orig_save = mgr.save_async

    def spy_save(step, state, force=False):
        # The event marks save INITIATION (the async fetch starts here);
        # the summary must already be on disk at this point.
        saved = orig_save(step, state, force=force)
        if saved:
            events.append(("saved", step))
        return saved

    mgr.save_async = spy_save
    ctl = Controller(trainer=trainer, train_iter=batches(), state=state,
                     steps_per_loop=5, checkpoint_manager=mgr,
                     summary_dir=str(tmp_path / "summaries"),
                     summary_interval=5)
    orig_write = ctl.metrics_writer.write

    def spy_write(step, metrics):
        events.append(("write", step))
        return orig_write(step, metrics)

    ctl.metrics_writer.write = spy_write
    ctl.train(10)
    ctl.close()
    # Each save is PRECEDED by that step's summary write, with no
    # dispatch in between (summary-first: a kill -9 any time after the
    # async save starts still finds the row on disk).
    for saved_step in (5, 10):
        i_save = events.index(("saved", saved_step))
        i_write = events.index(("write", saved_step))
        assert i_write < i_save
        assert "dispatch" not in events[i_write:i_save]


def test_fused_loop_matches_per_step():
    """Controller(fuse_loop=True) — one lax.scan dispatch per loop — must
    produce the same parameters and metrics as the per-step loop over the
    identical batch sequence."""
    model = build(tiny_cfg(), is_training=True)
    params = init_params(model, jax.random.PRNGKey(0))
    rng = np.random.RandomState(11)
    host_batches = [make_batch(rng, 8, model) for _ in range(7)]

    trainer_a = Trainer(model, schedules.constant(1e-3),
                        mesh=make_mesh(8, 1))
    state_a = trainer_a.init_state(params)
    for b in host_batches:
        state_a, metrics_a = trainer_a.train_step(
            state_a, trainer_a.shard_batch(b))

    trainer_b = Trainer(model, schedules.constant(1e-3),
                        mesh=make_mesh(8, 1))
    state_b = trainer_b.init_state(params)
    ctl = Controller(trainer=trainer_b, train_iter=iter(host_batches),
                     state=state_b, steps_per_loop=3, fuse_loop=True)
    metrics_b = ctl.train(7)  # loops of 3, 3, 1 (remainder recompiles)
    assert ctl.global_step == 7
    assert np.isclose(metrics_b["loss"], float(metrics_a["loss"]),
                      rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(ctl.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    ctl.close()


def test_interval_checkpoints_fire_off_multiple_boundaries(tmp_path):
    """Loop boundaries after the warm-up train(1) are 1, 1+loop, ... and
    need never hit an exact interval multiple; the manager must still
    save whenever the interval has ELAPSED since the last save (orbit /
    tf.train.CheckpointManager semantics).  Regression: with orbax's
    FixedIntervalPolicy gating, NO interval checkpoint ever fired and a
    preemption lost the entire run since step 1."""
    model = build(tiny_cfg(), is_training=True)
    params = init_params(model, jax.random.PRNGKey(0))
    trainer = Trainer(model, schedules.constant(1e-3), mesh=make_mesh(8, 1))
    state = trainer.init_state(params)
    rng = np.random.RandomState(4)
    batch = trainer.shard_batch(make_batch(rng, 8, model))

    def batches():
        while True:
            yield batch

    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_interval_steps=20,
                            max_to_keep=5)
    ctl = Controller(trainer=trainer, train_iter=batches(), state=state,
                     steps_per_loop=10, checkpoint_manager=mgr,
                     summary_dir=str(tmp_path / "s"), summary_interval=10)
    ctl.train(1)   # production bring-up pattern (tools/train.py)
    ctl.train(45)  # boundaries at 11, 21, 31, 41, 45
    ctl.close()
    steps = sorted(int(d) for d in os.listdir(tmp_path / "ckpt")
                   if d.isdigit())
    # 1 (initial), 21 (first boundary >= 1+20), 41 (>= 21+20).
    assert steps == [1, 21, 41], steps


def test_save_async_survives_donation(tmp_path):
    """save_async must snapshot the state before returning: the very next
    train_step DONATES the state's buffers, so a save that kept reading
    them would fetch deleted/recycled memory.  The restored checkpoint
    must equal the state exactly as it was at save time."""
    model = build(tiny_cfg(), is_training=True)
    params = init_params(model, jax.random.PRNGKey(0))
    trainer = Trainer(model, schedules.constant(1e-3), mesh=make_mesh(8, 1))
    state = trainer.init_state(params)
    rng = np.random.RandomState(3)
    batch = trainer.shard_batch(make_batch(rng, 8, model))
    for _ in range(2):
        state, _ = trainer.train_step(state, batch)
    want = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]

    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_interval_steps=1)
    assert mgr.save_async(int(state.step), state)
    # Donate the saved state's buffers while the save is (possibly) still
    # fetching, then overwrite them again for good measure.
    for _ in range(3):
        state, _ = trainer.train_step(state, batch)
    mgr.wait_until_finished()
    assert mgr.latest_step() == 2

    template = trainer.init_state(init_params(model, jax.random.PRNGKey(9)))
    restored = mgr.restore(template, step=2)
    got = [np.asarray(x) for x in jax.tree_util.tree_leaves(restored.params)]
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)
    mgr.close()


def test_controller_save_does_not_stall_training(tmp_path):
    """The interval save must not block the train loop for the duration
    of the checkpoint fetch/write (the ~80 s stall through a 12 MB/s
    device link, docs/BENCHMARKS.md): the controller keeps dispatching
    while the save rides a background thread.  Proven here by slowing the
    underlying orbax save and asserting train() returns BEFORE it
    finishes."""
    import threading
    import time as time_lib

    model = build(tiny_cfg(), is_training=True)
    params = init_params(model, jax.random.PRNGKey(0))
    trainer = Trainer(model, schedules.constant(1e-3), mesh=make_mesh(8, 1))
    state = trainer.init_state(params)
    rng = np.random.RandomState(4)
    batch = trainer.shard_batch(make_batch(rng, 8, model))

    def batches():
        while True:
            yield batch

    # A generous async_join_grace keeps this test deterministic: every
    # boundary save JOINS the previous 2 s slow save instead of racing
    # the defer path (whose behavior test_save_async_defers_while_
    # drain_in_flight pins with event-controlled timing), so the saved
    # steps are exactly [5, 15, 25] regardless of loop speed.
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_interval_steps=10,
                            async_join_grace=30.0)
    finished = {}
    orig_save = mgr._mgr.save

    def slow_save(*args, **kwargs):
        assert threading.current_thread().name.startswith("ckpt-save"), \
            "interval save ran on the training thread"
        time_lib.sleep(2.0)
        out = orig_save(*args, **kwargs)
        finished["at"] = time_lib.monotonic()
        return out

    mgr._mgr.save = slow_save
    ctl = Controller(trainer=trainer, train_iter=batches(), state=state,
                     steps_per_loop=5, checkpoint_manager=mgr,
                     summary_dir=str(tmp_path / "s"), summary_interval=5)
    ctl.train(25)  # interval saves at 5/15/25; loops never wait for them
    returned_at = time_lib.monotonic()
    ctl.save_checkpoint()  # joins the in-flight save@25 (already saved)
    assert finished["at"] > returned_at, \
        "train() blocked until the interval save completed"
    assert sorted(map(int, os.listdir(str(tmp_path / "ckpt")))) == [5, 15, 25]
    ctl.close()


def test_save_async_defers_while_drain_in_flight(tmp_path):
    """A non-forced save_async offered while the previous save's
    background drain is still in flight must DEFER (return False after
    the bounded grace) rather than join — on links where the drain
    exceeds the save cadence, joining would stall training for
    drain-minus-cadence at every save.  The deferred step stays
    eligible (`would_save` still True) and lands at the first offer
    after the drain; forced saves join outright.  The grace is paid
    ONCE per drain: later offers against the same drain defer
    immediately (the controller offers at every ~3 s loop boundary —
    re-paying 1 s each time would stall ~30% of the device through a
    drain-overrun window)."""
    import threading
    import time as time_lib

    model = build(tiny_cfg(), is_training=True)
    params = init_params(model, jax.random.PRNGKey(0))
    trainer = Trainer(model, schedules.constant(1e-3), mesh=make_mesh(8, 1))
    state = trainer.init_state(params)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_interval_steps=10,
                            async_join_grace=0.5)
    release = threading.Event()
    orig_save = mgr._mgr.save

    def gated_save(*args, **kwargs):
        assert release.wait(timeout=30), "test never released the save"
        return orig_save(*args, **kwargs)

    mgr._mgr.save = gated_save
    assert mgr.save_async(10, state)        # drain starts, held by the event
    assert not mgr.save_async(20, state), \
        "save_async joined a slow in-flight drain instead of deferring"
    assert mgr.would_save(20), "deferred step lost its save eligibility"
    t0 = time_lib.monotonic()
    assert not mgr.save_async(20, state)    # same drain: defers instantly
    assert time_lib.monotonic() - t0 < mgr.async_join_grace / 2, \
        "a later offer against the same drain re-paid the join grace"
    release.set()
    mgr.wait_until_finished()
    assert mgr.save_async(20, state)        # lands at the next offer
    mgr.wait_until_finished()
    assert sorted(map(int, os.listdir(str(tmp_path / "ckpt")))) == [10, 20]
    mgr.close()


def test_save_async_failure_surfaces_at_next_join(tmp_path):
    model = build(tiny_cfg(), is_training=True)
    params = init_params(model, jax.random.PRNGKey(0))
    trainer = Trainer(model, schedules.constant(1e-3), mesh=make_mesh(8, 1))
    state = trainer.init_state(params)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_interval_steps=1)

    def boom(*args, **kwargs):
        raise RuntimeError("disk full")

    mgr._mgr.save = boom
    assert mgr.save_async(1, state)
    with pytest.raises(RuntimeError, match="disk full"):
        mgr.wait_until_finished()
    # The failure is consumed; the manager remains usable.
    assert mgr.latest_step() is None
    mgr.close()


def test_checkpoints_iterator_starts_at_latest(tmp_path):
    """tf.train.checkpoints_iterator (which the reference's
    evaluate_continuously rides, evaluator.py:62-71) yields the CURRENT
    LATEST checkpoint first — it never replays the directory's history.
    A continuous evaluator attaching to a long-running trainer must not
    re-evaluate every old checkpoint before reaching the fresh one."""
    model = build(tiny_cfg(), is_training=True)
    params = init_params(model, jax.random.PRNGKey(0))
    trainer = Trainer(model, schedules.constant(1e-3), mesh=make_mesh(8, 1))
    state = trainer.init_state(params)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_interval_steps=1,
                            max_to_keep=5)
    for step in (3, 7, 12):
        mgr.save(step, state._replace(step=jnp.asarray(step)), force=True)
    mgr.wait_until_finished()

    it = mgr.checkpoints_iterator(timeout=30, poll_seconds=0.05)
    assert next(it) == 12  # latest only, not 3
    # A newer checkpoint appearing mid-iteration IS yielded.
    mgr.save(15, state._replace(step=jnp.asarray(15)), force=True)
    mgr.wait_until_finished()
    assert next(it) == 15
    # A fresh iterator also starts at the new latest, then times out.
    it2 = mgr.checkpoints_iterator(timeout=0.3, poll_seconds=0.05)
    assert list(it2) == [15]
    mgr.close()


def _acc_setup():
    model = build(tiny_cfg(), is_training=True)
    params = init_params(model, jax.random.PRNGKey(0), batch_size=1)
    rng = np.random.RandomState(3)
    batch = make_batch(rng, 4, model)
    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    return model, params, batch, mesh


def test_gradient_accumulation_matches_large_batch():
    """accumulate_steps=2 over two half-batches ~= one full-batch step."""
    model, params, batch, mesh = _acc_setup()

    tr_full = Trainer(model, schedules.constant(1e-2), mesh=mesh)
    state_f = tr_full.init_state(params)
    state_f, _ = tr_full.train_step(state_f, tr_full.shard_batch(batch))

    halves = [{k: np.asarray(v)[:2] for k, v in batch.items()},
              {k: np.asarray(v)[2:] for k, v in batch.items()}]
    tr_acc = Trainer(model, schedules.constant(1e-2), mesh=mesh,
                     accumulate_steps=2)
    state_a = tr_acc.init_state(params)
    for half in halves:
        state_a, _ = tr_acc.train_step(state_a, tr_acc.shard_batch(half))

    p0 = [np.asarray(x) for x in jax.tree_util.tree_leaves(params)]
    flat_f = [np.asarray(x)
              for x in jax.tree_util.tree_leaves(state_f.params)]
    flat_a = [np.asarray(x)
              for x in jax.tree_util.tree_leaves(state_a.params)]
    moved = sum(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                for a, b in zip(flat_f, p0))
    assert moved > 0
    # Adam on mean-of-half-gradients vs full-batch gradient: close but
    # not bitwise identical.
    for a, b in zip(flat_f, flat_a):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3)


def test_accumulation_applies_every_k():
    model, params, batch, mesh = _acc_setup()
    tr = Trainer(model, schedules.constant(1e-2), mesh=mesh,
                 accumulate_steps=2)
    state = tr.init_state(params)
    p0 = [np.asarray(x) for x in jax.tree_util.tree_leaves(params)]
    sb = tr.shard_batch(batch)
    state, _ = tr.train_step(state, sb)
    # Snapshot before the next (donating) step invalidates these buffers.
    after1 = [np.asarray(x)
              for x in jax.tree_util.tree_leaves(state.params)]
    for a, b in zip(p0, after1):  # no update after 1 micro-step
        np.testing.assert_array_equal(a, b)
    state, _ = tr.train_step(state, sb)
    after2 = [np.asarray(x)
              for x in jax.tree_util.tree_leaves(state.params)]
    assert any(not np.array_equal(a, b) for a, b in zip(p0, after2))


def test_checkpoints_iterator_timeout_excludes_consumer_time(tmp_path):
    """tf.train.checkpoints_iterator counts only time spent WAITING
    toward the timeout: an eval pass LONGER than the timeout must not
    end a continuous eval while checkpoints keep appearing (the
    deadline used to be armed before yield, so a slow consumer expired
    it)."""
    import time as _time

    model = build(tiny_cfg(), is_training=True)
    params = init_params(model, jax.random.PRNGKey(0))
    trainer = Trainer(model, schedules.constant(1e-3), mesh=make_mesh(8, 1))
    state = trainer.init_state(params)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_interval_steps=1,
                            max_to_keep=5)
    mgr.save(1, state._replace(step=jnp.asarray(1)), force=True)
    mgr.wait_until_finished()

    it = mgr.checkpoints_iterator(timeout=0.5, poll_seconds=0.05)
    assert next(it) == 1
    # Consumer "evaluates" for longer than the whole timeout, during
    # which a new checkpoint lands.
    _time.sleep(1.0)
    mgr.save(2, state._replace(step=jnp.asarray(2)), force=True)
    mgr.wait_until_finished()
    assert next(it) == 2  # used to StopIteration here
    mgr.close()


def test_restore_params_skips_optimizer_state(tmp_path):
    """Params-only partial restore: the evaluator/serving side never
    needs the Adam slots (~2/3 of the checkpoint bytes).  Works against
    an ABSTRACT template and on a manager that has saved in-process."""
    from mint_tpu.models.fact import abstract_params

    model = build(tiny_cfg(), is_training=True)
    params = init_params(model, jax.random.PRNGKey(0))
    trainer = Trainer(model, schedules.constant(1e-3), mesh=make_mesh(8, 1))
    state = trainer.init_state(params)
    assert state.opt_state is not None  # the test needs slots to skip

    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=1)
    mgr.save(7, state._replace(step=jnp.asarray(7)), force=True)
    mgr.wait_until_finished()

    restored = mgr.restore_params(abstract_params(model))
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(restored)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_continuous_eval_restores_each_checkpoint_once(tmp_path):
    """The controller restores the latest checkpoint at construction;
    evaluate_continuously's first yield is that same step and must not
    read it a second time — but a checkpoint that appears when NOTHING
    was restored at boot (e.g. a converted step-0 checkpoint) must
    still be restored."""
    from mint_tpu.train.checkpoint import CheckpointManager as CM
    from mint_tpu.train.trainer import TrainState

    model = build(tiny_cfg(), is_training=True)
    params = init_params(model, jax.random.PRNGKey(0))
    trainer = Trainer(model, schedules.constant(1e-3), mesh=make_mesh(8, 1))
    full = trainer.init_state(params)

    restores = []
    orig = CM.restore_params

    class Counting(CM):
        def restore_params(self, template, step=None):
            restores.append(step if step is not None
                            else self.latest_step())
            return orig(self, template, step=step)

    class Evaluator:
        def __init__(self):
            self.steps = []

        def evaluate(self, state):
            self.steps.append(int(state.step))
            return {"n": float(len(self.steps))}

    # Case 1: checkpoint exists at boot -> one restore total.
    mgr = Counting(str(tmp_path / "a"), max_to_keep=3)
    mgr.save(5, full._replace(step=jnp.asarray(5)), force=True)
    mgr.wait_until_finished()
    ev = Evaluator()
    ctl = Controller(evaluator=ev, state=TrainState(
        step=0, params=params, opt_state=None), checkpoint_manager=mgr)
    ctl.evaluate_continuously(timeout=0.3, poll_seconds=0.05)
    assert ev.steps == [5]
    assert restores == [5]  # boot restore only, not re-read per yield
    ctl.close()

    # Case 2: NO checkpoint at boot; a step-0 checkpoint appears.  The
    # template's step value (0) must not be mistaken for "restored".
    restores.clear()
    mgr2 = Counting(str(tmp_path / "b"), max_to_keep=3)
    ev2 = Evaluator()
    ctl2 = Controller(evaluator=ev2, state=TrainState(
        step=0, params=params, opt_state=None), checkpoint_manager=mgr2)
    mgr2.save(0, full._replace(step=jnp.asarray(0)), force=True)
    mgr2.wait_until_finished()
    ctl2.evaluate_continuously(timeout=0.3, poll_seconds=0.05)
    assert ev2.steps == [0]
    assert restores == [0]  # restored despite step label == template step
    ctl2.close()
