"""The training/eval controller — the Orbit equivalent.

Reconstructs the controller contract the reference relies on (see
trainer.py:164-178 / evaluator.py:62-71 and the orbit.Controller use sites):

- ``train(num_steps)`` — runs train steps in loops of ``steps_per_loop``,
  writing summaries every ``summary_interval`` steps and checkpointing on
  the manager's interval.
- ``evaluate()`` — one pass of the evaluator over its dataset.
- ``evaluate_continuously(timeout)`` — watches the checkpoint directory,
  restoring and evaluating each new checkpoint until `timeout` seconds pass
  with no new one.
"""

from __future__ import annotations

import logging

from typing import Dict, Iterator, Optional


from mint_tpu.train.checkpoint import CheckpointManager
from mint_tpu.train.metrics_io import MetricsWriter
from mint_tpu.train.trainer import Trainer, TrainState

log = logging.getLogger(__name__)


class Controller:
    def __init__(self,
                 trainer: Optional[Trainer] = None,
                 train_iter: Optional[Iterator] = None,
                 state: Optional[TrainState] = None,
                 evaluator=None,
                 steps_per_loop: int = 10,
                 checkpoint_manager: Optional[CheckpointManager] = None,
                 summary_dir: Optional[str] = None,
                 summary_interval: int = 10,
                 fuse_loop: bool = False,
                 train_sampler=None,
                 sample_seed: int = 0):
        """``fuse_loop``: compile each steps_per_loop window as ONE
        ``lax.scan`` dispatch (Trainer.train_steps) instead of per-step
        dispatches — orbit's one-tf.function-per-loop semantics, and the
        difference between ~2.5 and ~13 steps/s on a high-latency-dispatch
        host.  Requires ``train_iter`` to yield HOST (numpy) batches;
        per-step mode accepts pre-sharded device batches.

        ``train_sampler``: a DeviceDataset; when given, batches are
        sampled ON-DEVICE inside the fused loop (Trainer.
        train_steps_sampled) and ``train_iter`` is not consumed.  Step
        keys are derived from ``sample_seed`` and the ABSOLUTE step
        number, so a preemption-resumed run draws the same windows it
        would have drawn uninterrupted."""
        self.trainer = trainer
        self.train_iter = train_iter
        self.train_sampler = train_sampler
        self.sample_seed = sample_seed
        self.state = state
        self.evaluator = evaluator
        self.steps_per_loop = steps_per_loop
        self.fuse_loop = fuse_loop
        self.checkpoint_manager = checkpoint_manager
        self.summary_interval = summary_interval
        self.metrics_writer = MetricsWriter(summary_dir)

        # Resume from the latest checkpoint if one exists (Orbit restores on
        # startup when a checkpoint manager is passed).
        self._restored_step: Optional[int] = None
        if checkpoint_manager is not None and state is not None:
            if checkpoint_manager.latest_step() is not None:
                self.state = self._restore(state)
                self._restored_step = int(self.state.step)
                log.info("restored checkpoint at step %d",
                         int(self.state.step))

    def _restore(self, template: TrainState,
                 step: Optional[int] = None) -> TrainState:
        """Full restore for training; params-ONLY restore when the
        template has no optimizer state (the evaluator side) — skipping
        the saved Adam slots, ~2/3 of the checkpoint's bytes."""
        if getattr(template, "opt_state", None) is None:
            if step is None:
                step = self.checkpoint_manager.latest_step()
            params = self.checkpoint_manager.restore_params(
                template.params, step=step)
            # The controller always saves at step == global_step, so the
            # directory label IS the state's step.
            return TrainState(step=step, params=params, opt_state=None)
        return self.checkpoint_manager.restore(template, step=step)

    @property
    def global_step(self) -> int:
        return int(self.state.step) if self.state is not None else 0

    def train(self, until_step: int) -> Dict[str, float]:
        """Train until ``global_step`` reaches `until_step` (ABSOLUTE,
        like orbit's ``Controller.train``): a resumed run continues from
        its checkpoint and stops at the same budget — calling train again
        with the same target is a no-op, which is what makes
        preemption-resume idempotent."""
        from mint_tpu.utils.profiling import StepTimer

        assert self.trainer is not None
        assert self.train_iter is not None or self.train_sampler is not None
        metrics: Dict[str, float] = {}
        timer = StepTimer()
        # The previous loop's metrics stay as ASYNC device arrays until the
        # next fused dispatch is in flight: float(v) blocks on the device,
        # and materializing eagerly would serialize host work (summary
        # write, logging) with the device, costing ~125 ms per loop
        # boundary at steps_per_loop=10 (docs/BENCHMARKS.md).  Only the
        # small metric scalars are kept — never `state`, whose buffers the
        # donated train step consumes.
        try:
            metrics = self._train_loops(until_step, timer)
        except BaseException:
            # The previous loop COMPLETED (its device arrays are done);
            # an exception in the next loop — TPU worker drop, exhausted
            # iterator, KeyboardInterrupt — must not lose its summary:
            # after a resume the passed interval is never rewritten.
            pending, self._pending = self._pending, None
            if pending is not None:
                try:
                    self._flush_loop_metrics(*pending, timer)
                except Exception:
                    pass  # flushing needs the device; keep the original
            # Likewise an in-flight async save must not die with the
            # process (its thread is a daemon): let it finish so the
            # resumed run restores this interval, not the previous one.
            # Failures are swallowed — the original exception matters.
            if self.checkpoint_manager is not None:
                try:
                    self.checkpoint_manager.join_async_save()
                except Exception:
                    pass
            raise
        pending, self._pending = self._pending, None
        if pending is not None:
            metrics = self._flush_loop_metrics(*pending, timer)
        return metrics

    def _train_loops(self, until_step: int, timer) -> Dict[str, float]:
        metrics: Dict[str, float] = {}
        self._pending = None  # (step, loop, device step_metrics)
        while self.global_step < until_step:
            loop = min(self.steps_per_loop,
                       until_step - self.global_step)
            if self.train_sampler is not None:
                # Step keys are derived inside the compiled loop from the
                # ABSOLUTE step number: resume-stable.
                self.state, step_metrics = self.trainer.train_steps_sampled(
                    self.state, self.train_sampler, loop,
                    seed=self.sample_seed)
                for _ in range(loop):
                    timer.step()
            elif self.fuse_loop:
                stacked = self.trainer.stack_batches(
                    [next(self.train_iter) for _ in range(loop)])
                self.state, step_metrics = self.trainer.train_steps(
                    self.state, stacked)
                for _ in range(loop):
                    timer.step()
            else:
                for _ in range(loop):
                    batch = next(self.train_iter)
                    self.state, step_metrics = self.trainer.train_step(
                        self.state, batch)
                    timer.step()
            if self._pending is not None:
                metrics = self._flush_loop_metrics(*self._pending, timer)
                # Clear BEFORE the next blocking call: global_step below
                # materializes this loop's device step and can raise —
                # train()'s handler must not re-flush what just flushed.
                self._pending = None
            step = self.global_step
            self._pending = (step, loop, step_metrics)
            if self.checkpoint_manager is not None \
                    and self.checkpoint_manager.would_save(step):
                # A checkpoint must never outlive its summary: a SIGKILL
                # after the (async-finalized) save but before the write
                # would leave a resumed run with a permanent metrics gap
                # at exactly the restore step (the deferred flush only
                # covers exceptions, not kill -9).  So on save loops —
                # rare — the summary is written FIRST, giving up the
                # dispatch overlap once per interval.
                metrics = self._flush_loop_metrics(*self._pending, timer)
                self._pending = None
                # save_async snapshots the state to fresh device buffers
                # and fetches them to host on a background thread — the
                # next loop's dispatch (which DONATES self.state) proceeds
                # immediately instead of stalling for the fetch (~80 s on
                # a 12 MB/s tunneled link; measured in docs/BENCHMARKS.md
                # "Checkpoint-save stall").
                self.checkpoint_manager.save_async(step, self.state)
        return metrics

    def _flush_loop_metrics(self, step: int, loop: int, step_metrics,
                            timer) -> Dict[str, float]:
        """Materialize one loop's device metrics (blocking) and write/log
        them — called AFTER the next loop has been dispatched."""
        metrics = {k: float(v) for k, v in step_metrics.items()}
        metrics.update(timer.metrics())
        if self.summary_interval and step % self.summary_interval < loop:
            self.metrics_writer.write(step, metrics)
        log.info("step %d: %s", step, metrics)
        return metrics

    def evaluate(self) -> Dict[str, float]:
        assert self.evaluator is not None
        return self.evaluator.evaluate(self.state)

    def evaluate_continuously(self, timeout: float = 70000,
                              poll_seconds: float = 10.0
                              ) -> Dict[str, float]:
        """Evaluate every new checkpoint until none appears for `timeout`s."""
        assert self.evaluator is not None
        assert self.checkpoint_manager is not None
        results: Dict[str, float] = {}
        for step in self.checkpoint_manager.checkpoints_iterator(
                timeout, poll_seconds):
            # __init__ already restored the latest checkpoint, and the
            # iterator's FIRST yield is that same step — skip the second
            # read of the same checkpoint (minutes on a slow store).
            # _restored_step (not state.step) is the marker: a template
            # whose step value happens to equal a new checkpoint's label
            # was never actually restored.
            if self._restored_step != step:
                self.state = self._restore(self.state, step=step)
                self._restored_step = step
            results = self.evaluator.evaluate(self.state)
            self.metrics_writer.write(step, results)
        return results

    def save_checkpoint(self, force: bool = True) -> None:
        if self.checkpoint_manager is not None:
            self.checkpoint_manager.save(self.global_step, self.state,
                                         force=force)
            self.checkpoint_manager.wait_until_finished()

    def close(self) -> None:
        self.metrics_writer.close()
        if self.checkpoint_manager is not None:
            self.checkpoint_manager.close()
