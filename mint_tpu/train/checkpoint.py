"""Checkpointing via Orbax (reference: tf.train.CheckpointManager usage,
trainer.py:168-173 — save every 1000 steps, keep 5; evaluator restores and
polls the directory).
"""

from __future__ import annotations

import os
import threading
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


@jax.jit
def _copy_arrays(arrays):
    """One compiled dispatch copying every array into FRESH device
    buffers (sharding preserved by propagation; jit never aliases
    outputs to non-donated inputs) — per-leaf copies would pay the
    per-dispatch link latency hundreds of times on a tunneled device."""
    return [jnp.copy(a) for a in arrays]


def _copy_tree(tree):
    """Snapshot a pytree: ``jax.Array`` leaves are copied on-device;
    every other leaf (python ints/floats, e.g. injected optimizer
    hyperparams) passes through UNCHANGED so a checkpoint written by
    :meth:`CheckpointManager.save_async` is byte-compatible with one
    written by the synchronous :meth:`CheckpointManager.save` — jitting
    the whole tree would silently promote scalar leaves to device
    arrays."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    is_arr = [isinstance(leaf, jax.Array) for leaf in leaves]
    arrays = [leaf for leaf, a in zip(leaves, is_arr) if a]
    copied = iter(_copy_arrays(arrays)) if arrays else iter(())
    out = [next(copied) if a else leaf for leaf, a in zip(leaves, is_arr)]
    return jax.tree_util.tree_unflatten(treedef, out)


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for TrainState pytrees."""

    def __init__(self, directory: str, save_interval_steps: int = 1000,
                 max_to_keep: int = 5, async_join_grace: float = 1.0):
        self.directory = os.path.abspath(directory)
        self.save_interval_steps = save_interval_steps
        #: How long a non-forced :meth:`save_async` waits for a previous
        #: save's background drain before DEFERRING (returning False)
        #: instead of blocking — see :meth:`save_async`.
        self.async_join_grace = async_join_grace
        os.makedirs(self.directory, exist_ok=True)
        self._save_thread: Optional[threading.Thread] = None
        self._save_exc: Optional[BaseException] = None
        self._inflight_step: Optional[int] = None
        # The drain thread we already paid `async_join_grace` for:
        # later offers against the SAME drain defer instantly instead
        # of re-paying the grace at every loop boundary (once the
        # interval elapses, would_save is True at every boundary, so a
        # long drain would otherwise collect ~1 s of idle device per
        # ~3 s boundary — a ~30% stall through the overrun window).
        self._graced_thread: Optional[threading.Thread] = None
        # Interval gating is done HERE with tf.train.CheckpointManager
        # semantics ("interval elapsed since the last save"), not via
        # orbax's save_interval_steps option: orbax's FixedIntervalPolicy
        # only fires on exact step multiples, and the controller offers
        # steps at loop boundaries (1, 1+loop, ...) which need never hit a
        # multiple — the reference's orbit/TF manager saves whenever the
        # interval has elapsed.
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)
        # Local mirror of the manager's registered steps: `would_save`
        # reads THIS (plus `_inflight_step`) instead of calling
        # `_mgr.all_steps()/latest_step()` while a background
        # :meth:`save_async` thread may be inside `_mgr.save()` — orbax
        # managers are not documented thread-safe, so the training thread
        # never touches `_mgr` concurrently with the save thread.
        # Eviction (max_to_keep) may leave stale entries here; only the
        # max matters (training steps are monotone), and blocking entry
        # points (save/restore/latest_step) re-sync after joining.
        self._known_steps = set(self._mgr.all_steps())

    def join_async_save(self) -> None:
        """Block until an in-flight :meth:`save_async` has handed off to
        orbax (its device→host fetch is done), re-raising its failure."""
        t = self._save_thread
        if t is not None:
            t.join()
            self._save_thread = None
            self._graced_thread = None
            step, self._inflight_step = self._inflight_step, None
            if self._save_exc is not None:
                exc, self._save_exc = self._save_exc, None
                raise exc
            if step is not None:
                self._known_steps.add(step)

    def would_save(self, step: int, force: bool = False) -> bool:
        """Whether :meth:`save` would write a checkpoint at `step` —
        lets callers order work that must precede a save (e.g. the
        controller writes the step's summary first: a checkpoint must
        never outlive its summary)."""
        # Deliberately non-blocking while a save_async is in flight (the
        # controller asks at EVERY loop boundary — joining here would move
        # the save stall to the next boundary instead of removing it):
        # the in-flight step stands in for its not-yet-registered
        # directory entry, and the locally mirrored `_known_steps` stands
        # in for `_mgr.all_steps()` (never call into orbax concurrently
        # with the save thread).
        inflight = self._inflight_step
        if step == inflight or step in self._known_steps:
            return False  # already saved (e.g. force-save after interval)
        last = max(self._known_steps) if self._known_steps else None
        if inflight is not None:
            last = inflight if last is None else max(last, inflight)
        return force or last is None \
            or step - last >= self.save_interval_steps

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        self.join_async_save()
        self._known_steps.update(self._mgr.all_steps())
        if not self.would_save(step, force):
            return False
        saved = self._mgr.save(step, args=ocp.args.StandardSave(state),
                               force=True)
        if saved:
            self._known_steps.add(step)
        return saved

    def save_async(self, step: int, state: Any, force: bool = False) -> bool:
        """Save without stalling the caller on the device→host fetch.

        Orbax's "async" checkpointing only backgrounds the FILE write —
        ``save()`` still fetches every array to the host synchronously,
        which through a slow device link is the whole stall (~80 s for a
        full TrainState on a 12 MB/s tunnel, docs/BENCHMARKS.md).  This
        snapshots `state` into fresh device buffers (one cheap on-device
        dispatch) and runs the fetch + orbax save on a background
        thread, so the caller may immediately re-dispatch training —
        including donating `state`'s buffers — while the fetch rides
        the link.  The background fetch is PER-LEAF (see `_run`): one
        batched fetch would saturate the link and block every other
        transfer behind it — measured 82 s of lost training per save vs
        2.8 s per-leaf (drag 1.1%), for a 97 → 255 s longer drain
        window on a 12 MB/s tunnel (`scripts/exp_save_drag.py`).

        At most one save is in flight.  A non-forced save offered while
        the previous drain is still in flight waits up to
        `async_join_grace` (default 1 s — healthy links drain far
        faster, so eligible boundaries still save every interval;
        paid ONCE per drain — later offers against the same drain
        defer immediately) and
        then returns False — DEFERRED, not blocked: on links where the
        drain exceeds the save cadence, joining would stall training
        for drain-minus-cadence at every save.  Callers that offer
        saves periodically (the controller offers at every loop
        boundary) land the save at the first offer after the drain;
        the effective cadence is max(interval, drain), the physically
        achievable rate of the link.  Forced saves, restore / wait /
        close still join outright and re-raise the joined save's
        failure.  `would_save` stays non-blocking — it counts the
        in-flight step as saved.

        MULTI-PROCESS runs fall back to the synchronous :meth:`save`:
        orbax's multi-process save runs cross-process barriers (commit
        coordination, metadata validation) over the SAME distributed
        runtime the training collectives use, and interleaving those two
        collective streams from different threads has no ordering
        guarantee — in practice it deadlocks training at the first
        interval checkpoint (every worker completes the save, then
        freezes in training collectives; reproduced and bisected in the
        round-4 review).  The synchronous path still backgrounds the
        FILE write with correct multihost coordination
        (``enable_async_checkpointing``); only the device→host fetch is
        paid on the training thread — correct first, overlapped where
        it is safe (single-process).

        The save thread is NON-daemon: a process that exits without
        calling :meth:`close`/:meth:`wait_until_finished` (the
        controller does) still waits for the in-flight fetch at
        interpreter shutdown instead of silently dropping the
        checkpoint — orbax's atomic rename prevents corruption but not
        loss.

        Cost: the snapshot doubles the state's HBM footprint, decaying
        back to 1× as the per-leaf fetch releases each copied buffer
        (~2× 1.4 GB peak for the flagship TrainState — fine on a 16 GB
        chip; for models near the HBM limit use the synchronous
        :meth:`save`).
        """
        if jax.process_count() > 1:
            return self.save(step, state, force)
        if not self.would_save(step, force):
            return False
        t = self._save_thread
        if t is not None and t.is_alive() and not force:
            # A previous save's background drain is still in flight.
            # Joining unconditionally would stall training for the
            # REMAINDER of the drain — on links where the drain exceeds
            # the save cadence (1.4 GB needs ≥117 s through a 12 MB/s
            # tunnel vs an 80 s cadence at interval=1000 × 12.5 steps/s)
            # every save would block for drain-minus-cadence, undoing
            # the async win.  Wait a bounded grace (healthy links drain
            # in well under it, so eligible boundaries still save), then
            # DEFER: the controller re-offers every loop boundary, so
            # the save lands at the first boundary after the drain —
            # effective cadence max(interval, drain), the physically
            # achievable rate of that link.  `force` saves (shutdown)
            # skip the grace and join outright.
            # The grace is paid ONCE per drain: the first offer waits
            # `async_join_grace`; every later offer against the same
            # still-alive thread defers immediately (re-paying 1 s at
            # every ~3 s loop boundary through a 175 s overrun window
            # would stall ~30% of the device, dwarfing the 1.1% drag
            # the async path exists for).
            if t is not self._graced_thread:
                t.join(timeout=self.async_join_grace)
            if t.is_alive():
                self._graced_thread = t
                return False
        self.join_async_save()  # serialize saves; surface prior failures
        if not self.would_save(step, force):  # re-check post-registration
            return False
        snapshot = _copy_tree(state)

        def _run(snapshot=snapshot):
            try:
                # Fetch the snapshot to host NumPy ONE LEAF AT A TIME
                # before handing orbax a pure-host tree.  Handing orbax
                # the device snapshot lets its StandardSave fetch every
                # array in one batched replica-read, which saturates a
                # slow device link for the whole transfer — anything
                # else needing the link (the training loop's metric
                # sync, eval traffic) queues behind all 1.4 GB of it: a
                # measured 82 s blocked training loop per save on a
                # 12 MB/s tunnel.  Per-leaf transactions leave
                # inter-leaf gaps where those transfers interleave —
                # measured drag 1.1% (2.8 s lost per save) at the cost
                # of a longer drain (97 → 255 s on that link;
                # scripts/exp_save_drag.py, docs/BENCHMARKS.md
                # "Checkpoint-save stall").  Each device buffer is
                # released as its host copy lands, so the 2× HBM
                # footprint also decays over the drain instead of
                # persisting through it.
                leaves, treedef = jax.tree_util.tree_flatten(snapshot)
                snapshot = None
                host = []
                for i, leaf in enumerate(leaves):
                    host.append(np.asarray(leaf)
                                if isinstance(leaf, jax.Array) else leaf)
                    leaves[i] = None
                host_tree = jax.tree_util.tree_unflatten(treedef, host)
                self._mgr.save(step, args=ocp.args.StandardSave(host_tree),
                               force=True)
            except BaseException as exc:  # re-raised at the next join
                self._save_exc = exc

        self._inflight_step = step
        self._save_thread = threading.Thread(
            target=_run, name=f"ckpt-save-{step}", daemon=False)
        self._save_thread.start()
        return True

    def latest_step(self) -> Optional[int]:
        self.join_async_save()
        self._known_steps.update(self._mgr.all_steps())
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure/shardings of `state_template`."""
        self.join_async_save()
        self._known_steps.update(self._mgr.all_steps())
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        target = jax.tree_util.tree_map(
            lambda x: ocp.utils.to_shape_dtype_struct(x), state_template)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(target))

    def restore_params(self, params_template: Any,
                       step: Optional[int] = None) -> Any:
        """Restore ONLY the model params (reference evaluator.py:64-67
        restores model weights + global_step, never the optimizer).

        A partial PyTree restore against the step directory: the Adam
        state is ~2/3 of a TrainState checkpoint's bytes (m + v), so a
        continuous eval that full-restored per checkpoint paid 3x the
        necessary read I/O — minutes per pass on a slow store.  The
        template (abstract shapes/dtypes suffice, e.g.
        ``models.fact.abstract_params``) names which subtree to read.
        Uses a standalone checkpointer so it works on a manager that
        has also SAVED in this process (the manager's handler registry
        binds the save-time args type)."""
        self.join_async_save()
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        target = {"params": jax.tree_util.tree_map(
            lambda x: ocp.utils.to_shape_dtype_struct(x), params_template)}
        path = os.path.join(self.directory, str(step), "default")
        with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ck:
            out = ck.restore(path, args=ocp.args.PyTreeRestore(
                item=target, partial_restore=True))
        return out["params"]

    def wait_until_finished(self) -> None:
        self.join_async_save()
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self.join_async_save()
        self._mgr.close()

    def checkpoints_iterator(self, timeout: float,
                             poll_seconds: float = 10.0):
        """Yield new checkpoint steps as they appear (evaluator-side;
        reference `evaluate_continuously(timeout=...)`, evaluator.py:71).

        Like ``tf.train.checkpoints_iterator`` (which wraps
        ``wait_for_new_checkpoint(dir, last_checkpoint=None)``), the first
        yield is the CURRENT LATEST checkpoint — older checkpoints already
        in the directory are not replayed; after that, every newer step is
        yielded in order.
        """
        seen = set()
        first = True
        deadline = time.time() + timeout
        while time.time() < deadline:
            self._mgr.reload()
            all_steps = sorted(self._mgr.all_steps())
            if first and all_steps:
                seen.update(all_steps[:-1])
                first = False
            steps = [s for s in all_steps if s not in seen]
            for s in steps:
                seen.add(s)
                yield s
                # Re-arm AFTER the consumer's eval pass returns control:
                # tf.train.checkpoints_iterator counts only time spent
                # WAITING toward the timeout, not time the consumer
                # spends evaluating — an eval pass longer than the
                # timeout must not end a continuous eval while training
                # is still producing checkpoints.
                deadline = time.time() + timeout
            if not steps:
                time.sleep(poll_seconds)
