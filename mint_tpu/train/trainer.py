"""Data-parallel training step (the reference SingleTaskTrainer, TPU-native).

Reference semantics (mint/ctl/single_task_trainer.py:138-199):

- pop the `target` off the batch, forward, mean L2 loss
- the per-replica ``loss / num_replicas`` + summed gradients of the TF
  version is numerically the plain global mean here — jit over a sharded
  batch computes exactly ``mean(loss over global batch)`` with XLA inserting
  the gradient all-reduce
- optional clip-by-global-norm (trainer.py flag `grad_clip_norm`)
- Adam with a schedule (trainer.py:149-150)
- metrics: total_loss / loss / reg_loss / learning_rate
  (single_task_trainer.py:190-196).  FACT has no regularization losses, so
  reg_loss is identically 0.

The whole update is one jit-compiled function over the (data, model) mesh;
sharding annotations on params and batch drive XLA's collective placement.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from mint_tpu.models.fact import FACT, l2_loss
from mint_tpu.parallel import mesh as mesh_lib
from mint_tpu.train.schedules import Schedule


class TrainState(NamedTuple):
    step: jax.Array          # i32 scalar
    params: Any
    opt_state: Any


class Trainer:
    """Owns the optimizer, shardings, and the compiled train step."""

    def __init__(self,
                 model: FACT,
                 learning_rate: Schedule,
                 grad_clip_norm: float = 0.0,
                 label_key: str = "target",
                 loss_fn: Callable = l2_loss,
                 mesh=None,
                 accumulate_steps: int = 1,
                 adam_epsilon: float = 1e-7,
                 loop_unroll: int = 1):
        """`accumulate_steps` > 1 averages gradients over that many
        micro-batches before applying the optimizer (optax MultiSteps) —
        large effective batches without the memory.  NOTE: with
        accumulation, LR-schedule steps count OPTIMIZER UPDATES (one per
        k micro-batches), so config boundaries like "drop at 100k" mean
        100k updates; the logged learning_rate metric reflects that."""
        self.model = model
        self.schedule = learning_rate
        self.label_key = label_key
        self.loss_fn = loss_fn
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh()
        self.accumulate_steps = accumulate_steps
        # lax.scan unroll for the fused multi-step loops (train_steps /
        # train_steps_sampled).  Same lever as the decoder's unroll: the
        # emitter can schedule across step boundaries.  1 = off.
        self.loop_unroll = max(1, int(loop_unroll))

        # eps default 1e-7 = tf.keras Adam's default (the reference's
        # optimizer, trainer.py:150); optax's own default is 1e-8.
        tx = [optax.scale_by_adam(eps=adam_epsilon)]
        if grad_clip_norm and grad_clip_norm > 0.0:
            tx.insert(0, optax.clip_by_global_norm(grad_clip_norm))
        tx.append(optax.scale_by_learning_rate(learning_rate))
        self.optimizer = optax.chain(*tx)
        if accumulate_steps > 1:
            self.optimizer = optax.MultiSteps(
                self.optimizer, every_k_schedule=accumulate_steps)

        self._step_fn = None
        self._multi_fn: Dict[int, Any] = {}
        import weakref
        self._sampled_fn: "weakref.WeakKeyDictionary" = \
            weakref.WeakKeyDictionary()

    def init_state(self, params) -> TrainState:
        """Build a TrainState with params/opt state laid out on the mesh."""
        import numpy as np
        shardings = mesh_lib.params_shardings(params, self.mesh)
        # Detach from the caller's buffers via host memory: device_put of
        # a device array can alias its buffer into a replica (even with
        # may_alias=False), and the donated train step would then delete
        # the caller's params out from under them.
        params = jax.tree_util.tree_map(np.asarray, params)
        params = jax.device_put(params, shardings)
        # Sharding propagation gives Adam moments (zeros_like(param)) the
        # param's layout; counters come out replicated.
        opt_state = jax.jit(self.optimizer.init)(params)
        # Scalars (clip/schedule counters) come out single-device; move every
        # leaf not already laid out across the full mesh to replicated.
        mesh_devices = set(self.mesh.devices.flat)

        def ensure_on_mesh(leaf):
            if set(leaf.sharding.device_set) != mesh_devices:
                return jax.device_put(leaf, mesh_lib.replicated(self.mesh))
            return leaf

        opt_state = jax.tree_util.tree_map(ensure_on_mesh, opt_state)
        step = jax.device_put(jnp.zeros((), jnp.int32),
                              mesh_lib.replicated(self.mesh))
        return TrainState(step=step, params=params, opt_state=opt_state)

    def shard_batch(self, batch: Dict[str, jax.Array]):
        """Shard numeric features across the data axis.

        Non-numeric fields (clip/music name strings kept by the input
        pipeline for eval parity) are dropped — the train step consumes
        only tensors (reference single_task_trainer.py:141-155).

        Multi-host: each process passes its LOCAL slice of the global
        batch (per-host batch = global / process_count, see
        tools/train.py) and ``make_array_from_process_local_data``
        assembles the global sharded array — hosts contribute DIFFERENT
        examples, which is what data parallelism across hosts means.
        ``device_put`` with a cross-process sharding would instead demand
        identical data on every host.
        """
        import numpy as np
        sharding = mesh_lib.batch_sharding(self.mesh)
        multiprocess = jax.process_count() > 1
        out = {}
        for key, value in batch.items():
            arr = np.asarray(value)
            if arr.dtype.kind in "fiub":
                if multiprocess:
                    out[key] = jax.make_array_from_process_local_data(
                        sharding, arr)
                else:
                    out[key] = jax.device_put(arr, sharding)
        return out

    def _make_step_fn(self):
        model = self.model
        optimizer = self.optimizer
        schedule = self.schedule
        label_key = self.label_key
        loss_fn = self.loss_fn

        accumulate_steps = self.accumulate_steps

        def step_fn(state: TrainState, batch: Dict[str, jax.Array]
                    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
            batch = dict(batch)
            target = batch.pop(label_key)

            def compute_loss(params):
                output = model.apply(params, batch)
                return jnp.mean(loss_fn(target, output))

            loss, grads = jax.value_and_grad(compute_loss)(state.params)
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(step=state.step + 1, params=params,
                                   opt_state=opt_state)
            # With accumulation, the schedule advances once per applied
            # optimizer update, not per micro-batch.
            metrics = {
                "total_loss": loss,
                "loss": loss,
                "reg_loss": jnp.zeros((), jnp.float32),
                "learning_rate": schedule(state.step // accumulate_steps),
            }
            return new_state, metrics

        return step_fn

    def _state_shardings(self, state: TrainState):
        return jax.tree_util.tree_map(lambda x: x.sharding, state)

    def _build_step(self, state: TrainState, batch):
        state_shardings = self._state_shardings(state)
        batch_shardings = jax.tree_util.tree_map(
            lambda x: mesh_lib.batch_sharding(self.mesh), batch)
        return jax.jit(
            self._make_step_fn(),
            in_shardings=(state_shardings, batch_shardings),
            out_shardings=(state_shardings, None),
            donate_argnums=(0,),
        )

    def train_step(self, state: TrainState, batch
                   ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        if self._step_fn is None:
            self._step_fn = self._build_step(state, batch)
        return self._step_fn(state, batch)

    # -- fused multi-step loop -------------------------------------------

    def stack_batches(self, batches) -> Dict[str, Any]:
        """Stack `loop` host batches into [loop, batch, ...] arrays
        (numeric features only, like shard_batch).

        Multi-host: like shard_batch, each process contributes its LOCAL
        slice of every step's global batch, assembled here into global
        sharded arrays — passing raw host numpy into the jitted loop
        would make jit treat the local slice as the full global batch.
        """
        import numpy as np
        keys = [k for k, v in batches[0].items()
                if np.asarray(v).dtype.kind in "fiub"]
        stacked = {k: np.stack([np.asarray(b[k]) for b in batches])
                   for k in keys}
        if jax.process_count() > 1:
            sharding = mesh_lib.stacked_batch_sharding(self.mesh)
            stacked = {
                k: jax.make_array_from_process_local_data(sharding, v)
                for k, v in stacked.items()}
        return stacked

    def train_steps(self, state: TrainState, stacked: Dict[str, Any]
                    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        """Run ``stacked[...].shape[0]`` train steps as ONE compiled
        ``lax.scan`` dispatch (orbit wraps its steps_per_loop loop in a
        single tf.function the same way).  Numerically the same update
        sequence as `loop` train_step calls; returns the LAST step's
        metrics (matching the per-step loop's reporting).
        """
        loop = next(iter(stacked.values())).shape[0]
        if self._multi_fn.get(loop) is None:
            step_fn = self._make_step_fn()

            def loop_fn(state, stacked):
                def body(s, b):
                    s2, m = step_fn(s, b)
                    return s2, m

                state, ms = jax.lax.scan(body, state, stacked,
                                         unroll=self.loop_unroll)
                last = jax.tree_util.tree_map(lambda x: x[-1], ms)
                return state, last

            state_shardings = self._state_shardings(state)
            stacked_shardings = jax.tree_util.tree_map(
                lambda x: mesh_lib.stacked_batch_sharding(self.mesh),
                stacked)
            self._multi_fn[loop] = jax.jit(
                loop_fn,
                in_shardings=(state_shardings, stacked_shardings),
                out_shardings=(state_shardings, None),
                donate_argnums=(0,),
            )
        return self._multi_fn[loop](state, stacked)

    def train_steps_sampled(self, state: TrainState, dataset,
                            loop: int, seed: int = 0
                            ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        """Run `loop` train steps as ONE compiled ``lax.scan`` whose
        batches are sampled ON-DEVICE from a
        :class:`~mint_tpu.data.device_dataset.DeviceDataset` — zero
        per-step host->device input traffic (the whole corpus lives in
        HBM).  Each step's PRNG key is ``fold_in(PRNGKey(seed),
        absolute_step)``, so a preemption-resumed run draws exactly the
        windows the uninterrupted run would have drawn.
        """
        # Weak-keyed per-dataset cache: a strong id()-keyed entry would
        # pin every retired dataset's multi-GB HBM stores for the
        # Trainer's lifetime.  The closure must NOT hold the bound
        # method `dataset.sample` — value -> bound method -> key would
        # make the weak entry immortal — so it closes over the UNBOUND
        # function plus a weakref, dereferenced only at trace time
        # (while the caller necessarily holds the dataset).
        import weakref
        per_dataset = self._sampled_fn.setdefault(dataset, {})
        cache_key = (int(loop), int(seed))
        if per_dataset.get(cache_key) is None:
            step_fn = self._make_step_fn()
            sample_unbound = type(dataset).sample
            dataset_ref = weakref.ref(dataset)

            def loop_fn(state, arrays):
                base = jax.random.PRNGKey(seed)
                steps = state.step + jnp.arange(loop, dtype=jnp.int32)
                keys = jax.vmap(lambda s: jax.random.fold_in(base, s))(steps)

                def body(s, k):
                    return step_fn(s, sample_unbound(dataset_ref(), arrays,
                                                     k))

                state2, ms = jax.lax.scan(body, state, keys,
                                          unroll=self.loop_unroll)
                last = jax.tree_util.tree_map(lambda x: x[-1], ms)
                return state2, last

            state_shardings = self._state_shardings(state)
            # Stores may be replicated or sharded over the data axis
            # (DeviceDataset shard_over_data) — keep their own layout.
            array_shardings = jax.tree_util.tree_map(
                lambda a: a.sharding, dataset.arrays)
            per_dataset[cache_key] = jax.jit(
                loop_fn,
                in_shardings=(state_shardings, array_shardings),
                out_shardings=(state_shardings, None),
                donate_argnums=(0,),
            )
        return per_dataset[cache_key](state, dataset.arrays)
