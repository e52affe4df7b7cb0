"""Learning-rate schedules as pure jnp functions (optax-compatible).

Re-implementations of the reference ``mint/core/learning_schedules.py`` with
identical numerics:

- :func:`manual_stepping` — piecewise-constant with the reference's optional
  per-step linear warmup to the first boundary (learning_schedules.py:19-67).
- :func:`warmup` — polynomial warmup wrapping another schedule
  (learning_schedules.py:70-125).
- :func:`cosine_decay_with_warmup` — linear warmup + cosine decay.  The
  reference class is latently broken (it calls the abstract
  ``super().__call__`` for the decay, learning_schedules.py:166); this is the
  *correct* schedule matching the golden values in
  ``learning_schedules_test.py:28-30``.
- :func:`polynomial_decay` — the Keras PolynomialDecay used by the
  exponential_decay config path in the reference trainer (trainer.py:66-71).

All schedules map an integer step array/scalar to an f32 learning rate and
can be passed directly to ``optax.scale_by_schedule`` /
``optax.inject_hyperparams``.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def manual_stepping(boundaries: Sequence[int], rates: Sequence[float],
                    warmup: bool = False) -> Schedule:
    """Piecewise-constant schedule (reference ManualStepping).

    Args:
      boundaries: strictly-increasing positive step boundaries.
      rates: len(boundaries) + 1 learning rates; rates[i] applies on
        [boundaries[i-1], boundaries[i]).
      warmup: if true, linearly interpolate from rates[0] to rates[1] over
        [0, boundaries[0]) with per-step granularity (reference
        learning_schedules.py:42-50).
    """
    if any(b < 0 for b in boundaries):
        raise ValueError("boundaries must be a list of positive integers")
    if any(bn <= b for bn, b in zip(boundaries[1:], boundaries[:-1])):
        raise ValueError("Entries in boundaries must be strictly increasing.")
    if len(rates) != len(boundaries) + 1:
        raise ValueError("Number of provided learning rates must exceed "
                         "number of boundary points by exactly 1.")
    if boundaries and boundaries[0] == 0:
        raise ValueError("First step cannot be zero.")

    boundaries = list(boundaries)
    rates = [float(r) for r in rates]

    if warmup and boundaries:
        slope = (rates[1] - rates[0]) / boundaries[0]
        first_boundary = boundaries[0]
        rest_bounds = np.asarray(boundaries, dtype=np.int32)
        rest_rates = np.asarray(rates[1:], dtype=np.float32)

        def schedule(step):
            step = jnp.asarray(step)
            warm = rates[0] + slope * jnp.floor(step.astype(jnp.float32))
            idx = jnp.sum(step[..., None] >= rest_bounds, axis=-1) - 1
            stepped = jnp.take(jnp.asarray(rest_rates),
                               jnp.clip(idx, 0, len(rest_rates) - 1))
            return jnp.where(step < first_boundary, warm,
                             stepped).astype(jnp.float32)

        return schedule

    bounds = np.asarray([0] + boundaries, dtype=np.int32)
    rate_arr = np.asarray(rates, dtype=np.float32)

    def schedule(step):
        step = jnp.asarray(step)
        idx = jnp.sum(step[..., None] >= bounds, axis=-1) - 1
        return jnp.take(jnp.asarray(rate_arr), idx).astype(jnp.float32)

    return schedule


def warmup(initial_learning_rate: float, decay_schedule_fn: Schedule,
           warmup_steps: int, power: float = 1.0) -> Schedule:
    """Polynomial warmup wrapper (reference WarmUp)."""

    def schedule(step):
        step_f = jnp.asarray(step).astype(jnp.float32)
        pct = step_f / float(warmup_steps)
        warm_lr = initial_learning_rate * jnp.power(pct, power)
        return jnp.where(step_f < warmup_steps, warm_lr,
                         decay_schedule_fn(jnp.asarray(step) - warmup_steps)
                         ).astype(jnp.float32)

    return schedule


def cosine_decay_with_warmup(initial_learning_rate: float, steps: int,
                             warmup: int = 0, alpha: float = 0.0) -> Schedule:
    """Linear warmup then cosine decay.

    Matches the golden values of reference learning_schedules_test.py:28-30:
    warmup lr = step * init / (warmup - 1) for step < warmup, then cosine
    over (steps - warmup) with t = step - warmup + 1.
    """

    def schedule(step):
        step_f = jnp.asarray(step).astype(jnp.float32)
        warm_lr = step_f * initial_learning_rate / max(warmup - 1.0, 1.0)
        t = step_f - warmup + 1.0
        total = max(steps - warmup, 1)
        frac = jnp.clip(t / total, 0.0, 1.0)
        cosine = 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
        decayed = (1.0 - alpha) * cosine + alpha
        return jnp.where(step_f < warmup, warm_lr,
                         initial_learning_rate * decayed).astype(jnp.float32)

    return schedule


def polynomial_decay(initial_learning_rate: float, decay_steps: int,
                     end_learning_rate: float = 0.0,
                     power: float = 1.0) -> Schedule:
    """Keras PolynomialDecay equivalent (reference trainer.py:66-71)."""

    def schedule(step):
        step_f = jnp.minimum(jnp.asarray(step).astype(jnp.float32),
                             float(decay_steps))
        frac = 1.0 - step_f / float(decay_steps)
        return ((initial_learning_rate - end_learning_rate)
                * jnp.power(frac, power)
                + end_learning_rate).astype(jnp.float32)

    return schedule


def constant(learning_rate: float) -> Schedule:
    def schedule(step):
        return jnp.full(jnp.asarray(step).shape, learning_rate,
                        dtype=jnp.float32)

    return schedule


def from_config(lr_config, *, initial_learning_rate: float | None = None,
                warmup_steps: int = 0) -> Schedule:
    """Build a schedule from a LearningRateConfig oneof.

    Mirrors reference trainer._create_learning_rate (trainer.py:49-96),
    including its quirk that the exponential-decay and cosine paths take the
    base LR from the *flag*, not the proto (`initial_learning_rate` here).
    """
    which = lr_config.which()
    if which == "manual_step_learning_rate":
        cfg = lr_config.manual_step_learning_rate
        if not cfg.schedule:
            raise ValueError("Empty learning rate schedule.")
        boundaries = [s.step for s in cfg.schedule]
        rates = [cfg.initial_learning_rate] + [s.learning_rate
                                               for s in cfg.schedule]
        return manual_stepping(boundaries, rates, cfg.warmup)
    if which == "exponential_decay_learning_rate":
        cfg = lr_config.exponential_decay_learning_rate
        base = (initial_learning_rate if initial_learning_rate is not None
                else cfg.initial_learning_rate)
        sched = polynomial_decay(base, cfg.decay_steps,
                                 cfg.min_learning_rate, cfg.decay_factor)
        if warmup_steps:
            sched = warmup(base, sched, warmup_steps)
        return sched
    if which == "cosine_decay_learning_rate":
        cfg = lr_config.cosine_decay_learning_rate
        base = (initial_learning_rate if initial_learning_rate is not None
                else 0.1)
        return cosine_decay_with_warmup(base, cfg.total_steps, warmup_steps)
    if which == "constant_learning_rate":
        return constant(lr_config.constant_learning_rate.learning_rate)
    raise ValueError(f"Learning_rate {which} not supported.")
