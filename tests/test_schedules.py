"""LR schedule tests, including the reference's golden values."""

import numpy as np
import pytest

from mint_tpu.config import load_pipeline_config
from mint_tpu.train import schedules

import os
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = os.path.join(REPO, "configs", "fact_v5_deeper_t10_cm12.config")


def test_cosine_with_warmup_golden():
    """Golden values from reference learning_schedules_test.py:28-30."""
    sched = schedules.cosine_decay_with_warmup(
        initial_learning_rate=1.0, steps=10, warmup=4, alpha=1e-4)
    got = [float(sched(i)) for i in range(10)]
    want = [0.0, 0.33, 0.66, 1.0, 0.933, 0.750, 0.500, 0.25, 0.067, 1e-4]
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)


def test_manual_stepping_shipped_config():
    """LR 1e-4 -> 1e-5 @100k -> 1e-6 @150k (shipped config)."""
    sched = schedules.manual_stepping([100000, 150000], [1e-4, 1e-5, 1e-6])
    assert float(sched(0)) == pytest.approx(1e-4)
    assert float(sched(99999)) == pytest.approx(1e-4)
    assert float(sched(100000)) == pytest.approx(1e-5)
    assert float(sched(149999)) == pytest.approx(1e-5)
    assert float(sched(150000)) == pytest.approx(1e-6)
    assert float(sched(2_400_000)) == pytest.approx(1e-6)


def test_manual_stepping_warmup():
    """Per-step linear warmup to the first boundary
    (learning_schedules.py:42-50)."""
    sched = schedules.manual_stepping([10, 20], [0.0, 1.0, 0.5], warmup=True)
    # slope = (1.0 - 0.0) / 10 = 0.1 per step
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(5)) == pytest.approx(0.5)
    assert float(sched(9)) == pytest.approx(0.9)
    assert float(sched(10)) == pytest.approx(1.0)
    assert float(sched(19)) == pytest.approx(1.0)
    assert float(sched(20)) == pytest.approx(0.5)


def test_manual_stepping_validation():
    with pytest.raises(ValueError, match="strictly increasing"):
        schedules.manual_stepping([10, 5], [1.0, 0.5, 0.1])
    with pytest.raises(ValueError, match="exceed"):
        schedules.manual_stepping([10], [1.0])
    with pytest.raises(ValueError, match="First step cannot be zero"):
        schedules.manual_stepping([0, 5], [1.0, 0.5, 0.1])


def test_warmup_wrapper():
    base = schedules.constant(0.5)
    sched = schedules.warmup(1.0, base, warmup_steps=10)
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(5)) == pytest.approx(0.5)
    assert float(sched(10)) == pytest.approx(0.5)  # hands off to base
    assert float(sched(100)) == pytest.approx(0.5)


def test_polynomial_decay():
    sched = schedules.polynomial_decay(1.0, 10, end_learning_rate=0.1,
                                       power=1.0)
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(5)) == pytest.approx(0.55)
    assert float(sched(10)) == pytest.approx(0.1)
    assert float(sched(100)) == pytest.approx(0.1)


def test_from_config_manual_step():
    pipeline = load_pipeline_config(CONFIG)
    sched = schedules.from_config(pipeline.train_config.learning_rate)
    assert float(sched(0)) == pytest.approx(1e-4)
    assert float(sched(120000)) == pytest.approx(1e-5)
