"""Regression tests for the driver's entry contract (__graft_entry__.py).

Round 1's only RED gate was a bootstrap bug in this file; nothing in the
suite would have caught its reintroduction.  These tests pin both halves
of the contract:

- ``_dryrun_impl`` directly on the suite's 8-device CPU mesh (the sharded
  DPxTP train step plus both device-corpus sampling modes), and
- ``dryrun_multichip`` end-to-end from a subprocess that sees only ONE
  device, forcing the self-bootstrapping re-exec path the real driver
  takes when it sees a single TPU chip.
"""

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def test_dryrun_impl_on_test_mesh():
    import __graft_entry__ as g

    g._dryrun_impl(8)  # raises on any sharding/compile regression


def test_dryrun_multichip_bootstraps_from_single_device():
    """The driver calls dryrun_multichip(n) from a process whose backend
    has fewer than n devices; it must re-exec onto a virtual CPU mesh."""
    code = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert jax.device_count() == 1, jax.device_count()\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(2)\n"
        "print('BOOTSTRAP_OK')\n"
    )
    env = dict(os.environ)
    # Make sure the parent's forced device count doesn't leak in.
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count"))
    proc = subprocess.run(
        [sys.executable, "-c", code, _REPO], env=env, cwd=_REPO,
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr
    assert "BOOTSTRAP_OK" in proc.stdout, (proc.stdout, proc.stderr)


def test_entry_returns_jittable_fn():
    """entry() must hand the driver a (fn, args) pair it can trace.

    Full-model CPU compile is slow, so pin the cheap invariants: the pair
    unpacks, args match the flagship shapes, and fn traces eagerly on
    zeros via jax.eval_shape (catches signature/shape regressions without
    paying XLA compilation).
    """
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    params, batch = args
    assert batch["motion_input"].shape == (2, 120, 225)
    assert batch["audio_input"].shape == (2, 240, 35)
    out = jax.eval_shape(fn, *args)
    assert out.shape == (2, 360, 225), out.shape
