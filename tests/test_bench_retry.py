"""bench.py's retry orchestration (the driver's scoreboard artifact).

The tunneled TPU worker fails two ways: the child CRASHES (transient
signatures on stderr / signal kills) or the child HANGS without output
(the sitecustomize's PJRT registration blocks at interpreter start
while the tunnel is down — observed for >1 h straight).  Both must be
retried in a fresh process; deterministic failures must surface at
once.  These tests never touch jax.

Stand-in children run with ``-S``: a plain ``python -c`` inherits the
sitecustomize, whose TPU-plugin registration can block for seconds
whenever anything else holds the single-tenant chip — which made the
short-deadline tests flaky next to a live bench run.  The children
only need stdlib, so skipping site init makes them hermetic.
"""

import subprocess
import sys
import time

import pytest

import bench


class TestRunAttempt:
    def test_clean_exit_streams_and_captures_stderr(self):
        rc, stderr, hung = bench._run_attempt(
            [sys.executable, "-S", "-c",
             "import sys; sys.stderr.write('warming up\\n')"],
            env=None, cwd=None, timeout_s=60)
        assert rc == 0 and not hung
        assert "warming up" in stderr

    def test_nonzero_exit_reported(self):
        rc, stderr, hung = bench._run_attempt(
            [sys.executable, "-S", "-c",
             "import sys; sys.stderr.write('UNAVAILABLE: socket closed\\n');"
             "sys.exit(3)"],
            env=None, cwd=None, timeout_s=60)
        assert rc == 3 and not hung
        assert "UNAVAILABLE" in stderr

    def test_hang_is_killed_at_the_deadline(self):
        t0 = time.perf_counter()
        rc, stderr, hung = bench._run_attempt(
            [sys.executable, "-S", "-c", "import time; time.sleep(600)"],
            env=None, cwd=None, timeout_s=2)
        assert hung
        assert rc != 0  # killed
        assert time.perf_counter() - t0 < 30

    def test_hang_kill_takes_out_grandchildren(self):
        """The deadline kill must take the WHOLE process tree: a
        child-spawned helper that survived a plain kill() would keep the
        stderr pipe open and can keep holding the single-tenant TPU,
        making every retry hit the same failure."""
        import os

        rc, stderr, hung = bench._run_attempt(
            [sys.executable, "-S", "-c",
             "import subprocess, sys, os, time\n"
             "sys.stderr.write('PID %d\\n' % os.getpid())\n"
             "sys.stderr.flush()\n"
             "subprocess.Popen([sys.executable, '-S', '-c',"
             " 'import time; time.sleep(600)'])\n"
             "time.sleep(600)"],
            env=None, cwd=None, timeout_s=3)
        assert hung
        pgid = int(stderr.split("PID", 1)[1].split()[0])
        # start_new_session makes the child the process-group leader;
        # after the kill the whole group must be gone.
        deadline = time.perf_counter() + 15
        while time.perf_counter() < deadline:
            try:
                os.killpg(pgid, 0)
            except ProcessLookupError:
                return  # whole tree dead
            time.sleep(0.2)
        import signal
        os.killpg(pgid, signal.SIGKILL)  # cleanup before failing
        raise AssertionError("process group survived the deadline kill")


class TestMainWithRetry:
    def _patch(self, monkeypatch, outcomes):
        calls = []

        def fake_run_attempt(cmd, env, cwd, timeout_s):
            calls.append(timeout_s)
            return outcomes[len(calls) - 1]

        monkeypatch.setattr(bench, "_run_attempt", fake_run_attempt)
        monkeypatch.setattr(bench.time, "sleep", lambda s: None)
        return calls

    def test_hang_retries_in_fresh_process(self, monkeypatch):
        calls = self._patch(monkeypatch, [(-9, "", True), (0, "", False)])
        bench.main_with_retry(attempts=3, backoff_s=0)
        assert len(calls) == 2

    def test_transient_signature_retries(self, monkeypatch):
        calls = self._patch(
            monkeypatch,
            [(1, "tpu worker process crashed or restarted", False),
             (0, "", False)])
        bench.main_with_retry(attempts=3, backoff_s=0)
        assert len(calls) == 2

    def test_deterministic_failure_fails_fast(self, monkeypatch):
        calls = self._patch(
            monkeypatch, [(1, "ModuleNotFoundError: nope", False)])
        with pytest.raises(SystemExit):
            bench.main_with_retry(attempts=3, backoff_s=0)
        assert len(calls) == 1

    def test_attempts_exhausted_raises(self, monkeypatch):
        calls = self._patch(monkeypatch, [(-9, "", True)] * 3)
        with pytest.raises(SystemExit):
            bench.main_with_retry(attempts=3, backoff_s=0)
        assert len(calls) == 3

    def test_attempt_timeout_env_override(self, monkeypatch):
        monkeypatch.setenv("MINT_BENCH_ATTEMPT_TIMEOUT_S", "123")
        calls = self._patch(monkeypatch, [(0, "", False)])
        bench.main_with_retry(attempts=1, backoff_s=0)
        assert calls == [123.0]
