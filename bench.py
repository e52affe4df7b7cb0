"""Headline benchmark: batched autoregressive dance generation throughput.

Protocol (BASELINE.json config #4): 40 clips x 1200 generated frames with
the flagship fact_v5_deeper_t10_cm12 model, sliding-window AR decode
(protocol-identical to reference ``mint/core/fact_model.py:103-132``),
compiled as one ``lax.scan`` and run on a single chip as sequential
batch-``DISPATCH`` programs (small batches decode faster per frame —
see DISPATCH below); throughput = all 40 clips' frames / wall clock to
host materialization of every clip.

Baseline anchor: the reference's decode is an eager Python loop on CPU, one
full 360-token forward per frame, batch 1 (``evaluator.py:80`` forces eager;
``mint/ctl/single_task_evaluator.py:69`` runs it).  Measured here via the
same protocol (eager per-frame forward, batch 1, CPU f32, this host):
0.53 frames/sec.  BASELINE.md's north star is >=50x that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

REFERENCE_CPU_FRAMES_PER_SEC = 0.53  # measured, see module docstring

BATCH = 40
STEPS = 1200
# The 40-clip protocol runs as sequential dispatches of this size:
# per-frame decode throughput FALLS with batch on this chip (bf16 full
# protocol, same process: batch 20 = 1745 f/s, batch 40 = 1616 f/s —
# docs/BENCHMARKS.md "Decode batch sweep", scripts/exp_bench_batch.py),
# so two batch-20 dispatches finish the same 40 clips ~8% sooner than
# one batch-40 dispatch.  Same work, same per-clip outputs (to float
# rounding: XLA's reduction order varies with the compiled batch shape
# — tests/test_decoder.py::test_batch_split_decode_is_identical); wall
# clock spans dispatch of the first to host materialization of the last.
DISPATCH = 20


def main():
    # All jax work lives in the CHILD process: the parent orchestrator
    # (main_with_retry) must stay jax-free so it can outlive a dead
    # backend, and importing this module (e.g. from tests) must not
    # mutate global jax config.
    import jax
    import jax.numpy as jnp
    import numpy as np

    # Persistent XLA compilation cache: the 1200-step decode scan is a
    # large program and its first compile dominates bench wall time;
    # repeat runs on the same host hit the cache (shared with every CLI
    # entry point).
    from mint_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    from mint_tpu.config.schema import load_pipeline_config
    from mint_tpu.models.fact import FACT, init_params
    from mint_tpu.infer.decoder import infer_auto_regressive

    pipe = load_pipeline_config("configs/fact_v5_deeper_t10_cm12.config")
    model = FACT(pipe.multi_modal_model.fact_model,
                 compute_dtype=jnp.bfloat16)
    params = init_params(model, jax.random.PRNGKey(0))
    # NOT LN-affine-folded: the fold (mint_tpu/models/fold.py) is exact
    # but measured 5% SLOWER at this protocol (1495-1498 vs 1579 f/s,
    # interleaved A/B — docs/BENCHMARKS.md round-3).  MINT_TPU_BENCH_FOLD=1
    # re-runs the folded variant for future hardware A/Bs.
    if os.environ.get("MINT_TPU_BENCH_FOLD"):
        from mint_tpu.models.fold import fold_for_decode
        model, params = fold_for_decode(model, params)

    rng = np.random.default_rng(0)
    motion = jnp.asarray(
        rng.standard_normal((BATCH, 120, 225)), jnp.float32)
    audio = jnp.asarray(
        rng.standard_normal((BATCH, STEPS + 240, 35)), jnp.float32)
    chunks = [{"motion_input": motion[i:i + DISPATCH],
               "audio_input": audio[i:i + DISPATCH]}
              for i in range(0, BATCH, DISPATCH)]

    def decode_all():
        # Queue every dispatch before fetching any: the device runs them
        # in order while the host fetch of chunk k overlaps the compute
        # of chunk k+1.  All 40 clips are materialized on host before
        # the clock stops (the tunneled chip's block_until_ready can
        # return early — np.asarray is the only honest barrier).
        outs = [infer_auto_regressive(model, params, c, steps=STEPS)
                for c in chunks]
        return np.concatenate([np.asarray(o) for o in outs])

    # Warm-up/compile (full host transfer so async dispatch can't lie).
    out = decode_all()

    # Median of 5 timed repeats: the tunneled chip adds per-dispatch
    # latency jitter (±2% run-to-run observed), so a single sample can
    # misreport by a lot; 5 samples keep the median stable when one or
    # two land on a slow chip interval (~30 s each, still < 3 min).
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = decode_all()
        times.append(time.perf_counter() - t0)
    assert out.shape == (BATCH, STEPS, 225) and np.isfinite(out).all()

    fps = BATCH * STEPS / float(np.median(times))
    print(json.dumps({
        "metric": "ar_generation_throughput",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / REFERENCE_CPU_FRAMES_PER_SEC, 1),
    }))


def _run_attempt(cmd, env, cwd, timeout_s):
    """Run one child attempt, streaming its stderr live while capturing
    it.  Returns ``(returncode, stderr_text, hung)`` — `hung` means the
    child neither exited nor could be waited on within `timeout_s` and
    was killed.  The deadline exists because a downed TPU tunnel makes
    the child HANG (the sitecustomize's PJRT registration blocks at
    interpreter start — observed for >1 h straight) rather than crash,
    and a parent blocked on a silent child retries nothing."""
    import signal
    import subprocess
    import sys
    import threading

    # New session so the deadline kill can take out the WHOLE tree: a
    # child-spawned helper (e.g. a tunnel/PJRT subprocess) would survive
    # a plain proc.kill(), keep the stderr pipe open, and can keep
    # holding the single-tenant TPU — making every retry hit the same
    # failure.
    proc = subprocess.Popen(cmd, env=env, cwd=cwd, stderr=subprocess.PIPE,
                            start_new_session=True)
    chunks = []

    def drain():
        assert proc.stderr is not None
        for raw in proc.stderr:
            line = raw.decode(errors="replace")
            chunks.append(line)
            sys.stderr.write(line)
            sys.stderr.flush()

    reader = threading.Thread(target=drain, daemon=True)
    reader.start()
    hung = False
    try:
        proc.wait(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        # The child may have exited exactly at the deadline (wait() can
        # raise before reaping a just-finished child): re-poll before
        # declaring a hang, so a completed run isn't re-executed (the
        # scoreboard contract is ONE printed JSON line).
        if proc.poll() is None:
            hung = True
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                proc.kill()
            proc.wait()
    reader.join(timeout=10)
    return proc.returncode, "".join(chunks), hung


def main_with_retry(attempts: int = 3, backoff_s: float = 180.0):
    """The tunneled chip's worker occasionally restarts mid-run
    (observed: FAILED_PRECONDITION / 'TPU worker process crashed'), and
    it recovers on its own within minutes.  JAX caches the PJRT client
    at first use, so an in-process retry would reuse the DEAD backend —
    each attempt therefore runs in a fresh subprocess (fresh backend
    bring-up); this parent only orchestrates and never touches jax."""
    import sys

    # Only these child-failure signatures are worth a 180 s backoff; a
    # deterministic failure (bad config, import error) surfaces at once.
    # Matched case-insensitively — PJRT surfaces the same condition as
    # e.g. 'FAILED_PRECONDITION' or 'Failed precondition' depending on
    # which layer formats it.
    transient = ("tpu worker process crashed", "failed_precondition",
                 "failed precondition", "unavailable", "deadline_exceeded",
                 "deadline exceeded", "socket closed", "connection reset")

    env = dict(os.environ)
    env["MINT_BENCH_CHILD"] = "1"
    # Per-attempt wall deadline.  A healthy run is well under this even
    # with a cold compile cache (~10 min compile + 6 x ~31 s timed
    # decodes); a child that blows it is hung on the tunnel, not slow.
    attempt_timeout_s = float(
        os.environ.get("MINT_BENCH_ATTEMPT_TIMEOUT_S", 2400))
    for attempt in range(attempts):
        # Stream the child's stderr live (a 30 s compile+run with a silent
        # parent looks hung) while capturing it for signature matching.
        rc, stderr, hung = _run_attempt(
            [sys.executable, os.path.abspath(__file__)], env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            timeout_s=attempt_timeout_s)
        if rc == 0 and not hung:
            return
        # rc < 0 = killed by a signal: the tunnel runtime SIGKILLs the
        # child when the remote worker drops — no signature reaches
        # stderr, but the failure is exactly the transient kind.  (A
        # deterministic OOM-kill also lands here and burns the retries;
        # the printed cause makes that diagnosable.)  A hang past the
        # attempt deadline is the same tunnel failure presenting as
        # silence instead of a crash.
        matched = [sig for sig in transient if sig in stderr.lower()]
        is_transient = hung or rc < 0 or bool(matched)
        cause = ("hung past the %.0f s attempt deadline" % attempt_timeout_s
                 if hung else f"signal {-rc}" if rc < 0
                 else f"matched {matched!r}" if matched
                 else "no transient signature on stderr")
        if attempt == attempts - 1 or not is_transient:
            # The cause must reach stderr even (especially) for the
            # DECISIVE failure — a silent SystemExit after killing a
            # 40-minute-silent child is undiagnosable.
            print(f"# bench attempt {attempt + 1} failed (rc={rc}, "
                  f"{cause}); giving up", flush=True)
            raise SystemExit(rc)
        print(f"# bench attempt {attempt + 1} hit a transient TPU-worker "
              f"failure (rc={rc}, {cause}); retrying in "
              f"{backoff_s:.0f}s in a fresh process", flush=True)
        time.sleep(backoff_s)


if __name__ == "__main__":
    if os.environ.get("MINT_BENCH_CHILD"):
        main()
    else:
        main_with_retry()
