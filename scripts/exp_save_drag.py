"""Probe the async-save drag: can the 1.4 GB background fetch share the
link more politely with training dispatches?

docs/BENCHMARKS.md "Checkpoint-save stall" measured the device-backend
cost of `CheckpointManager.save_async`: steady 12.5 steps/s drops to
~9.7 (~22% drag) while orbax's background device->host fetch drains the
1.4 GB TrainState over the ~12 MB/s tunnel.  Hypothesis: orbax's
StandardSave fetches ALL device arrays in one batched replica-read, so
training dispatches queue behind one saturating transfer; fetching the
snapshot to host NumPy one leaf at a time (each leaf <= ~10 MB, a
separate tunnel transaction) leaves inter-leaf gaps where dispatches
can interleave, and hands orbax pure host arrays (its save then touches
the device not at all).  Pacing can't create bandwidth — the question
is whether the drag is queueing (fixable) or raw byte-cost (the
ceiling).

The per-leaf fetch WON this probe and became the shipped save_async
(commit 2b71615), so the variant names track roles, not history:

Variants (fresh subprocess each; run ALONE on the single-tenant chip):
  batched    the pre-2b71615 baseline, reconstructed: the background
             thread hands orbax the DEVICE snapshot, whose StandardSave
             fetches every array in one batched replica-read (the
             measured 82 s blocked training loop)
  shipped    CheckpointManager.save_async as shipped: the background
             thread fetches the snapshot leaf-by-leaf to NumPy, then
             orbax-saves the pure-host tree
  paced      like shipped, plus a 100 ms sleep between leaf fetches (an
             upper bound on politeness: ~700 leaves -> ~70 s added
             drain)

Protocol: flagship trainer (batch 32, bf16, fused 10-step loops,
device-committed synthetic batches — the --input_backend=device
configuration the round-4 trace used), 10 steady loops, save at the
boundary, then per-loop wall times until the background save finishes
(+5 tail loops).  Reports steady rate, drag rate over the drain
window, drain seconds, and the net step-time lost vs steady.

Usage:
  python scripts/exp_save_drag.py              # all variants
  python scripts/exp_save_drag.py <variant>    # child mode
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 32
LOOP = 10
PRE_LOOPS = 10
MAX_POST_LOOPS = 400
TAIL_LOOPS = 5

VARIANTS = ["batched", "shipped", "paced"]


def child(variant):
    import jax

    from mint_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from mint_tpu.config.schema import load_pipeline_config
    from mint_tpu.models import builder
    from mint_tpu.models.fact import init_params
    from mint_tpu.parallel import mesh as mesh_lib
    from mint_tpu.train import Trainer, schedules
    from mint_tpu.train.checkpoint import CheckpointManager, _copy_tree

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pipe = load_pipeline_config(
        os.path.join(repo, "configs", "fact_v5_deeper_t10_cm12.config"))
    model = builder.build(pipe.multi_modal_model, is_training=True,
                          compute_dtype=jnp.bfloat16)
    params = init_params(model, jax.random.PRNGKey(0))
    schedule = schedules.from_config(pipe.train_config.learning_rate)
    trainer = Trainer(model, schedule)
    state = trainer.init_state(params)

    rng = np.random.default_rng(0)
    host_batch = {
        "motion_input": rng.standard_normal((BATCH, 120, 225)).astype(
            np.float32),
        "audio_input": rng.standard_normal((BATCH, 240, 35)).astype(
            np.float32),
        "target": rng.standard_normal((BATCH, 20, 225)).astype(np.float32),
    }
    sharding = mesh_lib.stacked_batch_sharding(trainer.mesh)
    stacked = {name: jax.device_put(v, sharding)
               for name, v in trainer.stack_batches(
                   [host_batch] * LOOP).items()}

    ckpt_dir = tempfile.mkdtemp(prefix=f"drag_{variant}_")
    mgr = CheckpointManager(ckpt_dir, save_interval_steps=1)

    def force(state):
        np.asarray(state.step)  # block_until_ready lies on axon

    # Compile + settle.
    t0 = time.perf_counter()
    state, _ = trainer.train_steps(state, stacked)
    force(state)
    compile_s = time.perf_counter() - t0
    state, _ = trainer.train_steps(state, stacked)
    force(state)

    pre = []
    for _ in range(PRE_LOOPS):
        t0 = time.perf_counter()
        state, _ = trainer.train_steps(state, stacked)
        force(state)
        pre.append(time.perf_counter() - t0)
    steady_ms = float(np.median(pre)) * 1e3

    # --- launch the save variant ---
    fetch_s = [None]
    if variant == "shipped":
        t_save = time.perf_counter()
        mgr.save_async(int(np.asarray(state.step)), state, force=True)
        save_thread = mgr._save_thread
    elif variant == "batched":
        # Reconstruct the pre-2b71615 save_async: orbax gets the DEVICE
        # snapshot and its StandardSave does one batched replica-read.
        snapshot = _copy_tree(state)
        step_no = int(np.asarray(state.step))

        def _run_batched():
            mgr._mgr.save(step_no, args=ocp.args.StandardSave(snapshot),
                          force=True)

        t_save = time.perf_counter()
        save_thread = threading.Thread(target=_run_batched, name="drag-save")
        save_thread.start()
    else:  # paced
        snapshot = _copy_tree(state)
        step_no = int(np.asarray(state.step))

        def _run():
            t0 = time.perf_counter()
            leaves, treedef = jax.tree_util.tree_flatten(snapshot)
            host = []
            for leaf in leaves:
                host.append(np.asarray(leaf)
                            if isinstance(leaf, jax.Array) else leaf)
                time.sleep(0.1)
            fetch_s[0] = time.perf_counter() - t0
            host_tree = jax.tree_util.tree_unflatten(treedef, host)
            mgr._mgr.save(step_no, args=ocp.args.StandardSave(host_tree),
                          force=True)

        t_save = time.perf_counter()
        save_thread = threading.Thread(target=_run, name="drag-save")
        save_thread.start()

    # --- per-loop trace while the save drains ---
    post = []
    drain_loops = None
    for i in range(MAX_POST_LOOPS):
        t0 = time.perf_counter()
        state, _ = trainer.train_steps(state, stacked)
        force(state)
        post.append(time.perf_counter() - t0)
        if drain_loops is None and not save_thread.is_alive():
            drain_loops = i + 1
            break
    save_thread.join()
    drain_s = time.perf_counter() - t_save
    if drain_loops is None:
        drain_loops = len(post)
    tail = []
    for _ in range(TAIL_LOOPS):
        t0 = time.perf_counter()
        state, _ = trainer.train_steps(state, stacked)
        force(state)
        tail.append(time.perf_counter() - t0)
    mgr.close()
    shutil.rmtree(ckpt_dir, ignore_errors=True)

    drain = post[:drain_loops]
    drag_ms = float(np.mean(drain)) * 1e3 if drain else float("nan")
    lost_s = sum(drain) - steady_ms / 1e3 * len(drain)
    rec = {
        "variant": variant,
        "steady_steps_per_sec": round(LOOP / (steady_ms / 1e3), 2),
        "drag_steps_per_sec": round(LOOP / (drag_ms / 1e3), 2),
        "drag_pct": round((drag_ms - steady_ms) / steady_ms * 100, 1),
        "drain_s": round(drain_s, 1),
        "leaf_fetch_s": None if fetch_s[0] is None else round(fetch_s[0], 1),
        "lost_train_s": round(lost_s, 1),
        "drain_loops": drain_loops,
        "tail_steps_per_sec": round(LOOP / float(np.median(tail)), 2),
        "compile_s": round(compile_s, 1),
        "loop_trace_ms": [round(t * 1e3) for t in post[:drain_loops + 3]],
    }
    print(json.dumps(rec), flush=True)


def main():
    attempts = 2
    for variant in VARIANTS:
        for attempt in range(attempts):
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), variant],
                cwd=os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))).returncode
            if rc == 0:
                break
            if attempt + 1 < attempts:  # no dead sleep after the last try
                print(f"# {variant} child failed rc={rc}; retry in 120s",
                      flush=True)
                time.sleep(120)
            else:
                print(f"# {variant} child failed rc={rc}; giving up",
                      flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        child(sys.argv[1])
    else:
        main()
