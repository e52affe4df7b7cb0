"""Full-pipeline end-to-end run at realistic scale on the real TPU.

Drives the actual CLIs as subprocesses, exactly as a user would
(SURVEY.md §3.1-3.4 call stacks):

  1. synthesize an AIST++-shaped corpus (10 musics x 25 s click tracks,
     40 train / 8 val sequences of 1500-frame SMPL motions)
  2. preprocess both splits (audio DSP frontend + 20-shard tfrecords)
  3. train the flagship fact_v5_deeper_t10_cm12 config on the TPU in
     bf16 — KILLED mid-run with SIGKILL after the first checkpoints,
     then resumed to the full 5000-step budget in a fresh process
  4. continuous eval: pick up the final checkpoint, generate 1200-frame
     dances for every val clip
  5. extract ground-truth kinetic/manual features from the corpus
  6. calculate_scores: FID_k / FID_g + Beat Alignment on the outputs

Writes a machine-readable summary (stage wall times, loss curve samples,
FID numbers) to <root>/e2e_summary.json; docs/E2E.md narrates a recorded
run.  Usage: python scripts/e2e_run.py [root_dir]
"""

import json
import os
import pickle
import signal
import subprocess
import sys
import time
import wave

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROOT = os.path.abspath(sys.argv[1]) if len(sys.argv) > 1 else "/tmp/mint_e2e"
# Optional extra train-CLI args (e.g. "--input_backend=device") as argv[2].
EXTRA_TRAIN_ARGS = sys.argv[2].split() if len(sys.argv) > 2 else []
RNG = np.random.default_rng(42)

MUSICS = {  # name -> BPM by the AIST++ naming rule (frontend.py:34-43)
    "mBR0": 80, "mBR3": 110, "mPO1": 90, "mLO2": 100, "mMH4": 120,
    "mLH5": 130, "mWA2": 100, "mKR1": 90, "mJS3": 110, "mJB4": 120,
}
GENRE = {"mBR": "gBR", "mPO": "gPO", "mLO": "gLO", "mMH": "gMH",
         "mLH": "gLH", "mWA": "gWA", "mKR": "gKR", "mJS": "gJS",
         "mJB": "gJB"}
DUR_S = 25.0
MOTION_FRAMES = 1500  # 25 s @ 60 fps
TRAIN_STEPS = 5000
KILL_AFTER_S = 1500.0  # hard cap on waiting for the first ckpt to land
CKPT_INTERVAL = 500

SUMMARY = {"stages": {}}


def log(msg):
    print(f"[e2e +{time.time() - T0:7.1f}s] {msg}", flush=True)


def run_cli(stage, module, argv, timeout=3600, kill_after=None):
    """Run `python -m mint_tpu.tools.<module> argv...` as a subprocess."""
    t0 = time.time()
    cmd = [sys.executable, "-m", f"mint_tpu.tools.{module}"] + argv
    # Append (not replace): PYTHONPATH carries the TPU plugin bootstrap.
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if kill_after is None:
        proc = subprocess.run(cmd, cwd=ROOT, env=env, timeout=timeout,
                              capture_output=True, text=True)
        ok = proc.returncode == 0
        if not ok:
            log(f"STAGE {stage} FAILED rc={proc.returncode}\n"
                f"stdout: {proc.stdout[-3000:]}\nstderr: {proc.stderr[-3000:]}")
            sys.exit(1)
        tail = proc.stdout[-500:]
    else:
        # Event-driven preemption: wait for the first checkpoint to land
        # (first-compile latency on the tunneled chip is variable), let it
        # train a bit past it, then SIGKILL mid-flight.  Output goes to a
        # log file (not DEVNULL) and a self-exit is distinguished from
        # our kill: a process that CRASHED before the kill used to be
        # recorded as ok="killed", and the stage only failed much later
        # with the diagnostics already discarded.
        log_path = f"{ROOT}/{stage}.log"
        with open(log_path, "w") as log_f:
            proc = subprocess.Popen(cmd, cwd=ROOT, env=env,
                                    stdout=log_f, stderr=log_f)
            deadline = time.time() + kill_after
            model_dir = f"{ROOT}/model"
            while time.time() < deadline and proc.poll() is None:
                # Wait for a real interval checkpoint (the controller
                # also saves step 1 on bring-up, which is too early to
                # be a meaningful preemption point).
                ckpts = [d for d in os.listdir(model_dir)
                         if d.isdigit() and int(d) >= CKPT_INTERVAL] \
                    if os.path.isdir(model_dir) else []
                if ckpts:
                    time.sleep(20)  # keep training past the checkpoint
                    break
                time.sleep(5)
            exited_itself = proc.poll() is not None
            proc.send_signal(signal.SIGKILL)
            proc.wait()
        if exited_itself:
            # Any self-exit — including rc=0 (a budget/flag bug that
            # finishes training early) — means the SIGKILL never
            # interrupted anything and the resume leg would silently be
            # a no-op; recording ok="killed" would be dishonest.
            with open(log_path) as f:
                out = f.read()
            log(f"STAGE {stage} EXITED ITSELF before the planned kill "
                f"(rc={proc.returncode})\n{out[-3000:]}")
            sys.exit(1)
        ok, tail = "killed", "SIGKILL after first checkpoint"
    dt = time.time() - t0
    SUMMARY["stages"].setdefault(stage, []).append(
        {"cmd": " ".join(argv[:4]), "wall_s": round(dt, 1), "ok": ok})
    log(f"stage {stage}: {dt:.1f}s ({tail.strip().splitlines()[-1] if tail.strip() else 'ok'})")
    return tail


def make_corpus():
    t0 = time.time()
    os.makedirs(f"{ROOT}/audio", exist_ok=True)
    os.makedirs(f"{ROOT}/anno/splits", exist_ok=True)
    os.makedirs(f"{ROOT}/anno/motions", exist_ok=True)
    for music, bpm in MUSICS.items():
        sr = 30720
        y = np.zeros(int(sr * DUR_S), np.float32)
        period = int(round(60.0 * sr / bpm))
        for s in range(0, len(y) - 256, period):
            y[s:s + 128] += 0.7 * RNG.standard_normal(128).astype(np.float32)
        y += 0.05 * RNG.standard_normal(len(y)).astype(np.float32)
        pcm = (np.clip(y, -1, 1) * 32767).astype(np.int16)
        with wave.open(f"{ROOT}/audio/{music}.wav", "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm.tobytes())
    train, val = [], []
    musics = list(MUSICS)
    for i in range(48):
        music = musics[i % len(musics)]
        seq = (f"{GENRE[music[:3]]}_sBM_c01_d{i:02d}_{music}_ch{i % 6:02d}")
        (train if i < 40 else val).append(seq)
        # Smooth random SMPL motion: slow axis-angle drift + root travel.
        aa = (0.03 * RNG.standard_normal((MOTION_FRAMES, 72))).cumsum(0)
        with open(f"{ROOT}/anno/motions/{seq}.pkl", "wb") as f:
            pickle.dump({"smpl_poses": aa,
                         "smpl_scaling": np.array([90.0]),
                         "smpl_trans": 90.0 * (0.02 * RNG.standard_normal(
                             (MOTION_FRAMES, 3))).cumsum(0)}, f)
    with open(f"{ROOT}/anno/splits/crossmodal_train.txt", "w") as f:
        f.write("\n".join(train))
    with open(f"{ROOT}/anno/splits/crossmodal_val.txt", "w") as f:
        f.write("\n".join(val))
    with open(f"{ROOT}/anno/splits/crossmodal_test.txt", "w") as f:
        f.write("")
    with open(f"{ROOT}/anno/ignore_list.txt", "w") as f:
        f.write("")
    os.makedirs(f"{ROOT}/data", exist_ok=True)
    SUMMARY["stages"]["corpus"] = [{"wall_s": round(time.time() - t0, 1),
                                    "train_seqs": len(train),
                                    "val_seqs": len(val)}]
    log(f"corpus: {len(MUSICS)} musics, {len(train)}+{len(val)} seqs")


def main():
    os.makedirs(ROOT, exist_ok=True)
    if os.path.isdir(f"{ROOT}/anno/motions") and \
            len(os.listdir(f"{ROOT}/anno/motions")) == 48:
        log("corpus exists; skipping synthesis")
    else:
        make_corpus()

    # 1. Preprocess (reference tools/preprocessing.py protocol).  Shard
    # COUNT cannot be the resume check: the sharded writers create all
    # 20 files per split upfront, so an interrupted run leaves a
    # complete-looking directory of empty/truncated shards — a
    # per-split done-marker written only AFTER the CLI succeeds is.
    for split in ("train", "testval"):
        marker = f"{ROOT}/data/.{split}_done"
        if os.path.exists(marker):
            log(f"preprocess {split}: done-marker exists; skipping")
            continue
        run_cli("preprocess", "preprocessing", [
            f"--anno_dir={ROOT}/anno", f"--audio_dir={ROOT}/audio",
            f"--audio_cache_dir={ROOT}/cache", f"--split={split}",
            f"--tfrecord_path={ROOT}/data/aist_tfrecord", "--n_shards=20",
        ], timeout=3600)
        with open(marker, "w") as f:
            f.write("ok\n")

    # 2. Train on the TPU (bf16), flagship config.  First run is SIGKILLED
    # mid-flight after the first checkpoints; the rerun must resume from
    # the last checkpoint and complete the absolute 5000-step budget.
    config = os.path.join(REPO, "configs", "fact_v5_deeper_t10_cm12.config")
    train_args = [
        f"--config_path={config}", f"--model_dir={ROOT}/model",
        f"--steps={TRAIN_STEPS}", f"--checkpoint_interval={CKPT_INTERVAL}",
        "--use_bfloat16", "--grad_clip_norm=1.0",
    ] + EXTRA_TRAIN_ARGS
    run_cli("train-killed", "train", train_args, kill_after=KILL_AFTER_S)
    ckpts = sorted(int(d) for d in os.listdir(f"{ROOT}/model")
                   if d.isdigit())
    log(f"checkpoints at kill: {ckpts}")
    SUMMARY["ckpts_at_kill"] = ckpts
    assert ckpts, "no checkpoint survived the kill"
    run_cli("train-resume", "train", train_args, timeout=5400)
    ckpts = sorted(int(d) for d in os.listdir(f"{ROOT}/model")
                   if d.isdigit())
    SUMMARY["ckpts_final"] = ckpts
    assert max(ckpts) == TRAIN_STEPS, ckpts

    # Loss curve from the JSONL metrics stream (summary dir model/train).
    losses = []
    metrics_file = f"{ROOT}/model/train/metrics.jsonl"
    if os.path.exists(metrics_file):
        with open(metrics_file) as f:
            for line in f:
                rec = json.loads(line)
                if "loss" in rec:
                    losses.append((rec.get("step"), rec["loss"]))
    SUMMARY["loss_curve"] = losses[::max(1, len(losses) // 25)]
    log(f"loss: first={losses[0] if losses else None} "
        f"last={losses[-1] if losses else None}")

    # 3. Continuous eval on the final checkpoint -> generated clips.
    run_cli("evaluate", "evaluate", [
        f"--config_path={config}", f"--model_dir={ROOT}/model",
        f"--output_dir={ROOT}/outputs", "--steps=1200", "--timeout=1",
    ], timeout=5400)
    outputs = [f for f in os.listdir(f"{ROOT}/outputs")
               if f.endswith(".npy")]
    SUMMARY["generated_clips"] = len(outputs)
    log(f"generated {len(outputs)} clips")
    assert outputs, "no clips generated"

    # 4. Ground-truth features for FID.
    run_cli("features", "extract_features", [
        f"--anno_dir={ROOT}/anno", f"--save_dir={ROOT}/features",
        "--workers=8",
    ], timeout=3600)

    # 5. FID + beat alignment.
    out = run_cli("score", "calculate_scores", [
        f"--result_files={ROOT}/outputs/*.npy",
        f"--feature_dir={ROOT}/features",
        f"--audio_cache_dir={ROOT}/cache",
    ], timeout=3600)
    SUMMARY["score_output"] = out.strip().splitlines()[-3:]

    with open(f"{ROOT}/e2e_summary.json", "w") as f:
        json.dump(SUMMARY, f, indent=1)
    log("E2E COMPLETE")
    print(json.dumps({k: v for k, v in SUMMARY.items()
                      if k != "loss_curve"}, indent=1))


if __name__ == "__main__":
    T0 = time.time()
    main()
else:
    T0 = time.time()
