"""Full product loop: preprocess -> train -> evaluate -> score.

Drives the real CLIs as subprocesses over a synthetic AIST++-shaped data
tree (wav click tracks + SMPL motion pickles + split files), exactly as a
user would run them, ending with finite FID_k/FID_g.
"""

import os
import pickle
import re
import subprocess
import sys
import wave

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RNG = np.random.default_rng(13)

TRAIN_SEQS = ["gBR_sBM_c01_d04_mBR0_ch01", "gWA_sBM_c01_d25_mWA2_ch02"]
VAL_SEQS = ["gBR_sBM_c01_d05_mBR0_ch02", "gWA_sBM_c01_d26_mWA2_ch03"]

TINY_CONFIG = """
multi_modal_model {{
  fact_model {{
    modality: {{
      feature_name: "audio"
      sequence_length: 24
      model: {{ transformer: {{ num_attention_heads: 2 hidden_size: 32 num_hidden_layers: 1 intermediate_size: 64 }} }}
    }}
    modality: {{
      feature_name: "motion"
      sequence_length: 12
      feature_dim: 225
      model: {{ transformer: {{ num_attention_heads: 2 hidden_size: 32 num_hidden_layers: 1 intermediate_size: 64 }} }}
    }}
    cross_modal_model: {{
      modality_a: "motion"
      modality_b: "audio"
      transformer: {{ num_hidden_layers: 1 hidden_size: 32 num_attention_heads: 2 intermediate_size: 64 }}
      output_layer: {{ out_dim: 225 }}
    }}
  }}
}}
train_dataset {{
  name: "train"
  input_length_sec: 0.2
  target_length_sec: 0.05
  target_shift_sec: 0.2
  data_files: "{root}/tfr/rec-train*"
  modality: {{ general_modality: {{ feature_name: "motion" dimension: 219 sample_rate: 60 }} }}
  modality: {{ general_modality: {{ feature_name: "audio" dimension: 35 sample_rate: 120 }} }}
  data_augmentation_options {{ fact_preprocessor: {{ }} }}
}}
eval_dataset {{
  name: "val"
  input_length_sec: 0.2
  target_length_sec: 0.05
  target_shift_sec: 0.2
  data_files: "{root}/tfr/rec-testval*"
  modality: {{ general_modality: {{ feature_name: "motion" dimension: 219 sample_rate: 60 }} }}
  modality: {{ general_modality: {{ feature_name: "audio" dimension: 35 sample_rate: 120 }} }}
  data_augmentation_options {{ fact_preprocessor: {{ }} }}
}}
train_config: {{
  batch_size: 4
  learning_rate: {{
    manual_step_learning_rate: {{
      initial_learning_rate: 0.001
      schedule: {{ step: 100 learning_rate: 0.0001 }}
    }}
  }}
}}
eval_config: {{ batch_size: 1 }}
"""


def _run(code: str, timeout=240):
    """Run python code in a subprocess pinned to the CPU backend."""
    prologue = ("import jax; jax.config.update('jax_platforms','cpu'); "
                "import sys; ")
    env = dict(os.environ,
               XLA_FLAGS=os.environ.get("XLA_FLAGS", ""),
               PYTHONPATH=REPO)
    proc = subprocess.run([sys.executable, "-c", prologue + code],
                          capture_output=True, text=True, timeout=timeout,
                          cwd=REPO, env=env)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    return proc.stdout


def _write_wav(path, bpm, dur_s, sr=30720):
    y = np.zeros(int(sr * dur_s), np.float32)
    period = int(round(60.0 * sr / bpm))
    for s in range(0, len(y) - 256, period):
        y[s:s + 128] += 0.7 * RNG.standard_normal(128).astype(np.float32)
    pcm = (np.clip(y, -1, 1) * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def _make_tree(root):
    os.makedirs(root / "audio")
    os.makedirs(root / "anno" / "splits")
    os.makedirs(root / "anno" / "motions")
    for music, bpm in (("mBR0", 80), ("mWA2", 100)):
        _write_wav(root / "audio" / f"{music}.wav", bpm, 4.0)
    (root / "anno" / "splits" / "crossmodal_train.txt").write_text(
        "\n".join(TRAIN_SEQS))
    (root / "anno" / "splits" / "crossmodal_val.txt").write_text(
        "\n".join(VAL_SEQS))
    (root / "anno" / "splits" / "crossmodal_test.txt").write_text("")
    (root / "anno" / "ignore_list.txt").write_text("")
    for seq in TRAIN_SEQS + VAL_SEQS:
        t = 200  # 200 motion frames @60fps < 241 audio feature frames
        aa = (0.05 * RNG.standard_normal((t, 72))).cumsum(axis=0)
        with open(root / "anno" / "motions" / f"{seq}.pkl", "wb") as f:
            pickle.dump({"smpl_poses": aa,
                         "smpl_scaling": np.array([90.0]),
                         "smpl_trans":
                             90.0 * RNG.standard_normal((t, 3))}, f)


@pytest.mark.integration
def test_full_product_loop(tmp_path):
    _make_tree(tmp_path)
    root = str(tmp_path)
    config = tmp_path / "tiny.config"
    config.write_text(TINY_CONFIG.format(root=root))

    # 1. Preprocess both splits through the real CLI.
    for split in ("train", "testval"):
        _run(f"""
sys.argv = ['preprocessing', '--anno_dir={root}/anno', '--audio_dir={root}/audio',
            '--audio_cache_dir={root}/cache', '--split={split}',
            '--tfrecord_path={root}/tfr/rec', '--n_shards=2']
from mint_tpu.tools.preprocessing import main
from absl import app
try: app.run(main)
except SystemExit: pass
""")
    shards = os.listdir(tmp_path / "tfr")
    assert len([s for s in shards if "train" in s]) == 2
    assert len([s for s in shards if "testval" in s]) == 2
    cache = os.listdir(tmp_path / "cache")
    assert sorted(cache) == ["mBR0.npy", "mWA2.npy"]
    feats = np.load(tmp_path / "cache" / "mBR0.npy")
    assert feats.shape[1] == 35 and feats.shape[0] >= 240

    # 2. Train 12 steps through the real CLI (native loader by default).
    out = _run(f"""
sys.argv = ['train', '--config_path={config}', '--model_dir={root}/model',
            '--steps=12', '--checkpoint_interval=10',
            '--data_parallelism=4', '--tensor_parallelism=2']
from mint_tpu.tools.train import main
from absl import app
try: app.run(main)
except SystemExit: pass
""")
    assert os.path.exists(tmp_path / "model" / "pipeline.config")

    # 2b. Preemption/resume: a fresh process restores step 12 and trains
    # until the ABSOLUTE budget (18); re-running with the original budget
    # (12) is a no-op — orbit's idempotent-resume semantics.
    out = _run(f"""
sys.argv = ['train', '--config_path={config}', '--model_dir={root}/model',
            '--steps=18', '--checkpoint_interval=10',
            '--data_parallelism=4', '--tensor_parallelism=2']
from mint_tpu.tools.train import main
from absl import app
try: app.run(main)
except SystemExit: pass
import os
steps = sorted(int(d) for d in os.listdir('{root}/model')
               if d.isdigit())
print('CKPT_STEPS=' + ','.join(map(str, steps)))
""")
    ckpt_steps = [int(s) for s in
                  re.search(r"CKPT_STEPS=([\d,]+)", out).group(1).split(",")]
    assert max(ckpt_steps) == 18, ckpt_steps  # resumed 12 -> 18

    # Re-running with an already-met budget must be a no-op.
    out = _run(f"""
sys.argv = ['train', '--config_path={config}', '--model_dir={root}/model',
            '--steps=12', '--checkpoint_interval=10',
            '--data_parallelism=4', '--tensor_parallelism=2']
from mint_tpu.tools.train import main
from absl import app
try: app.run(main)
except SystemExit: pass
import os
steps = sorted(int(d) for d in os.listdir('{root}/model')
               if d.isdigit())
print('CKPT_STEPS=' + ','.join(map(str, steps)))
""")
    ckpt_steps = [int(s) for s in
                  re.search(r"CKPT_STEPS=([\d,]+)", out).group(1).split(",")]
    assert max(ckpt_steps) == 18, ckpt_steps  # unchanged

    # 3. Evaluate: generate the testval set from the checkpoints.
    _run(f"""
sys.argv = ['evaluate', '--config_path={config}', '--model_dir={root}/model',
            '--output_dir={root}/outputs', '--timeout=2']
from mint_tpu.tools.evaluate import main
from absl import app
try: app.run(main)
except SystemExit: pass
""")
    outputs = os.listdir(tmp_path / "outputs")
    # testval = val split + 10x unpaired; same (motion, music) pairs
    # collapse to one file, leaving the 2x2 distinct combinations.
    assert len(outputs) >= 2
    clip = np.load(tmp_path / "outputs" / outputs[0])
    assert clip.shape[1] == 225 and clip.shape[0] > 12

    # 4. Ground-truth features through the real CLI.
    _run(f"""
sys.argv = ['extract_features', '--anno_dir={root}/anno',
            '--save_dir={root}/features', '--workers=0']
from mint_tpu.tools.extract_features import main
from absl import app
try: app.run(main)
except SystemExit: pass
""")
    assert len(os.listdir(tmp_path / "features")) == 2 * 4  # 4 seqs x 2

    # 5. FID + beat-alignment scoring through the real CLI.
    out = _run(f"""
sys.argv = ['calculate_scores', '--result_files={root}/outputs/*.npy',
            '--feature_dir={root}/features', '--seed_frames=12',
            '--audio_cache_dir={root}/cache']
from mint_tpu.tools.calculate_scores import main
from absl import app
try: app.run(main)
except SystemExit: pass
""")
    m = re.search(r"FID_k: ([-\d.]+), FID_g: ([-\d.]+)", out)
    assert m, out
    fid_k, fid_g = float(m.group(1)), float(m.group(2))
    assert np.isfinite(fid_k) and np.isfinite(fid_g)
    ba = re.search(r"Beat Alignment Score: ([\d.]+) over (\d+) clips", out)
    assert ba, out
    assert 0.0 <= float(ba.group(1)) <= 1.0
