"""Multi-process (simulated multi-host) distributed training tests.

- 2 real processes x 4 virtual CPU devices joined via
  ``jax.distributed.initialize`` into one (data=4, model=2) mesh; the DP
  gradient all-reduce crosses the process boundary and both processes
  must report the identical loss.
- 4 real processes x 2 devices driving the REAL ``tools/train.py
  --distributed`` CLI end-to-end (coordinator bring-up, native loader,
  Orbax checkpoints, absolute-step resume across a second cluster run).
"""

import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")
CLI_WORKER = os.path.join(REPO, "tests", "multihost_train_cli.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.integration
def test_two_process_training_agrees():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env) for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, (out[-500:], err[-1500:])
        outs.append(out)
    losses = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                _, pid, loss = line.split()
                losses[int(pid)] = float(loss)
    assert set(losses) == {0, 1}, outs
    assert losses[0] == losses[1]


TINY_CONFIG = """
multi_modal_model {{ fact_model {{
  modality: {{ feature_name: "audio" sequence_length: 24
    model: {{ transformer: {{ num_attention_heads: 2 hidden_size: 32 num_hidden_layers: 1 intermediate_size: 64 }} }} }}
  modality: {{ feature_name: "motion" sequence_length: 12 feature_dim: 225
    model: {{ transformer: {{ num_attention_heads: 2 hidden_size: 32 num_hidden_layers: 1 intermediate_size: 64 }} }} }}
  cross_modal_model: {{ modality_a: "motion" modality_b: "audio"
    transformer: {{ num_hidden_layers: 1 hidden_size: 32 num_attention_heads: 2 intermediate_size: 64 }}
    output_layer: {{ out_dim: 225 }} }}
}} }}
train_dataset {{
  name: "train"
  input_length_sec: 0.2 target_length_sec: 0.05 target_shift_sec: 0.2
  data_files: "{root}/tfr/rec-train*"
  modality: {{ general_modality: {{ feature_name: "motion" dimension: 219 sample_rate: 60 }} }}
  modality: {{ general_modality: {{ feature_name: "audio" dimension: 35 sample_rate: 120 }} }}
  data_augmentation_options {{ fact_preprocessor: {{ }} }}
}}
train_config: {{ batch_size: 8
  learning_rate: {{ manual_step_learning_rate: {{
    initial_learning_rate: 0.001
    schedule: {{ step: 100 learning_rate: 0.0001 }} }} }} }}
eval_config: {{ batch_size: 1 }}
"""


def _write_tiny_tfrecords(root):
    from mint_tpu.data.example import encode_example
    from mint_tpu.data.tfrecord import TFRecordWriter

    rng = np.random.default_rng(3)
    os.makedirs(root / "tfr")
    with TFRecordWriter(str(root / "tfr" / "rec-train-0")) as w:
        for i in range(6):
            motion = rng.standard_normal((40, 219)).astype(np.float32)
            audio = rng.standard_normal((80, 35)).astype(np.float32)
            w.write(encode_example({
                "motion_sequence": motion.ravel(),
                "motion_sequence_shape": np.asarray(motion.shape, np.int64),
                "motion_name": [f"m{i}".encode()],
                "audio_sequence": audio.ravel(),
                "audio_sequence_shape": np.asarray(audio.shape, np.int64),
                "audio_name": [f"a{i}".encode()],
            }))


def _launch_cluster(nprocs, root, steps, backend="auto"):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, CLI_WORKER, str(i), str(nprocs), str(port),
         str(root), str(steps), backend],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(nprocs)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, (out[-800:], err[-2500:])
        outs.append(out)
    return outs


@pytest.mark.integration
def test_four_process_train_cli_and_resume(tmp_path):
    """4 hosts x 2 devices through the real --distributed CLI, twice:
    the second cluster run must RESUME from the first run's checkpoint
    and stop at the higher absolute budget."""
    _write_tiny_tfrecords(tmp_path)
    (tmp_path / "tiny.config").write_text(TINY_CONFIG.format(root=tmp_path))

    outs = _launch_cluster(4, tmp_path, steps=6)
    assert all("CLI_OK" in o for o in outs), outs
    ckpts = sorted(int(d) for d in os.listdir(tmp_path / "model")
                   if d.isdigit())
    assert ckpts and max(ckpts) == 6, ckpts

    # Second cluster run: absolute budget 10 -> resumes 6 and adds 4.
    outs = _launch_cluster(4, tmp_path, steps=10)
    assert all("CLI_OK" in o for o in outs), outs
    ckpts = sorted(int(d) for d in os.listdir(tmp_path / "model")
                   if d.isdigit())
    assert max(ckpts) == 10, ckpts


@pytest.mark.integration
def test_two_process_device_backend_cli(tmp_path):
    """2 hosts x 2 devices with --input_backend=device: every process
    uploads the same HBM-resident corpus (replicated across the
    cross-process mesh) and the fused sampled train scan runs SPMD over
    both hosts."""
    _write_tiny_tfrecords(tmp_path)
    (tmp_path / "tiny.config").write_text(TINY_CONFIG.format(root=tmp_path))
    outs = _launch_cluster(2, tmp_path, steps=6, backend="device")
    assert all("CLI_OK" in o for o in outs), outs
    ckpts = sorted(int(d) for d in os.listdir(tmp_path / "model")
                   if d.isdigit())
    assert ckpts and max(ckpts) == 6, ckpts
