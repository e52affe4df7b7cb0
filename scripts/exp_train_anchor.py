"""Measure the REFERENCE TF train step in-image — the training anchor.

The decode scoreboard has a measured reference anchor (0.53 frames/s,
eager per-frame CPU loop — bench.py docstring); training did not: the
repo's 13.7 steps/s (TPU, bare dispatch) was only ever compared against
an architecture argument.  This script measures the reference protocol
(`/root/reference/trainer.py:164-178` + `mint/ctl/single_task_trainer.py:
141-199`): the flagship fact_v5_deeper_t10_cm12 model built by the
reference's own code, Adam on the config's manual-step schedule, batch
32, loss = mean L2 over the first 20 output frames, no grad clipping
(the reference flag default is 0.), one Adam update per batch, the step
graph-compiled with tf.function exactly as Orbit's StandardTrainer
compiles its train loop.

TF has only the CPU backend in this image — the same situation as the
decode anchor, measured on the same host.  Run ALONE (single-core host;
a concurrent TPU benchmark would contend for the core).

Usage: python scripts/exp_train_anchor.py [n_steps]
Prints one JSON line {"ref_train_steps_per_sec": ..., ...}.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = os.path.join(REPO, "configs", "fact_v5_deeper_t10_cm12.config")
REFERENCE = "/root/reference"

# Subprocess so the tf.keras patching + protobuf env don't leak
# (same recipe as tests/test_reference_parity.py).
_DRIVER = r"""
import json, sys, time, types
tfg = types.ModuleType("tensorflow_graphics")
geom = types.ModuleType("tensorflow_graphics.geometry")
trans = types.ModuleType("tensorflow_graphics.geometry.transformation")
euler = types.ModuleType("tensorflow_graphics.geometry.transformation.euler")
euler.from_rotation_matrix = lambda x: x
trans.euler = euler; geom.transformation = trans; tfg.geometry = geom
sys.modules.update({
    "tensorflow_graphics": tfg,
    "tensorflow_graphics.geometry": geom,
    "tensorflow_graphics.geometry.transformation": trans,
    "tensorflow_graphics.geometry.transformation.euler": euler})
sys.path.insert(0, "%(reference)s")
import numpy as np
import tensorflow as tf
import tf_keras
tf.keras = tf_keras
sys.modules["tensorflow.keras"] = tf_keras
tf.config.set_visible_devices([], "GPU")
from mint.core import fact_model as ref_fact
from mint.core import learning_schedules
from mint.utils import config_util as ref_config_util

configs = ref_config_util.get_configs_from_pipeline_file("%(config)s")
model = ref_fact.FACTModel(configs["model"].fact_model, is_training=True)
train_config = configs["train_config"]
batch = int(train_config.batch_size)  # 32 in the shipped config

# The shipped config's manual_step_learning_rate path
# (trainer.py:49-66; the flagship config uses manual_step).
lr_cfg = train_config.learning_rate.manual_step_learning_rate
schedule = learning_schedules.ManualStepping(
    [s.step for s in lr_cfg.schedule],
    [lr_cfg.initial_learning_rate] + [s.learning_rate
                                      for s in lr_cfg.schedule],
    lr_cfg.warmup)
optimizer = tf.keras.optimizers.Adam(learning_rate=schedule)

rng = np.random.default_rng(0)
motion = tf.constant(rng.standard_normal((batch, 120, 225)), tf.float32)
audio = tf.constant(rng.standard_normal((batch, 240, 35)), tf.float32)
target = tf.constant(rng.standard_normal((batch, 20, 225)), tf.float32)

@tf.function  # Orbit's StandardTrainer compiles the train loop the same way
def train_step(motion, audio, target):
    with tf.GradientTape() as tape:
        output = model({"motion_input": motion, "audio_input": audio},
                       training=True)
        loss = tf.reduce_mean(model.loss(target, output))
        # num_replicas_in_sync == 1 here; reference grad_clip_norm
        # flag default is 0. (no clipping); no regularization losses.
        gradients = tape.gradient(loss, model.trainable_variables)
        optimizer.apply_gradients(
            list(zip(gradients, model.trainable_variables)))
    return loss

n_steps = int(sys.argv[1])
loss = train_step(motion, audio, target)  # trace + compile + 1 step
print("WARMUP_LOSS=%%r" %% float(loss.numpy()), flush=True)
t0 = time.perf_counter()
for i in range(n_steps):
    loss = train_step(motion, audio, target)
    print("STEP %%d %%.3fs loss=%%.5f"
          %% (i, time.perf_counter() - t0, float(loss.numpy())), flush=True)
dt = time.perf_counter() - t0
print("RESULT=%%r" %% json.dumps({
    "n_steps": n_steps, "wall_s": round(dt, 2),
    "steps_per_sec": round(n_steps / dt, 4),
    "examples_per_sec": round(n_steps * batch / dt, 2)}))
"""


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    code = _DRIVER % {"reference": REFERENCE, "config": CONFIG}
    env = dict(os.environ,
               PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION="python")
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-c", code, str(n_steps)],
                          capture_output=True, text=True, timeout=7200,
                          env=env)
    sys.stderr.write(proc.stderr[-2000:])
    print(proc.stdout)
    if proc.returncode != 0:
        raise SystemExit(proc.returncode)
    result_line = [l for l in proc.stdout.splitlines()
                   if l.startswith("RESULT=")][0]
    result = json.loads(eval(result_line[len("RESULT="):]))
    result["total_wall_s"] = round(time.time() - t0, 1)
    print(json.dumps({"ref_train_anchor": result}))


if __name__ == "__main__":
    main()
