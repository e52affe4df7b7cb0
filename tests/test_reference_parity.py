"""Numerical parity against the ACTUAL reference implementation.

Builds the reference TF FACTModel (from the read-only checkout at
/root/reference, against tf_keras — the Keras-2 lineage the release
checkpoint was written with), checkpoints it, converts with our
TF->JAX converter, and checks:

1. every variable maps (184 for the flagship config),
2. full forward parity to float32 noise,
3. autoregressive decode parity (scan decoder vs the reference's eager
   per-frame loop) over several steps.

The reference side runs in a subprocess so its tf.keras patching and
protobuf compatibility env don't leak into the test process.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
CONFIG = os.path.join(REPO, "configs", "fact_v5_deeper_t10_cm12.config")

pytestmark = [
    pytest.mark.integration,
    pytest.mark.skipif(not os.path.isdir(REFERENCE),
                       reason="reference checkout not mounted"),
]


_REFERENCE_DRIVER = r"""
import sys, types
# Stub tensorflow_graphics (only mint.core.metrics needs it).
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
tf.keras = tf_keras  # reference targets Keras 2 (the release ckpt format)
sys.modules["tensorflow.keras"] = tf_keras
tf.config.set_visible_devices([], "GPU")
from mint.core import fact_model as ref_fact
from mint.utils import config_util as ref_config_util

out_dir = "%(out_dir)s"
configs = ref_config_util.get_configs_from_pipeline_file("%(config)s")
model = ref_fact.FACTModel(configs["model"].fact_model, is_training=False)
rng = np.random.default_rng(0)
steps = 5
motion = rng.standard_normal((2, 120, 225)).astype(np.float32)
audio_full = rng.standard_normal((2, 240 + steps + 10, 35)).astype(
    np.float32)
fwd = model({"motion_input": tf.constant(motion),
             "audio_input": tf.constant(audio_full[:, :240])})
prefix = tf.train.Checkpoint(model=model).save(out_dir + "/ckpt")
ar = model.infer_auto_regressive(
    {"motion_input": tf.constant(motion),
     "audio_input": tf.constant(audio_full)}, steps=steps)
target = rng.standard_normal((2, 20, 225)).astype(np.float32)
loss = model.loss(tf.constant(target), fwd)
np.save(out_dir + "/motion.npy", motion)
np.save(out_dir + "/audio.npy", audio_full)
np.save(out_dir + "/fwd.npy", fwd.numpy())
np.save(out_dir + "/ar.npy", ar.numpy())
np.save(out_dir + "/target.npy", target)
np.save(out_dir + "/loss.npy", loss.numpy())
print("PREFIX=" + prefix)
"""


@pytest.fixture(scope="module")
def reference_artifacts(tmp_path_factory):
    pytest.importorskip("tensorflow")
    pytest.importorskip("tf_keras")
    out_dir = str(tmp_path_factory.mktemp("refparity"))
    code = _REFERENCE_DRIVER % {"reference": REFERENCE, "config": CONFIG,
                                "out_dir": out_dir}
    env = dict(os.environ,
               PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION="python")
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=500,
                          env=env)
    if proc.returncode != 0:
        pytest.skip(f"reference model unavailable: {proc.stderr[-800:]}")
    prefix = [l for l in proc.stdout.splitlines()
              if l.startswith("PREFIX=")][0][len("PREFIX="):]
    return out_dir, prefix


@pytest.fixture(scope="module")
def converted(reference_artifacts):
    from mint_tpu.config.schema import load_pipeline_config
    from mint_tpu.models.fact import FACT, init_params
    from mint_tpu.tools.convert_checkpoint import convert_tf_checkpoint

    out_dir, prefix = reference_artifacts
    pipe = load_pipeline_config(CONFIG)
    model = FACT(pipe.multi_modal_model.fact_model)
    template = init_params(model, jax.random.PRNGKey(0))
    params, report = convert_tf_checkpoint(prefix, template)
    return out_dir, model, params, report


def test_all_variables_map(converted):
    _, _, _, report = converted
    assert report == {}, f"unmapped/extra variables: {report}"


def test_forward_parity(converted):
    out_dir, model, params, _ = converted
    motion = np.load(out_dir + "/motion.npy")
    audio = np.load(out_dir + "/audio.npy")[:, :240]
    ref = np.load(out_dir + "/fwd.npy")
    out = np.asarray(model.apply(params, {
        "motion_input": jnp.asarray(motion),
        "audio_input": jnp.asarray(audio)}))
    np.testing.assert_allclose(out, ref, atol=5e-5)


def test_training_loss_parity(converted):
    from mint_tpu.models.fact import l2_loss

    out_dir, model, params, _ = converted
    motion = np.load(out_dir + "/motion.npy")
    audio = np.load(out_dir + "/audio.npy")[:, :240]
    target = np.load(out_dir + "/target.npy")
    ref_loss = float(np.load(out_dir + "/loss.npy"))
    pred = model.apply(params, {"motion_input": jnp.asarray(motion),
                                "audio_input": jnp.asarray(audio)})
    ours = float(l2_loss(jnp.asarray(target), pred))
    assert abs(ours - ref_loss) < 1e-5, (ours, ref_loss)


def test_autoregressive_parity(converted):
    from mint_tpu.infer.decoder import infer_auto_regressive

    out_dir, model, params, _ = converted
    motion = np.load(out_dir + "/motion.npy")
    audio = np.load(out_dir + "/audio.npy")
    ref = np.load(out_dir + "/ar.npy")
    out = np.asarray(infer_auto_regressive(model, params, {
        "motion_input": jnp.asarray(motion),
        "audio_input": jnp.asarray(audio)}, steps=ref.shape[1]))
    np.testing.assert_allclose(out, ref, atol=1e-4)
