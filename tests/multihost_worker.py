"""Worker for the multi-process (simulated multi-host) training test.

Each process owns 4 virtual CPU devices; jax.distributed stitches them
into one 8-device (data=4, model=2) mesh spanning both "hosts" — DP grad
all-reduce crosses the process boundary (DCN-equivalent), TP stays
process-local, exactly the production layout recipe.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
Prints ``RESULT <process_id> <loss>`` on success.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

proc_id, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nprocs, process_id=proc_id)
assert jax.local_device_count() == 4
assert jax.device_count() == 4 * nprocs

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from mint_tpu.config import schema as S  # noqa: E402
from mint_tpu.models.fact import FACT, init_params  # noqa: E402
from mint_tpu.parallel import mesh as mesh_lib  # noqa: E402
from mint_tpu.train import schedules  # noqa: E402
from mint_tpu.train.trainer import Trainer  # noqa: E402


def _transformer():
    return S.TransformerConfig(hidden_size=32, num_hidden_layers=1,
                               num_attention_heads=2,
                               intermediate_size=64)


config = S.FACTModelConfig(
    modality=[
        S.ModalityConfig(
            feature_name="audio", sequence_length=16, feature_dim=35,
            model=[S.ModalityModelConfig(transformer=_transformer())]),
        S.ModalityConfig(
            feature_name="motion", sequence_length=8, feature_dim=9,
            model=[S.ModalityModelConfig(transformer=_transformer())]),
    ],
    cross_modal_model=S.CrossModalModelConfig(
        modality_a="motion", modality_b="audio",
        transformer=_transformer(),
        output_layer=S.MLPConfig(out_dim=9)))

model = FACT(config)
params = init_params(model, jax.random.PRNGKey(0))
mesh = mesh_lib.make_mesh(data=2 * nprocs, model=2)
trainer = Trainer(model, schedules.constant(1e-3), mesh=mesh)
state = trainer.init_state(params)

# Same global batch on every process; each contributes its local shards.
rng = np.random.default_rng(0)
global_batch = {
    "motion_input": rng.standard_normal((8, 8, 9)).astype(np.float32),
    "audio_input": rng.standard_normal((8, 16, 35)).astype(np.float32),
    "target": rng.standard_normal((8, 4, 9)).astype(np.float32),
}
sharding = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
batch = {k: jax.make_array_from_process_local_data(sharding, v)
         for k, v in global_batch.items()}

for _ in range(3):
    state, metrics = trainer.train_step(state, batch)
loss = float(np.asarray(metrics["loss"]))
assert np.isfinite(loss)
print(f"RESULT {proc_id} {loss:.8f}", flush=True)
