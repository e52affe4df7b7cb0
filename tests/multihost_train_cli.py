"""Worker: run the REAL `tools/train.py --distributed` CLI as one process
of a simulated multi-host cluster (N processes x 2 virtual CPU devices).

Usage: python multihost_train_cli.py <proc_id> <nprocs> <port> <root> \
           <steps> [input_backend]

Exercises the full production bring-up: jax.distributed.initialize with an
explicit coordinator, a (data x model) mesh spanning processes, the native
data loader feeding every host the same shards, Orbax checkpointing from
process 0, and absolute-step resume (run again with a higher budget).
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

proc_id, nprocs, port, root, steps = (int(sys.argv[1]), int(sys.argv[2]),
                                      sys.argv[3], sys.argv[4],
                                      int(sys.argv[5]))
backend = sys.argv[6] if len(sys.argv) > 6 else "auto"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from absl import app  # noqa: E402

from mint_tpu.tools.train import main  # noqa: E402

sys.argv = [
    "train",
    f"--config_path={root}/tiny.config",
    f"--model_dir={root}/model",
    f"--steps={steps}",
    "--checkpoint_interval=4",
    "--steps_per_loop=2",
    f"--data_parallelism={nprocs}",
    "--tensor_parallelism=2",
    "--distributed",
    f"--coordinator_address=127.0.0.1:{port}",
    f"--num_processes={nprocs}",
    f"--process_id={proc_id}",
    f"--input_backend={backend}",
]
try:
    app.run(main)
except SystemExit as e:
    if e.code not in (0, None):
        raise
assert jax.device_count() == 2 * nprocs
print(f"CLI_OK {proc_id} devices={jax.device_count()}", flush=True)
