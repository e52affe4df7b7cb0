"""Measure the serving cold start under the persistent compile cache.

Round 2 measured 54-400 s for the first request (one XLA compile per
(steps-bucket, batch-bucket)); round 3 wired the on-disk XLA cache into
GenerationService.  This starts a FRESH server process and times the
first request twice: once to (re)fill the disk cache, once as the
production cold-restart number.
"""
import io
import json
import os
import sys
import time
import urllib.request

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def one_process_run(tag):
    import jax

    from mint_tpu.config.schema import load_pipeline_config
    from mint_tpu.models import builder
    from mint_tpu.models.fact import init_params
    from mint_tpu.serving.server import GenerationService, serve

    t0 = time.time()
    pipe = load_pipeline_config(
        os.path.join(REPO, "configs", "fact_v5_deeper_t10_cm12.config"))
    import jax.numpy as jnp
    model = builder.build(pipe.multi_modal_model, is_training=False,
                          compute_dtype=jnp.bfloat16)
    params = init_params(model, jax.random.PRNGKey(0))
    service = GenerationService(model, params, default_steps=1200)
    server = serve(service, "127.0.0.1", 0)
    port = server.server_address[1]
    startup = time.time() - t0

    rng = np.random.default_rng(5)
    audio = rng.standard_normal((600, 35)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, audio)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate?steps=300",
        data=buf.getvalue(), method="POST")
    t0 = time.time()
    with urllib.request.urlopen(req, timeout=900) as r:
        out = np.load(io.BytesIO(r.read()))
    first = time.time() - t0
    t0 = time.time()
    with urllib.request.urlopen(req, timeout=900) as r:
        np.load(io.BytesIO(r.read()))
    warm = time.time() - t0
    print(json.dumps({"run": tag, "startup_s": round(startup, 1),
                      "first_request_s": round(first, 1),
                      "warm_request_s": round(warm, 2),
                      "out_shape": list(out.shape)}), flush=True)
    server.shutdown()
    service.close()


if __name__ == "__main__":
    one_process_run(sys.argv[1] if len(sys.argv) > 1 else "run")
