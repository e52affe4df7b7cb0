"""A/B the truncated final cross block inside the decode scan on the TPU."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from mint_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

from mint_tpu.config.schema import load_pipeline_config
from mint_tpu.models.fact import FACT, init_params
from mint_tpu.infer import decoder as dec


def make_infer(first_n_out):
    @functools.partial(jax.jit, static_argnames=("model", "steps", "unroll"))
    def infer(model, params, inputs, steps, unroll):
        audio_seq = model.audio_seq_length
        audio_emb_full = dec._embed(model, params, "audio",
                                    inputs["audio_input"])
        motion_emb = dec._embed(model, params, "motion",
                                inputs["motion_input"])

        def fwd(m_emb, a_emb):
            def run(mdl):
                m = mdl.motion_pos_embedding(m_emb)
                m = mdl.motion_transformer(m)
                a = mdl.audio_pos_embedding(a_emb)
                a = mdl.audio_transformer(a)
                return mdl.cross(m, a, first_n_out=first_n_out)
            return model.apply(params, method=run)

        def step(carry, i):
            motion_emb = carry
            audio_emb = jax.lax.dynamic_slice_in_dim(
                audio_emb_full, i, audio_seq, axis=1)
            out = fwd(motion_emb, audio_emb)
            frame = out[:, 0:1, :]
            new_emb = dec._embed(model, params, "motion", frame)
            motion_emb = jnp.concatenate([motion_emb[:, 1:, :], new_emb],
                                         axis=1)
            return motion_emb, frame[:, 0, :]

        _, frames = jax.lax.scan(step, motion_emb, jnp.arange(steps),
                                 unroll=unroll)
        return jnp.transpose(frames, (1, 0, 2))
    return infer


def main():
    pipe = load_pipeline_config(
        "/root/repo/configs/fact_v5_deeper_t10_cm12.config")
    model = FACT(pipe.multi_modal_model.fact_model,
                 compute_dtype=jnp.bfloat16)
    params = init_params(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch, steps = 40, 300
    inputs = {
        "motion_input": jnp.asarray(
            rng.standard_normal((batch, 120, 225)), jnp.float32),
        "audio_input": jnp.asarray(
            rng.standard_normal((batch, steps + 240, 35)), jnp.float32),
    }
    for label, fno in (("full", None), ("t1", 1), ("t16", 16),
                       ("t48", 48), ("t128", 128)):
        for unroll in (8,):
            fn = make_infer(fno)
            t0 = time.perf_counter()
            np.asarray(fn(model, params, inputs, steps, unroll))
            tc = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fn(model, params, inputs, steps, unroll))
                times.append(time.perf_counter() - t0)
            dt = float(np.median(times))
            print(f"{label} unroll={unroll}: {batch*steps/dt:8.1f} f/s "
                  f"{dt/steps*1e3:6.2f} ms/step (compile {tc:.0f}s, "
                  f"{[round(t,2) for t in times]})", flush=True)


if __name__ == "__main__":
    main()
