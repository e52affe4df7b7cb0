"""Chunked audio-encoder hoisting: the audio transformer depends only on
the (known) audio track, so encode K windows per outer step as one big
batched call, leaving only motion encoder + cross inside the AR scan."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from mint_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

from mint_tpu.config.schema import load_pipeline_config
from mint_tpu.models.fact import FACT, init_params
from mint_tpu.infer import decoder as dec


@functools.partial(jax.jit, static_argnames=("model", "steps", "unroll", "k"))
def infer_chunked(model, params, inputs, steps, unroll, k):
    audio_seq = model.audio_seq_length
    audio_emb_full = dec._embed(model, params, "audio", inputs["audio_input"])
    motion_emb0 = dec._embed(model, params, "motion", inputs["motion_input"])
    b = motion_emb0.shape[0]
    hidden = motion_emb0.shape[-1]
    assert steps % k == 0

    def encode_audio_windows(base):
        # [K, B, audio_seq, H] stacked windows starting at base..base+k-1
        wins = jnp.stack([
            jax.lax.dynamic_slice_in_dim(audio_emb_full, base + j,
                                         audio_seq, axis=1)
            for j in range(k)])
        flat = wins.reshape(k * b, audio_seq, hidden)

        def run(mdl):
            a = mdl.audio_pos_embedding(flat)
            return mdl.audio_transformer(a)

        enc = model.apply(params, method=run)
        return enc.reshape(k, b, audio_seq, hidden)

    def fwd_cross(m_emb, a_enc):
        def run(mdl):
            m = mdl.motion_pos_embedding(m_emb)
            m = mdl.motion_transformer(m)
            return mdl.cross(m, a_enc)
        return model.apply(params, method=run)

    def outer(carry, c):
        motion_emb = carry
        a_encs = encode_audio_windows(c * k)

        def inner(m_emb, a_enc):
            out = fwd_cross(m_emb, a_enc)
            frame = out[:, 0:1, :]
            new_emb = dec._embed(model, params, "motion", frame)
            m_emb = jnp.concatenate([m_emb[:, 1:, :], new_emb], axis=1)
            return m_emb, frame[:, 0, :]

        motion_emb, frames = jax.lax.scan(inner, motion_emb, a_encs,
                                          unroll=unroll)
        return motion_emb, frames

    _, frames = jax.lax.scan(outer, motion_emb0, jnp.arange(steps // k))
    frames = frames.reshape(steps, b, -1)
    return jnp.transpose(frames, (1, 0, 2))


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    pipe = load_pipeline_config(
        "/root/repo/configs/fact_v5_deeper_t10_cm12.config")
    model = FACT(pipe.multi_modal_model.fact_model,
                 compute_dtype=jnp.bfloat16)
    params = init_params(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch, steps = 40, 320
    inputs = {
        "motion_input": jnp.asarray(
            rng.standard_normal((batch, 120, 225)), jnp.float32),
        "audio_input": jnp.asarray(
            rng.standard_normal((batch, steps + 240, 35)), jnp.float32),
    }
    # correctness vs the shipped decoder
    ref = dec.infer_auto_regressive(model, params, inputs, steps=steps)
    for k, unroll in ((8, 8), (16, 8)):
        fn = infer_chunked
        t0 = time.perf_counter()
        out = np.asarray(fn(model, params, inputs, steps, unroll, k))
        tc = time.perf_counter() - t0
        err = float(np.max(np.abs(out - np.asarray(ref))))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(model, params, inputs, steps, unroll, k))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        print(f"chunk k={k} unroll={unroll}: {batch*steps/dt:8.1f} f/s "
              f"{dt/steps*1e3:6.2f} ms/step maxerr={err:.2e} "
              f"(compile {tc:.0f}s, {[round(t,2) for t in times]})",
              flush=True)


if __name__ == "__main__":
    main()
