"""Device placement for the offline audio frontend.

Feature extraction is offline preprocessing (reference runs it in a CPU
CLI, ``tools/preprocessing.py``); by default its XLA ops run on the host
CPU backend so a tunneled/remote TPU isn't in the hot path of data prep.
Set ``MINT_TPU_AUDIO_DEVICE=tpu`` to run the FFT/matmul stages on the
accelerator (worthwhile for large batch preprocessing jobs on-pod).
"""

from __future__ import annotations

import contextlib
import os

import jax


def audio_device():
    kind = os.environ.get("MINT_TPU_AUDIO_DEVICE", "cpu")
    try:
        return jax.local_devices(backend=kind)[0]
    except RuntimeError:
        return jax.local_devices()[0]


@contextlib.contextmanager
def on_audio_device():
    with jax.default_device(audio_device()):
        yield
