"""STFT / mel / MFCC / onset-strength, as jittable XLA ops.

Numerics follow the librosa defaults at the reference's call sites
(reference ``tools/preprocessing.py:98-102``):

- STFT: n_fft=2048, hop=512, centered (reflect padding), Hann window.
- melspectrogram: power 2.0, n_mels=128, Slaney mel scale + Slaney area
  normalization, fmin=0, fmax=sr/2.
- power_to_db: 10*log10(max(S, 1e-10)), top_db=80 floor relative to max.
- MFCC: DCT-II orthonormal over power_to_db(melspectrogram), first 20.
- onset_strength: mean over mel bands of positive first difference of the
  dB mel spectrogram (lag 1), padded with n_fft//(2*hop)+lag leading zeros
  and trimmed to the frame count.

The hot path (FFT, mel projection = matmul, DCT = matmul) is XLA-jitted;
everything is batched over frames so the MXU sees a single [frames, bins]
x [bins, mels] matmul per track.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n: int, fftbins: bool = True) -> np.ndarray:
    """scipy.signal.get_window('hann', n, fftbins) equivalent."""
    if n == 1:
        return np.ones(1)
    m = n if fftbins else n - 1
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / m)
    return w


def _hz_to_mel(freq, htk: bool = False):
    freq = np.asanyarray(freq, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    # Slaney: linear below 1 kHz, log above.
    f_min, f_sp = 0.0, 200.0 / 3
    mel = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = freq >= min_log_hz
    mel = np.where(above,
                   min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz)
                   / logstep,
                   mel)
    return mel


def _mel_to_hz(mel, htk: bool = False):
    mel = np.asanyarray(mel, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freq = f_min + f_sp * mel
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = mel >= min_log_mel
    return np.where(above, min_log_hz * np.exp(logstep * (mel - min_log_mel)),
                    freq)


def mel_filterbank(sr: int, n_fft: int, n_mels: int = 128,
                   fmin: float = 0.0, fmax: Optional[float] = None,
                   htk: bool = False, norm: str = "slaney") -> np.ndarray:
    """Triangular mel filterbank [n_mels, 1 + n_fft//2] (librosa.filters.mel)."""
    if fmax is None:
        fmax = sr / 2.0
    n_bins = 1 + n_fft // 2
    fft_freqs = np.linspace(0, sr / 2.0, n_bins)
    mel_pts = np.linspace(_hz_to_mel(fmin, htk), _hz_to_mel(fmax, htk),
                          n_mels + 2)
    mel_f = _mel_to_hz(mel_pts, htk)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1][:, None]
    upper = ramps[2:] / fdiff[1:][:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (mel_f[2:n_mels + 2] - mel_f[:n_mels])
        weights *= enorm[:, None]
    return weights.astype(np.float32)


def dct_matrix(n_out: int, n_in: int) -> np.ndarray:
    """Orthonormal DCT-II matrix [n_out, n_in] (scipy.fftpack.dct norm='ortho')."""
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    mat = np.cos(np.pi * k * (2 * n + 1) / (2.0 * n_in))
    mat *= np.sqrt(2.0 / n_in)
    mat[0] *= 1.0 / np.sqrt(2.0)
    return mat.astype(np.float32)


def frame_signal(y: jax.Array, n_fft: int, hop: int,
                 center: bool = True) -> jax.Array:
    """[T] -> [frames, n_fft] with centered reflect padding."""
    if center:
        y = jnp.pad(y, (n_fft // 2, n_fft // 2), mode="reflect")
    n_frames = 1 + (y.shape[0] - n_fft) // hop
    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(n_fft)[None, :])
    return y[idx]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "center"))
def stft_power(y: jax.Array, n_fft: int = 2048, hop: int = 512,
               center: bool = True) -> jax.Array:
    """|STFT|^2 -> [frames, 1 + n_fft//2], Hann window."""
    frames = frame_signal(y, n_fft, hop, center)
    win = jnp.asarray(hann_window(n_fft), jnp.float32)
    spec = jnp.fft.rfft(frames * win, n_fft, axis=-1)
    return jnp.abs(spec) ** 2


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "center"))
def stft_magnitude(y: jax.Array, n_fft: int = 2048, hop: int = 512,
                   center: bool = True) -> jax.Array:
    frames = frame_signal(y, n_fft, hop, center)
    win = jnp.asarray(hann_window(n_fft), jnp.float32)
    return jnp.abs(jnp.fft.rfft(frames * win, n_fft, axis=-1))


def power_to_db(S: jax.Array, ref=1.0, amin: float = 1e-10,
                top_db: Optional[float] = 80.0) -> jax.Array:
    """librosa.power_to_db: 10*log10(max(amin,S)/max(amin,ref)), top_db floor."""
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, S))
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(amin, ref))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - top_db)
    return log_spec


@functools.partial(jax.jit,
                   static_argnames=("sr", "n_fft", "hop", "n_mels", "fmax"))
def melspectrogram(y: jax.Array, sr: int, n_fft: int = 2048, hop: int = 512,
                   n_mels: int = 128,
                   fmax: Optional[float] = None) -> jax.Array:
    """Power mel spectrogram [frames, n_mels]."""
    S = stft_power(y, n_fft, hop)
    mel = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmax=fmax))
    return S @ mel.T


@functools.partial(jax.jit,
                   static_argnames=("sr", "n_mfcc", "n_fft", "hop", "n_mels"))
def mfcc(y: jax.Array, sr: int, n_mfcc: int = 20, n_fft: int = 2048,
         hop: int = 512, n_mels: int = 128) -> jax.Array:
    """MFCCs [frames, n_mfcc] (librosa.feature.mfcc with dct_type=2 ortho)."""
    S_db = power_to_db(melspectrogram(y, sr, n_fft, hop, n_mels))
    dct = jnp.asarray(dct_matrix(n_mfcc, n_mels))
    return S_db @ dct.T


@functools.partial(jax.jit,
                   static_argnames=("sr", "n_fft", "hop", "lag", "n_mels",
                                    "center", "fmax"))
def onset_strength(y: jax.Array, sr: int, n_fft: int = 2048, hop: int = 512,
                   lag: int = 1, n_mels: int = 128,
                   center: bool = True,
                   fmax: Optional[float] = 11025.0) -> jax.Array:
    """Spectral-flux onset envelope [frames] (librosa.onset.onset_strength).

    Mean over mel bands of the positive lag-difference of the dB mel
    spectrogram, shifted by ``n_fft // (2*hop) + lag`` frames (librosa's
    centered compensation) and trimmed to the frame count.

    ``fmax`` defaults to 11025.0 Hz — librosa 0.8.x's
    ``onset_strength_multi`` hardcodes ``kwargs.setdefault("fmax",
    11025.0)`` for its internal melspectrogram regardless of ``sr`` (the
    reference's era; later librosa switched to sr/2).  At the reference's
    sr=30720 this shapes the mel bank and hence the envelope, onset peaks,
    and beats.
    """
    S = power_to_db(melspectrogram(y, sr, n_fft, hop, n_mels, fmax=fmax),
                    ref=jnp.asarray(1.0))
    diff = S[lag:] - S[:-lag]
    env = jnp.mean(jnp.maximum(0.0, diff), axis=-1)
    pad = lag + (n_fft // (2 * hop) if center else 0)
    env = jnp.pad(env, (pad, 0))
    return env[:S.shape[0]]
