"""Pin the audio frontend to scalar transcriptions of librosa 0.8.x.

The reference's 35-dim audio features ARE librosa outputs
(``/root/reference/tools/preprocessing.py:98-117``), and librosa is not
installable in this offline image, so — like tests/test_features.py for the
motion extractors — each stage is pinned against an independent direct
transcription of the librosa 0.8.1 source: per-element loops following the
upstream arithmetic (window semantics, edge corrections, selection
formulas), structured differently from the vectorized/XLA implementations
under test.  Derivation notes live in docs/AUDIO_PARITY.md.
"""

import numpy as np
import pytest
from scipy.signal import get_window

from mint_tpu.audio import beat as beat_lib
from mint_tpu.audio import cqt as cqt_lib
from mint_tpu.audio import onset as onset_lib
from mint_tpu.audio import spectral

SR = 30720
HOP = 512
RNG = np.random.default_rng(3)


# ---------------------------------------------------------------------------
# Oracles (librosa 0.8.1 transcriptions)
# ---------------------------------------------------------------------------


def oracle_stft_power(y, n_fft=2048, hop=512):
    """librosa.core.stft: center reflect pad, periodic hann, rfft."""
    y = np.pad(y, n_fft // 2, mode="reflect")
    win = get_window("hann", n_fft, fftbins=True)
    frames = []
    for start in range(0, len(y) - n_fft + 1, hop):
        frames.append(np.abs(np.fft.rfft(y[start:start + n_fft] * win)) ** 2)
    return np.array(frames)  # [frames, bins]


def oracle_mel_fb(sr, n_fft, n_mels=128, fmin=0.0, fmax=None):
    """librosa.filters.mel (htk=False, norm='slaney'), element-wise."""
    if fmax is None:
        fmax = sr / 2.0

    def hz_to_mel(f):
        if f >= 1000.0:
            return 15.0 + np.log(f / 1000.0) / (np.log(6.4) / 27.0)
        return f / (200.0 / 3)

    def mel_to_hz(m):
        if m >= 15.0:
            return 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0))
        return m * (200.0 / 3)

    n_bins = 1 + n_fft // 2
    fft_f = [i * sr / 2.0 / (n_bins - 1) for i in range(n_bins)]
    lo, hi = hz_to_mel(fmin), hz_to_mel(fmax)
    mel_f = [mel_to_hz(lo + (hi - lo) * i / (n_mels + 1))
             for i in range(n_mels + 2)]
    W = np.zeros((n_mels, n_bins))
    for m in range(n_mels):
        for k in range(n_bins):
            lower = (fft_f[k] - mel_f[m]) / (mel_f[m + 1] - mel_f[m])
            upper = (mel_f[m + 2] - fft_f[k]) / (mel_f[m + 2] - mel_f[m + 1])
            W[m, k] = max(0.0, min(lower, upper))
        W[m] *= 2.0 / (mel_f[m + 2] - mel_f[m])  # slaney area norm
    return W


def oracle_power_to_db(S, top_db=80.0):
    out = 10.0 * np.log10(np.maximum(1e-10, S))
    return np.maximum(out, out.max() - top_db)


def oracle_onset_strength(y, sr, fmax=11025.0, n_fft=2048, hop=512, lag=1):
    """librosa.onset.onset_strength via the melspectrogram default
    (0.8.x: internal fmax defaults to 11025.0)."""
    S = oracle_stft_power(y, n_fft, hop) @ oracle_mel_fb(sr, n_fft,
                                                         fmax=fmax).T
    S = oracle_power_to_db(S).T  # [mels, frames] like librosa
    diff = np.maximum(0.0, S[:, lag:] - S[:, :-lag])
    env = diff.mean(axis=0)
    pad = lag + n_fft // (2 * hop)
    env = np.concatenate([np.zeros(pad), env])
    return env[:S.shape[1]]


def oracle_peak_pick(x, pre_max, post_max, pre_avg, post_avg, delta, wait):
    """librosa.util.peak_pick: truncated-window statistics per index."""
    n = len(x)
    peaks, last = [], -np.inf
    for i in range(n):
        w = x[max(0, i - pre_max):min(n, i + post_max)]
        mov_max = w.max() if len(w) else -np.inf
        wa = x[max(0, i - pre_avg):min(n, i + post_avg)]
        mov_avg = wa.mean() if len(wa) else 0.0
        d = x[i] * (x[i] == mov_max)
        d = d * (d >= mov_avg + delta)
        if d != 0 and i > last + wait:
            peaks.append(i)
            last = i
    return np.asarray(peaks, np.int64)


def oracle_tempogram_column(env_padded, t, win_length):
    """One tempogram column: windowed frame starting at t, direct
    autocorrelation, inf-norm normalized."""
    frame = env_padded[t:t + win_length] * get_window("hann", win_length,
                                                      fftbins=True)
    ac = np.correlate(frame, frame, mode="full")[win_length - 1:]
    m = np.abs(ac).max()
    return ac / (m if m >= np.finfo(np.float64).tiny else 1.0)


def oracle_beat_dp(localscore, period, tightness):
    """librosa.beat.__beat_track_dp, literal."""
    backlink = np.zeros(len(localscore), int)
    cumscore = np.zeros(len(localscore))
    window = np.arange(-2 * period, -np.round(period / 2) + 1, dtype=int)
    txwt = -tightness * (np.log(-window / period) ** 2)
    first_beat = True
    backlink[0] = -1
    for i, score_i in enumerate(localscore):
        z_pad = np.maximum(0, min(-window[0], len(window)))
        candidates = txwt.copy()
        candidates[z_pad:] = candidates[z_pad:] + cumscore[window[z_pad:]]
        beat_location = np.argmax(candidates)
        cumscore[i] = score_i + candidates[beat_location]
        if first_beat and score_i < 0.01 * localscore.max():
            backlink[i] = -1
        else:
            backlink[i] = window[beat_location]
            first_beat = False
        window = window + 1
    return backlink, cumscore


def oracle_cens_post(chroma_cf):
    """librosa.feature.chroma_cens post-chain on [n_chroma, frames]."""
    from scipy.signal import convolve2d

    def normalize(S, norm, axis):
        if norm == 1:
            length = np.abs(S).sum(axis=axis, keepdims=True)
        else:
            length = np.sqrt((S ** 2).sum(axis=axis, keepdims=True))
        length[length < np.finfo(np.float64).tiny] = 1.0
        return S / length

    chroma = normalize(chroma_cf, 1, 0)
    quant = np.zeros_like(chroma)
    for step, w in zip([0.4, 0.2, 0.1, 0.05], [0.25] * 4):
        quant += (chroma > step) * w
    win = get_window("hann", 43, fftbins=False)
    win /= np.sum(win)
    cens = convolve2d(quant, np.atleast_2d(win), mode="same",
                      boundary="fill")
    return normalize(cens, 2, 0)


def oracle_pitch_tuning(frequencies, resolution=0.01, bins_per_octave=36):
    frequencies = np.asarray(frequencies, np.float64)
    frequencies = frequencies[frequencies > 0]
    if not np.any(frequencies):
        return 0.0
    residual = np.mod(bins_per_octave
                      * np.log2(frequencies / (440.0 / 16)), 1.0)
    residual[residual >= 0.5] -= 1.0
    bins = np.linspace(-0.5, 0.5, int(np.ceil(1.0 / resolution)) + 1)
    counts, edges = np.histogram(residual, bins)
    return edges[np.argmax(counts)]


# ---------------------------------------------------------------------------
# Pins
# ---------------------------------------------------------------------------


def _noise(n, seed=0):
    return np.random.default_rng(seed).standard_normal(n).astype(np.float32)


def test_stft_power_matches_oracle():
    y = _noise(SR // 2, 1)
    ours = np.asarray(spectral.stft_power(y, 2048, HOP))
    want = oracle_stft_power(np.asarray(y, np.float64), 2048, HOP)
    assert ours.shape == want.shape
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-2)


@pytest.mark.parametrize("fmax", [None, 11025.0])
def test_mel_filterbank_matches_oracle(fmax):
    ours = spectral.mel_filterbank(SR, 2048, 128, fmax=fmax)
    want = oracle_mel_fb(SR, 2048, 128, fmax=fmax)
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-8)


def test_onset_strength_matches_oracle():
    y = _noise(SR, 2)
    ours = np.asarray(spectral.onset_strength(y, SR), np.float64)
    want = oracle_onset_strength(np.asarray(y, np.float64), SR)
    assert ours.shape == want.shape
    # f32 XLA chain vs f64 oracle through two matmuls and a log.
    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_peak_pick_matches_oracle(seed):
    x = np.abs(np.random.default_rng(seed).standard_normal(400))
    x[x < 0.4] = 0.0  # plateaus + exact zeros exercise the tie rules
    args = dict(pre_max=1, post_max=1, pre_avg=6, post_avg=7,
                delta=0.07, wait=1)
    ours = onset_lib.peak_pick(x, **args)
    want = oracle_peak_pick(np.asarray(x, np.float64), **args)
    np.testing.assert_array_equal(ours, want)


def test_onset_detect_end_to_end_vs_oracle():
    y = np.zeros(SR, np.float32)
    for s in range(2048, len(y) - 512, SR // 4):
        y[s:s + 256] += _noise(256, s)
    env = np.asarray(spectral.onset_strength(y, SR), np.float64)
    ours = onset_lib.onset_detect(env, SR, HOP)
    env_n = env - env.min()
    env_n = env_n / (env_n.max() + np.finfo(np.float64).tiny)
    want = oracle_peak_pick(env_n, 1, 1, 6, 7, 0.07, 1)
    np.testing.assert_array_equal(ours, want)


def test_tempogram_matches_oracle_columns():
    env = np.abs(_noise(200, 5)).astype(np.float64)
    win_length = 480
    tg = beat_lib.tempogram(env, win_length)
    padded = np.pad(env, win_length // 2, mode="linear_ramp", end_values=0)
    for t in [0, 57, 199]:
        want = oracle_tempogram_column(padded, t, win_length)
        np.testing.assert_allclose(tg[:, t], want, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("seed,period", [(0, 30), (1, 45), (2, 23)])
def test_beat_dp_matches_oracle(seed, period):
    env = np.abs(np.random.default_rng(seed).standard_normal(600))
    localscore = beat_lib._beat_local_score(env, period)
    bl, cs = beat_lib._dp_track(localscore, period, 100.0)
    bl_want, cs_want = oracle_beat_dp(localscore, period, 100.0)
    np.testing.assert_allclose(cs, cs_want, rtol=1e-9, atol=1e-9)
    np.testing.assert_array_equal(bl, bl_want)
    # And the backtrace end point.
    lm = np.zeros(len(cs_want), bool)
    lm[1:-1] = (cs_want[1:-1] > cs_want[:-2]) & (cs_want[1:-1] >= cs_want[2:])
    lm[-1] = cs_want[-1] > cs_want[-2]
    med = np.median(cs_want[lm])
    want_last = np.argwhere(cs_want * lm * 2 > med).max()
    assert beat_lib._last_beat(cs) == want_last


def test_cens_post_chain_matches_oracle():
    chroma = np.abs(np.random.default_rng(7).standard_normal((123, 12)))
    chroma[40:50] = 0.0  # all-zero frames exercise the norm threshold
    ours = cqt_lib.cens_from_chroma(chroma)
    want = oracle_cens_post(np.asarray(chroma.T, np.float64)).T
    np.testing.assert_allclose(ours, want, rtol=1e-9, atol=1e-12)


def test_pitch_tuning_matches_oracle():
    freqs = 440.0 * 2.0 ** (np.random.default_rng(9).uniform(
        -2, 2, size=500))
    ours = cqt_lib.pitch_tuning(freqs)
    want = oracle_pitch_tuning(freqs)
    np.testing.assert_allclose(ours, want, atol=1e-12)
