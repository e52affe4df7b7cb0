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


# ---------------------------------------------------------------------------
# Round-3 oracles: the three stages VERDICT r2 flagged as unpinned —
# end-to-end MFCC, CQT kernel construction + projection, and the resampler.
# ---------------------------------------------------------------------------


def oracle_dct2_ortho_rows(X, n_out):
    """scipy.fftpack.dct(type=2, norm='ortho') per row, scalar transcription
    (librosa.feature.mfcc applies it along the mel axis)."""
    import math
    n_frames, N = X.shape
    out = np.zeros((n_frames, n_out))
    for t in range(n_frames):
        for k in range(n_out):
            acc = 0.0
            for n in range(N):
                acc += X[t, n] * math.cos(
                    math.pi * k * (2 * n + 1) / (2 * N))
            f = math.sqrt(1.0 / (4 * N)) if k == 0 \
                else math.sqrt(1.0 / (2 * N))
            out[t, k] = 2.0 * f * acc
    return out


def test_mfcc_end_to_end_matches_oracle():
    """The full MFCC chain (preprocessing.py:99): stft power -> mel ->
    power_to_db -> DCT-II/ortho, composed f64 scalar oracle vs our f32
    XLA chain."""
    rng = np.random.default_rng(11)
    t = np.arange(8192) / SR
    y = (0.3 * rng.standard_normal(8192)
         + 0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float64)
    S = oracle_stft_power(y, 2048, HOP) @ oracle_mel_fb(SR, 2048).T
    want = oracle_dct2_ortho_rows(oracle_power_to_db(S), 20)
    import jax.numpy as jnp
    got = np.asarray(spectral.mfcc(jnp.asarray(y, jnp.float32), SR,
                                   n_mfcc=20))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-2)


def _oracle_cqt_bin_frame(y, sr, k, frame, hop=HOP, fmin=cqt_lib.C1_HZ,
                          bins_per_octave=36, n_bins=252):
    """Scalar transcription of librosa filters.constant_q +
    __cqt_filter_fft + __cqt_response for ONE (bin, frame) pair:
    construct kernel k sample-by-sample (complex exponential over
    arange(-flen//2, flen//2) float floor-division semantics, periodic
    Hann, L1 norm, center-pad, length/n_fft scaling), FFT it, project the
    positive-frequency half against the ones-window frame spectrum, and
    apply the 1/sqrt(length) scale.  np.fft is used only as the DFT
    backend (the implementation under test uses jnp.fft)."""
    import math
    q = 1.0 / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    freqs = [fmin * 2.0 ** (b / bins_per_octave) for b in range(n_bins)]
    max_len = q * sr / freqs[0]
    n_fft = 1 << int(math.ceil(math.log2(max_len)))

    f = freqs[k]
    flen = q * sr / f
    start = math.floor(-flen / 2)
    stop = math.floor(flen / 2)
    count = stop - start
    kern = np.zeros(count, np.complex128)
    for j in range(count):
        n = start + j
        w = 0.5 - 0.5 * math.cos(2.0 * math.pi * j / count)
        kern[j] = w * complex(math.cos(2 * math.pi * f * n / sr),
                              math.sin(2 * math.pi * f * n / sr))
    l1 = 0.0
    for v in kern:
        l1 += abs(v)
    kern /= l1
    padded = np.zeros(n_fft, np.complex128)
    off = (n_fft - count) // 2
    padded[off:off + count] = kern * (flen / n_fft)
    kern_fft = np.fft.fft(padded)[:n_fft // 2 + 1]

    ypad = np.pad(np.asarray(y, np.float64), n_fft // 2, mode="reflect")
    seg = ypad[frame * hop:frame * hop + n_fft]
    spec = np.fft.rfft(seg)
    return abs(np.sum(kern_fft * spec)) / math.sqrt(flen)


def test_cqt_kernel_and_projection_matches_oracle():
    """Pin the CQT core (preprocessing.py:100-102 feeds chroma_cens from
    it): kernel construction + frequency-domain projection, spot-checked
    at a spread of (bin, frame) pairs against the scalar oracle.  The
    oracle projects the FULL spectrum, so this also bounds the
    band-limited (energy_keep=0.9999) projection approximation."""
    rng = np.random.default_rng(13)
    t = np.arange(40960) / SR
    y = (0.05 * rng.standard_normal(len(t))
         + 0.4 * np.sin(2 * np.pi * 220.0 * t)
         + 0.2 * np.sin(2 * np.pi * 660.0 * t)
         + 0.1 * np.sin(2 * np.pi * 1760.0 * t)).astype(np.float64)
    got = cqt_lib.cqt_magnitude(y, SR, tuning=0.0)
    n_frames = got.shape[0]
    ref_scale = float(got.max())
    for k in (0, 35, 120, 215, 251):
        for frame in (0, n_frames // 2, n_frames - 1):
            want = _oracle_cqt_bin_frame(y, SR, k, frame)
            assert abs(got[frame, k] - want) < 2e-3 * ref_scale + 2e-4, (
                k, frame, got[frame, k], want)


def test_cqt_recursive_vs_single_resolution_measured_bound():
    """librosa's CQT computes lower octaves by successive 2x downsampling
    and reuse of the top-octave kernels; ours is single-resolution exact
    (docs/AUDIO_PARITY.md limit 2).  This MEASURES that divergence on a
    music-like signal by transcribing the recursion (top-octave kernels,
    halve the rate and hop per octave, our polyphase decimator) and
    comparing: the delta IS the recursion's downsampling-chain error.
    Kernel identity across rates is exact — a kernel for f at sr equals
    the kernel for f/2 at sr/2 sample-for-sample (flen = q*sr/f is rate
    invariant), which is why librosa can reuse the basis."""
    from mint_tpu.audio import resample as rs

    rng = np.random.default_rng(17)
    sr, hop, bpo, n_oct = SR, HOP, 36, 7
    t = np.arange(61440) / sr
    y = 0.02 * rng.standard_normal(len(t))
    for note_hz, amp in ((130.8, 0.4), (329.6, 0.3), (523.3, 0.25),
                         (1046.5, 0.15), (2093.0, 0.1)):
        for h in (1, 2, 3):
            y += amp / h * np.sin(2 * np.pi * note_hz * h * t)
    single = cqt_lib.cqt_magnitude(y, sr, tuning=0.0)

    # Top-octave basis (C7..B7 at full rate), reused at every rate.
    top_fmin = cqt_lib.C1_HZ * 2.0 ** (n_oct - 1)
    fft_basis, lengths_top, n_fft = cqt_lib._cqt_kernels(sr, top_fmin,
                                                         bpo, bpo)
    fft_basis = fft_basis.astype(np.complex128)

    q = 1.0 / (2.0 ** (1.0 / bpo) - 1.0)
    freqs = cqt_lib.C1_HZ * 2.0 ** (np.arange(n_oct * bpo) / bpo)
    lengths_full = q * sr / freqs

    rec = np.zeros_like(single)
    y_o, sr_o, hop_o = np.asarray(y, np.float64), sr, hop
    n_frames = single.shape[0]
    for d in range(n_oct):  # d downsamplings -> octave (n_oct-1-d)
        ypad = np.pad(y_o, n_fft // 2, mode="reflect")
        frames = min(n_frames, len(y_o) // hop_o + 1)
        idx = (np.arange(frames)[:, None] * hop_o
               + np.arange(n_fft)[None, :])
        spec = np.fft.rfft(ypad[idx], n_fft, axis=-1)
        # The local projection scales with the LOCAL kernel length
        # (L_full / 2^d); compensate by 2^d so all octaves are on the
        # full-rate scale before the common 1/sqrt(length) normalization
        # (librosa splits this compensation between a sqrt(2) signal
        # boost per downsample and a sqrt(sr/my_sr) basis rescale).
        resp = np.abs(spec @ fft_basis.T) * (2.0 ** d)
        rows = slice((n_oct - 1 - d) * bpo, (n_oct - d) * bpo)
        rec[:frames, rows] = resp / np.sqrt(lengths_full[rows])[None, :]
        if d < n_oct - 1:
            y_o = np.asarray(rs.resample(y_o, sr_o, sr_o // 2),
                             np.float64)
            sr_o //= 2
            hop_o //= 2
    # Strong cells (the ones CENS's 4-level quantization can see).  Weak
    # noise-floor cells diverge more — the recursion's anti-alias filters
    # REMOVE the broadband noise that leaks into kernel sidelobes in the
    # exact single-resolution form — but those sit below the CENS
    # thresholds by construction.
    strong = single > 0.1 * single.max()
    rel = np.abs(rec[strong] - single[strong]) / single[strong]
    med, p95 = float(np.median(rel)), float(np.percentile(rel, 95))
    print(f"recursive-vs-single CQT, strong cells: median {med:.2%}, "
          f"p95 {p95:.2%} over {int(strong.sum())} cells")
    assert med < 0.01 and p95 < 0.10, (med, p95)

    # End-to-end: the delta that actually reaches the 35-dim features.
    def fold(C):
        return cqt_lib.fold_cq_to_chroma(C, n_oct, 12, 36)

    d_cens = np.abs(cqt_lib.cens_from_chroma(fold(single))
                    - cqt_lib.cens_from_chroma(fold(rec)))
    print(f"CENS end-to-end delta: median {np.median(d_cens):.5f}, "
          f"max {d_cens.max():.5f} (quantization weight: 0.25)")
    assert float(d_cens.max()) < 0.1, d_cens.max()


def test_resample_polyphase_matches_scipy_with_identical_taps():
    """Pin the polyphase APPLICATION (padding, phase alignment, output
    offset) against scipy's independent C upfirdn via resample_poly with
    our exact taps (scipy scales an explicit window by `up`, hence
    taps/up).  Any residual vs librosa is then filter-DESIGN only
    (resampy interpolates a precision-512 table of the same
    kaiser-windowed sinc; we evaluate it exactly)."""
    from fractions import Fraction

    from scipy.signal import resample_poly

    from mint_tpu.audio import resample as rs

    rng = np.random.default_rng(19)
    x = rng.standard_normal(48000)
    for orig, tgt in ((48000, 30720), (44100, 30720), (22050, 30720),
                      (30720, 48000)):
        fr = Fraction(tgt, orig)
        up, down = fr.numerator, fr.denominator
        taps = rs._sinc_filter(up, down)
        ours = np.asarray(rs.resample(x, orig, tgt), np.float64)
        want = resample_poly(x, up, down, window=taps / up)
        assert len(ours) == len(want) == int(np.ceil(len(x) * up / down))
        np.testing.assert_allclose(ours, want, rtol=0, atol=5e-7)


def test_resample_tone_fidelity_and_stopband():
    """Ground-truth check of the whole resample path: an in-band tone
    must survive 48k->30720 with unit gain and exact frequency; an
    out-of-band tone (above the target Nyquist) must vanish into the
    kaiser_best stopband (beta 14.77 ~ -140 dB design)."""
    from mint_tpu.audio import resample as rs

    n = 48000 * 2
    t = np.arange(n) / 48000.0
    tone = np.sin(2 * np.pi * 1000.0 * t)
    out = np.asarray(rs.resample(tone, 48000, SR), np.float64)
    # Amplitude via RMS over an interior window (skip filter edges).
    seg = out[2000:-2000]
    rms = np.sqrt((seg ** 2).mean())
    assert abs(rms - 1.0 / np.sqrt(2)) < 1e-4, rms
    # Frequency via FFT peak of the interior segment.
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    peak_hz = np.argmax(spec) * SR / len(seg)
    assert abs(peak_hz - 1000.0) < SR / len(seg) * 1.5, peak_hz

    alias = np.sin(2 * np.pi * 16000.0 * t)  # > 30720/2 Nyquist
    out = np.asarray(rs.resample(alias, 48000, SR), np.float64)
    rms = np.sqrt((out[2000:-2000] ** 2).mean())
    assert 20 * np.log10(max(rms, 1e-30) / (1 / np.sqrt(2))) < -100.0, rms


def test_resample_filter_design_properties():
    """Analytic pins on the kaiser_best tap family itself: per-phase DC
    gain (amplitude preservation) and stopband depth consistent with the
    beta=14.77 Kaiser design."""
    from numpy.fft import rfft

    from mint_tpu.audio import resample as rs

    up, down = 16, 25
    taps = rs._sinc_filter(up, down)
    # Sum over each polyphase branch = per-output-sample gain ~= 1.
    half = (len(taps) - 1) // 2
    for phase in range(up):
        idx = np.arange(-half + ((half + phase) % up), len(taps) - half,
                        up) + half
        idx = idx[(idx >= 0) & (idx < len(taps))]
        assert abs(taps[idx].sum() - 1.0) < 1e-3, phase
    # Frequency response: stopband (beyond cutoff) at/below ~-130 dB.
    n_fft = 1 << 18
    H = np.abs(rfft(taps, n_fft))
    H /= H.max()
    cutoff = rs._ROLLOFF * min(1.0, up / down)
    # Taps live on the up-sampled grid: normalized frequency (Nyquist=1)
    # of the design cutoff is cutoff/up.
    fn = np.arange(len(H)) / n_fft * 2.0
    stop = H[fn > (cutoff / up) * 1.35]
    assert 20 * np.log10(stop.max()) < -120.0, 20 * np.log10(stop.max())


def test_chroma_fold_matches_cq_to_chroma_basis():
    """Pin fold_cq_to_chroma against an independent transcription of
    librosa.filters.cq_to_chroma's BASIS construction (repeat -> tile ->
    axis-1 centering roll by -(n_merge//2); the axis-0 base-C roll is 0
    for the C1 basis): chroma = M @ C.  Regression for the fold that
    omitted the centering roll (every pitch class off by one
    1/3-semitone bin)."""
    from mint_tpu.audio import cqt as cqt_lib

    n_chroma, bpo, n_oct = 12, 36, 7
    n_input = n_oct * bpo
    n_merge = bpo // n_chroma
    # librosa filters.cq_to_chroma (librosa 0.8.1):
    m = np.repeat(np.eye(n_chroma), n_merge, axis=1)          # [12, 36]
    m = np.tile(m, n_oct)[:, :n_input]                        # [12, 252]
    m = np.roll(m, -(n_merge // 2), axis=1)  # center on the target bin
    C = np.abs(np.random.default_rng(11).standard_normal((50, n_input)))
    want = C @ m.T
    got = cqt_lib.fold_cq_to_chroma(C, n_oct, n_chroma, bpo)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # Spot-check the mapping: energy at bin 3c+1 (class center) and the
    # wrap bin 35 -> class 0.
    e = np.zeros((1, n_input))
    e[0, 3 * 5 + 1] = 1.0   # center bin of class 5
    assert cqt_lib.fold_cq_to_chroma(e, n_oct, n_chroma, bpo)[0, 5] == 1.0
    e = np.zeros((1, n_input))
    e[0, 35] = 1.0          # top bin of octave 0 wraps into class 0
    assert cqt_lib.fold_cq_to_chroma(e, n_oct, n_chroma, bpo)[0, 0] == 1.0
