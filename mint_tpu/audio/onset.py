"""Onset peak picking (librosa.onset.onset_detect / util.peak_pick).

Host-side NumPy: the picking logic is a tiny sequential scan over a
~60 Hz envelope (SURVEY.md §2.1(1) keeps peak-picking host-side).
Parameter defaults follow librosa's onset_detect time-based defaults
evaluated at the reference's sr=30720, hop=512 (60 envelope frames/sec).
"""

from __future__ import annotations

import numpy as np


def peak_pick(x: np.ndarray, pre_max: int, post_max: int, pre_avg: int,
              post_avg: int, delta: float, wait: int) -> np.ndarray:
    """Indices i where x[i] is the max of [i-pre_max, i+post_max), is at
    least mean([i-pre_avg, i+post_avg)) + delta, and i is > `wait` past the
    previously selected peak (librosa.util.peak_pick)."""
    x = np.asarray(x, np.float64)
    n = len(x)
    peaks = []
    last = -1 - wait
    for i in range(n):
        lo_m, hi_m = max(0, i - pre_max), min(n, i + post_max)
        if x[i] != x[lo_m:hi_m].max():
            continue
        lo_a, hi_a = max(0, i - pre_avg), min(n, i + post_avg)
        if x[i] < x[lo_a:hi_a].mean() + delta:
            continue
        if i - last <= wait:
            continue
        last = i
        peaks.append(i)
    return np.asarray(peaks, np.int64)


def onset_detect(onset_envelope: np.ndarray, sr: int,
                 hop_length: int = 512) -> np.ndarray:
    """Frame indices of onsets (librosa.onset.onset_detect defaults).

    The envelope is shift-min / scale-max normalized to [0, 1] before
    picking, as librosa does.
    """
    env = np.asarray(onset_envelope, np.float64).ravel()
    if not env.any() or not np.all(np.isfinite(env)):
        return np.asarray([], np.int64)
    env = env - env.min()
    m = env.max()
    if m > 0:
        env = env / m
    # librosa's time-based defaults, in frames (integer floor division):
    pre_max = int(0.03 * sr // hop_length)        # 30 ms
    post_max = int(0.0 * sr // hop_length + 1)    # 0 ms
    pre_avg = int(0.10 * sr // hop_length)        # 100 ms
    post_avg = int(0.10 * sr // hop_length + 1)   # 100 ms
    wait = int(0.03 * sr // hop_length)           # 30 ms
    delta = 0.07
    return peak_pick(env, pre_max, post_max, pre_avg, post_avg, delta, wait)
