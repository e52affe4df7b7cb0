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
    least mean([i-pre_avg, i+post_avg)) + delta, and i is > `wait` past
    the previously selected peak (librosa.util.peak_pick).

    Window statistics use scipy's sliding filters with librosa's edge
    modes: max with zero-padding ('constant'), mean with edge
    replication ('nearest') — a truncated-window mean at clip edges
    would flip borderline peaks near track boundaries.
    """
    from scipy import ndimage

    x = np.asarray(x, np.float64)
    n = len(x)
    max_len = max(1, pre_max + post_max)
    avg_len = max(1, pre_avg + post_avg)
    # scipy's size-L window at origin o covers [i - L//2 + ... ]; the
    # origin that realizes [i - pre, i + post) is ceil((pre - post)/2)
    # (verified empirically against a direct loop; note it is NOT
    # L//2 - pre — scipy origins shift the window the other way).
    mov_max = ndimage.maximum_filter1d(
        x, max_len, mode="constant",
        origin=-((post_max - pre_max) // 2))
    mov_avg = ndimage.uniform_filter1d(
        x, avg_len, mode="nearest",
        origin=-((post_avg - pre_avg) // 2))
    candidates = np.flatnonzero((x == mov_max) & (x >= mov_avg + delta))
    peaks = []
    last = -1 - wait
    for i in candidates:
        if i - last <= wait:
            continue
        last = int(i)
        peaks.append(last)
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
