"""The 35-dim AIST++ audio feature frontend.

Assembles per-frame features exactly as the reference caches them
(reference ``tools/preprocessing.py:77-118``): at SR = 60 fps x 512 hop =
30720 Hz,

  [onset envelope (1) | MFCC (20) | CENS chroma (12) | onset-peak one-hot
   (1) | beat one-hot (1)]  ->  [T, 35] float32

including the music-name -> start-BPM seeding rule for the beat tracker
(``_get_tempo``, preprocessing.py:82-90).
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from mint_tpu.audio import beat as beat_lib
from mint_tpu.audio import cqt as cqt_lib
from mint_tpu.audio import device
from mint_tpu.audio import onset as onset_lib
from mint_tpu.audio import resample as resample_lib
from mint_tpu.audio import spectral

FPS = 60
HOP_LENGTH = 512
SR = FPS * HOP_LENGTH  # 30720


def tempo_from_name(audio_name: str) -> int:
    """AIST++ music-name -> BPM rule (preprocessing.py:82-90)."""
    assert len(audio_name) == 4, audio_name
    genre = audio_name[:3]
    if genre in ("mBR", "mPO", "mLO", "mMH", "mLH", "mWA", "mKR", "mJS",
                 "mJB"):
        return int(audio_name[3]) * 10 + 80
    if genre == "mHO":
        return int(audio_name[3]) * 5 + 110
    raise ValueError(f"unknown AIST++ music name: {audio_name}")


def extract_audio_features(y: np.ndarray, sr: int = SR,
                           start_bpm: Optional[float] = None) -> np.ndarray:
    """[T] mono audio at `sr` -> [T_frames, 35] feature matrix."""
    if sr != SR:
        y = resample_lib.resample(y, sr, SR)
    with device.on_audio_device():
        yj = jnp.asarray(np.asarray(y, np.float32))
        envelope = np.asarray(spectral.onset_strength(yj, SR))     # [T]
        mfcc = np.asarray(spectral.mfcc(yj, SR, n_mfcc=20))        # [T, 20]
    chroma = cqt_lib.chroma_cens(np.asarray(y, np.float32), SR,
                                 hop=HOP_LENGTH, n_chroma=12)      # [T, 12]

    peak_idxs = onset_lib.onset_detect(envelope, SR, HOP_LENGTH)
    peak_onehot = np.zeros_like(envelope, dtype=np.float32)
    peak_onehot[peak_idxs] = 1.0

    _, beat_idxs = beat_lib.beat_track(
        envelope, SR, HOP_LENGTH,
        start_bpm=float(start_bpm) if start_bpm else 120.0,
        tightness=100.0)
    beat_onehot = np.zeros_like(envelope, dtype=np.float32)
    beat_onehot[beat_idxs] = 1.0

    t = min(len(envelope), mfcc.shape[0], chroma.shape[0])
    return np.concatenate([
        envelope[:t, None].astype(np.float32),
        mfcc[:t].astype(np.float32),
        chroma[:t].astype(np.float32),
        peak_onehot[:t, None],
        beat_onehot[:t, None],
    ], axis=-1)


class AudioFeatureExtractor:
    """File-level extractor with the reference's .npy cache layout."""

    def __init__(self, audio_dir: str, cache_dir: Optional[str] = None):
        self.audio_dir = audio_dir
        self.cache_dir = cache_dir
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)

    def __call__(self, audio_name: str) -> np.ndarray:
        if self.cache_dir:
            cache_path = os.path.join(self.cache_dir, f"{audio_name}.npy")
            if os.path.exists(cache_path):
                return np.load(cache_path)
        y, _ = resample_lib.load(
            os.path.join(self.audio_dir, f"{audio_name}.wav"), sr=SR)
        feats = extract_audio_features(
            y, SR, start_bpm=tempo_from_name(audio_name))
        if self.cache_dir:
            np.save(cache_path, feats)
        return feats
