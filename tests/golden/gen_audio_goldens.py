"""Generate librosa golden fixtures for the audio frontend.

Run this IN AN ENVIRONMENT WITH librosa 0.8.x/0.9.x INSTALLED (the build
image has neither network nor a wheel cache — see docs/AUDIO_PARITY.md):

    python tests/golden/gen_audio_goldens.py

It writes per-stage .npy goldens next to itself; tests/test_audio_golden.py
picks them up automatically on the next pytest run (and skips when absent).
The input signals are deterministic (seeded) and regenerated identically by
the test, so only the librosa OUTPUTS are stored.
"""

import os

import numpy as np

SR = 30720
HOP = 512
OUT = os.path.dirname(os.path.abspath(__file__))


def make_signals():
    rng = np.random.default_rng(20260816)
    noise = rng.standard_normal(SR).astype(np.float32)
    # 110 BPM click track, 10 s.
    click = np.zeros(10 * SR, np.float32)
    period = int(round(60.0 * SR / 110.0))
    for s in range(0, len(click) - 256, period):
        click[s:s + 128] += rng.standard_normal(128).astype(np.float32)
    tone = np.sin(2 * np.pi * 440.0 * np.arange(SR) / SR).astype(np.float32)
    return {"noise": noise, "click": click, "tone": tone}


def main():
    import librosa
    print("librosa", librosa.__version__)

    for name, y in make_signals().items():
        env = librosa.onset.onset_strength(y=y, sr=SR)
        np.save(os.path.join(OUT, f"{name}_envelope.npy"), env)
        mfcc = librosa.feature.mfcc(y=y, sr=SR, n_mfcc=20).T
        np.save(os.path.join(OUT, f"{name}_mfcc.npy"), mfcc)
        chroma = librosa.feature.chroma_cens(
            y=y, sr=SR, hop_length=HOP, n_chroma=12).T
        np.save(os.path.join(OUT, f"{name}_cens.npy"), chroma)
        peaks = librosa.onset.onset_detect(
            onset_envelope=env.flatten(), sr=SR, hop_length=HOP)
        np.save(os.path.join(OUT, f"{name}_peaks.npy"), peaks)
        tempo, beats = librosa.beat.beat_track(
            onset_envelope=env, sr=SR, hop_length=HOP,
            start_bpm=110.0, tightness=100)
        np.save(os.path.join(OUT, f"{name}_beats.npy"), beats)
        np.save(os.path.join(OUT, f"{name}_tempo.npy"), np.asarray(tempo))
        print(f"wrote goldens for '{name}'")


if __name__ == "__main__":
    main()
