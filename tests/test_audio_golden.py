"""Golden comparison against real librosa outputs, when fixtures exist.

tests/golden/gen_audio_goldens.py (run in a librosa-equipped environment)
drops per-stage .npy files into tests/golden/; this module then compares
our frontend against them on the identical seeded signals.  Skipped
cleanly when no goldens are present (the offline build image cannot
generate them — docs/AUDIO_PARITY.md item 3).
"""

import os
import sys

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
sys.path.insert(0, GOLDEN_DIR)

from gen_audio_goldens import SR, HOP, make_signals  # noqa: E402

SIGNALS = make_signals()


def _golden(name):
    path = os.path.join(GOLDEN_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"no librosa golden fixture {name} "
                    "(generate with tests/golden/gen_audio_goldens.py)")
    return np.load(path)


def test_skip_debt_is_exactly_the_documented_set():
    """Keep the scoreboard honest: the in-image suite documents exactly 12
    golden-test skips (README / docs/AUDIO_PARITY.md item 3).  Golden
    fixtures must be either ALL present (0 skips) or ALL absent (the 12
    documented skips); a partial set means a fixture was added or deleted
    silently, and this fails loudly instead of quietly changing coverage.
    """
    expected = {f"{sig}_{stage}.npy"
                for sig in ("noise", "click", "tone")
                for stage in ("envelope", "mfcc", "cens", "peaks",
                              "beats", "tempo")}
    present = {n for n in expected
               if os.path.exists(os.path.join(GOLDEN_DIR, n))}
    assert present in (set(), expected), (
        f"partial golden fixture set: present={sorted(present)}; "
        "regenerate ALL with tests/golden/gen_audio_goldens.py or remove "
        "all, and update the documented skip count")


@pytest.mark.parametrize("sig", ["noise", "click", "tone"])
def test_envelope_golden(sig):
    from mint_tpu.audio import spectral
    want = _golden(f"{sig}_envelope.npy")
    got = np.asarray(spectral.onset_strength(SIGNALS[sig], SR))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("sig", ["noise", "click", "tone"])
def test_mfcc_golden(sig):
    from mint_tpu.audio import spectral
    want = _golden(f"{sig}_mfcc.npy")
    got = np.asarray(spectral.mfcc(SIGNALS[sig], SR, n_mfcc=20))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-2)


@pytest.mark.parametrize("sig", ["noise", "click", "tone"])
def test_cens_golden(sig):
    from mint_tpu.audio import cqt as cqt_lib
    want = _golden(f"{sig}_cens.npy")
    got = cqt_lib.chroma_cens(SIGNALS[sig], SR, hop=HOP, n_chroma=12)
    assert got.shape == want.shape
    # CENS quantizes to multiples of 0.25 pre-smoothing; allow recursive-
    # CQT vs direct-CQT differences only below one quantization step.
    np.testing.assert_allclose(got, want, atol=0.05)


@pytest.mark.parametrize("sig", ["noise", "click", "tone"])
def test_peaks_and_beats_golden(sig):
    from mint_tpu.audio import beat as beat_lib
    from mint_tpu.audio import onset as onset_lib
    env = _golden(f"{sig}_envelope.npy").astype(np.float64)
    np.testing.assert_array_equal(
        onset_lib.onset_detect(env, SR, HOP), _golden(f"{sig}_peaks.npy"))
    tempo, beats = beat_lib.beat_track(env, SR, HOP, start_bpm=110.0,
                                       tightness=100.0)
    np.testing.assert_array_equal(beats, _golden(f"{sig}_beats.npy"))
    np.testing.assert_allclose(tempo, float(_golden(f"{sig}_tempo.npy")),
                               rtol=1e-6)
