"""Pin eval/features.py to a direct scalar transcription of the public
``aist_plusplus_api`` extractors (github.com/google/aistplusplus_api,
``aist_plusplus/features/{kinetic,manual,utils}.py``).

The package is not installable in this offline environment, so the oracle
below transcribes its per-frame loops 1:1 (same iteration ranges, window
guards, normalization order, and operator argument order) and the module
under test must match it to float tolerance.  This is the unit-pin half of
the parity story; the derivation notes live in the module docstrings.
"""

import numpy as np
import pytest

from mint_tpu.eval import features as F

RNG = np.random.default_rng(11)


# ---------------------------------------------------------------------------
# Oracle: scalar transcription of upstream utils.py + kinetic.py
# ---------------------------------------------------------------------------

FT = 1.0 / 60.0
W = 2  # sliding_window


def _oracle_avg_velocity(pos, i, joint, comps=None):
    """utils.calc_average_velocity{,_horizontal,_vertical} (up_vec='y')."""
    count = 0
    s = np.zeros(3)
    for j in range(-W, W + 1):
        if i + j - 1 < 0 or i + j >= len(pos):
            continue
        s += pos[i + j][joint] - pos[i + j - 1][joint]
        count += 1
    v = s / (count * FT)
    if comps is not None:
        v = v[comps]
    return np.linalg.norm(v)


def _oracle_avg_acceleration(pos, i, joint):
    """utils.calc_average_acceleration."""
    count = 0
    s = np.zeros(3)
    for j in range(-W, W + 1):
        if i + j - 1 < 0 or i + j + 1 >= len(pos):
            continue
        v2 = (pos[i + j + 1][joint] - pos[i + j][joint]) / FT
        v1 = (pos[i + j][joint] - pos[i + j - 1][joint]) / FT
        s += (v2 - v1) / FT
        count += 1
    return np.linalg.norm(s / count)


def _oracle_kinetic(pos):
    """kinetic.py::extract_kinetic_features."""
    out = []
    T = len(pos)
    for joint in range(pos.shape[1]):
        e_h = sum(_oracle_avg_velocity(pos, i, joint, [0, 2]) ** 2
                  for i in range(1, T)) / (T - 1.0)
        e_v = sum(_oracle_avg_velocity(pos, i, joint, [1]) ** 2
                  for i in range(1, T)) / (T - 1.0)
        e_a = sum(_oracle_avg_acceleration(pos, i, joint)
                  for i in range(1, T)) / (T - 1.0)
        out.extend([e_h, e_v, e_a])
    return np.array(out, np.float32)


# ---------------------------------------------------------------------------
# Oracle: scalar transcription of upstream manual.py feature primitives
# ---------------------------------------------------------------------------


def _fetch(pos_t, name):
    if name == "zero":
        return np.zeros(3)
    if name == "y_unit":
        return np.array([0.0, 1.0, 0.0])
    if name == "minus_y_unit":
        return np.array([0.0, -1.0, 0.0])
    if name == "y_min":
        return np.array([0.0, min(y for (_, y, _) in pos_t), 0.0])
    return np.asarray(pos_t[F._J[name]])


def _oracle_manual(pos):
    """manual.py::extract_manual_features: frames 1, 31, 61, ... with the
    hardcoded canonical limb lengths and upstream operator argument order
    (distance_from_plane uses cross(ca, ba); nmove uses cross(j31, j21);
    angle_within_range uses strict inequalities)."""
    hl, sw, hw = F.HL, F.SW, F.HW

    def plane(t, j1, j2, j3, j4, th):
        a, b, c, p = (_fetch(pos[t], j) for j in (j1, j2, j3, j4))
        cross = np.cross(c - a, b - a)
        return np.dot(cross, p - a) / np.linalg.norm(cross) > th

    def nplane(t, j1, j2, j3, j4, th):
        n1, n2, a, p = (_fetch(pos[t], j) for j in (j1, j2, j3, j4))
        normal = n2 - n1
        return np.dot(normal, p - a) / np.linalg.norm(normal) > th

    def move(t, j1, j2, j3, j4, th):
        j1c, j2c, j3c, pc = (_fetch(pos[t], j) for j in (j1, j2, j3, j4))
        j3p, pp = _fetch(pos[t - 1], j3), _fetch(pos[t - 1], j4)
        velocity = pc - pp - (j3c - j3p)
        direction = j2c - j1c
        v = np.dot(velocity, direction) / np.linalg.norm(direction) / FT
        return v > th

    def nmove(t, j1, j2, j3, j4, th):
        j1c, j2c, j3c, pc = (_fetch(pos[t], j) for j in (j1, j2, j3, j4))
        pp = _fetch(pos[t - 1], j4)
        direction = np.cross(j3c - j1c, j2c - j1c)
        v = np.dot(pc - pp, direction) / np.linalg.norm(direction) / FT
        return v > th

    def angle(t, j1, j2, k1, k2, rng):
        j = _fetch(pos[t], j2) - _fetch(pos[t], j1)
        k = _fetch(pos[t], k2) - _fetch(pos[t], k1)
        ang = np.degrees(np.arccos(
            np.dot(j, k) / (np.linalg.norm(j) * np.linalg.norm(k))))
        return rng[0] < ang < rng[1]

    def fast(t, j1, th):
        v = np.linalg.norm(_fetch(pos[t], j1) - _fetch(pos[t - 1], j1)) / FT
        return v > th

    rows = []
    for t in range(1, pos.shape[0], 30):
        rows.append([
            nmove(t, "neck", "rhip", "lhip", "rwrist", 1.8 * hl),
            nmove(t, "neck", "lhip", "rhip", "lwrist", 1.8 * hl),
            nplane(t, "chest", "neck", "neck", "rwrist", 0.2 * hl),
            nplane(t, "chest", "neck", "neck", "lwrist", 0.2 * hl),
            move(t, "belly", "chest", "chest", "rwrist", 1.8 * hl),
            move(t, "belly", "chest", "chest", "lwrist", 1.8 * hl),
            angle(t, "relbow", "rshoulder", "relbow", "rwrist", [0, 110]),
            angle(t, "lelbow", "lshoulder", "lelbow", "lwrist", [0, 110]),
            nplane(t, "lshoulder", "rshoulder", "lwrist", "rwrist",
                   2.5 * sw),
            move(t, "lwrist", "rwrist", "rwrist", "lwrist", 1.4 * hl),
            move(t, "rwrist", "root", "lwrist", "root", 1.4 * hl),
            move(t, "lwrist", "root", "rwrist", "root", 1.4 * hl),
            fast(t, "rwrist", 2.5 * hl),
            fast(t, "lwrist", 2.5 * hl),
            plane(t, "root", "lhip", "ltoes", "rankle", 0.38 * hl),
            plane(t, "root", "rhip", "rtoes", "lankle", 0.38 * hl),
            nplane(t, "zero", "y_unit", "y_min", "rankle", 1.2 * hl),
            nplane(t, "zero", "y_unit", "y_min", "lankle", 1.2 * hl),
            nplane(t, "lhip", "rhip", "lankle", "rankle", 2.1 * hw),
            angle(t, "rknee", "rhip", "rknee", "rankle", [0, 110]),
            angle(t, "lknee", "lhip", "lknee", "lankle", [0, 110]),
            fast(t, "rankle", 2.5 * hl),
            fast(t, "lankle", 2.5 * hl),
            angle(t, "neck", "root", "rshoulder", "relbow", [25, 180]),
            angle(t, "neck", "root", "lshoulder", "lelbow", [25, 180]),
            angle(t, "neck", "root", "rhip", "rknee", [50, 180]),
            angle(t, "neck", "root", "lhip", "lknee", [50, 180]),
            plane(t, "rankle", "neck", "lankle", "root", 0.5 * hl),
            angle(t, "neck", "root", "zero", "y_unit", [70, 110]),
            nplane(t, "zero", "minus_y_unit", "y_min", "rwrist", -1.2 * hl),
            nplane(t, "zero", "minus_y_unit", "y_min", "lwrist", -1.2 * hl),
            fast(t, "root", 2.3 * hl),
        ])
    return np.array(rows, np.float32).mean(axis=0)


# ---------------------------------------------------------------------------
# Pins
# ---------------------------------------------------------------------------


def _random_track(T, scale=0.3, seed=0):
    rng = np.random.default_rng(seed)
    # Smooth-ish random motion so booleans are not all trivially 0/1.
    base = rng.standard_normal((1, 24, 3))
    drift = np.cumsum(rng.standard_normal((T, 24, 3)) * scale * 0.1, axis=0)
    return (base + drift).astype(np.float64)


@pytest.mark.parametrize("T,seed", [(7, 0), (61, 1), (121, 2), (240, 3)])
def test_kinetic_matches_upstream_transcription(T, seed):
    pos = _random_track(T, seed=seed)
    got = F.extract_kinetic_features(pos)
    want = _oracle_kinetic(pos)
    assert got.shape == (72,) and got.dtype == np.float32
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("T,seed", [(31, 0), (61, 4), (121, 5), (301, 6)])
def test_manual_matches_upstream_transcription(T, seed):
    pos = _random_track(T, scale=3.0, seed=seed)
    got = F.extract_manual_features(pos)
    want = _oracle_manual(pos)
    assert got.shape == (32,) and got.dtype == np.float32
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_manual_uses_canonical_limb_lengths_not_input_skeleton():
    """Upstream hardcodes HL/SW/HW from the canonical rest pose; scaling
    the input skeleton must therefore change the features (thresholds do
    not rescale with the input)."""
    pos = _random_track(301, scale=0.3, seed=7)
    f1 = F.extract_manual_features(pos)
    f2 = F.extract_manual_features(pos * 3.0)
    assert not np.allclose(f1, f2)
    # And the constants themselves pin to the upstream values.
    np.testing.assert_allclose(F.HL, 0.2314464, atol=1e-6)
    np.testing.assert_allclose(F.SW, 0.3957781, atol=1e-6)
    np.testing.assert_allclose(F.HW, 0.1174729, atol=1e-6)


def test_manual_samples_every_30th_frame():
    """Only frames 1, 31, 61, ... are read (plus their predecessors)."""
    pos = _random_track(91, scale=3.0, seed=8)
    f1 = F.extract_manual_features(pos)
    poisoned = pos.copy()
    for t in range(91):
        if t not in (0, 1, 30, 31, 60, 61, 90):
            poisoned[t] += 100.0  # any sampled read would change booleans
    f2 = F.extract_manual_features(poisoned)
    np.testing.assert_array_equal(f1, f2)


def test_kinetic_last_frame_contributes():
    """Upstream's acceleration average runs over frames 1..T-1 (the last
    frame keeps a truncated window) — perturbing the final frame must
    change the energy-expenditure components."""
    pos = _random_track(61, seed=9)
    f1 = F.extract_kinetic_features(pos).reshape(24, 3)
    pos2 = pos.copy()
    pos2[-1] += 1.0
    f2 = F.extract_kinetic_features(pos2).reshape(24, 3)
    assert not np.allclose(f1[:, 2], f2[:, 2])
