"""Motion feature extractors for FID scoring.

Re-implements the two feature families the reference scorer pulls from the
``aist_plusplus_api`` package (``tools/calculate_scores.py:8-9,164-170``):

- **Kinetic features** (FID_k): per-joint average horizontal/vertical
  kinetic energy and energy expenditure over the clip, after Onuma,
  Faloutsos & Hodgins, "FMDistance" (Eurographics 2008) as adapted in
  fairmotion/AIST++ — 24 joints x 3 = 72 dims.
- **Manual (geometric) features** (FID_g): Muller's boolean relational
  features ("Efficient Motion Search in Large Motion Capture Databases",
  2005) in the AIST++ selection — 32 pose expressions per frame, averaged
  over the clip.

Inputs are world-space joint positions [T, 24, 3] at 60 FPS (y-up), as
produced by :func:`mint_tpu.motion.smpl.smpl_joints`.

NOTE: the aist_plusplus_api package is not available in this environment;
these are reconstructions from the published algorithm definitions, kept
self-consistent between ground-truth and generated motion (FID compares
like with like).  Vectorized NumPy (host-side offline scoring, like the
reference).
"""

from __future__ import annotations

import numpy as np

from mint_tpu.motion.smpl import SMPL_JOINT_NAMES

_FPS = 60.0
_FRAME_TIME = 1.0 / _FPS
_J = {name: i for i, name in enumerate(SMPL_JOINT_NAMES)}


# ---------------------------------------------------------------------------
# Kinetic features (FMDistance)
# ---------------------------------------------------------------------------


def _sliding_velocity(positions: np.ndarray, window: int = 2) -> np.ndarray:
    """Per-frame average velocity vectors [T-1, J, 3].

    For frame i (1..T-1): mean over j in [-w, w] of
    (p[i+j] - p[i+j-1]) / frame_time, over valid offsets.
    """
    diffs = positions[1:] - positions[:-1]  # [T-1, J, 3]; diff d[k]=p[k+1]-p[k]
    t = diffs.shape[0]
    acc = np.zeros_like(diffs)
    cnt = np.zeros((t, 1, 1))
    for j in range(-window, window + 1):
        lo, hi = max(0, -j), min(t, t - j)
        acc[lo:hi] += diffs[lo + j:hi + j]
        cnt[lo:hi] += 1
    return acc / (cnt * _FRAME_TIME)


def _sliding_acceleration(positions: np.ndarray,
                          window: int = 2) -> np.ndarray:
    """Per-frame average acceleration vectors [T-2, J, 3]."""
    acc2 = (positions[2:] - 2 * positions[1:-1]
            + positions[:-2]) / (_FRAME_TIME ** 2)  # [T-2, J, 3]
    t = acc2.shape[0]
    out = np.zeros_like(acc2)
    cnt = np.zeros((t, 1, 1))
    for j in range(-window, window + 1):
        lo, hi = max(0, -j), min(t, t - j)
        out[lo:hi] += acc2[lo + j:hi + j]
        cnt[lo:hi] += 1
    return out / cnt


def extract_kinetic_features(positions: np.ndarray) -> np.ndarray:
    """[T, 24, 3] joints -> 72-dim kinetic feature vector.

    Per joint: [avg horizontal kinetic energy, avg vertical kinetic
    energy, avg energy expenditure (acceleration magnitude)], y-up.
    """
    positions = np.asarray(positions, np.float64)
    assert positions.ndim == 3, positions.shape
    v = _sliding_velocity(positions)          # [T-1, J, 3]
    a = _sliding_acceleration(positions)      # [T-2, J, 3]
    v_h = np.linalg.norm(v[..., [0, 2]], axis=-1)  # horizontal (x, z)
    v_v = np.abs(v[..., 1])                        # vertical (y)
    e_h = (v_h ** 2).mean(axis=0)
    e_v = (v_v ** 2).mean(axis=0)
    e_a = np.linalg.norm(a, axis=-1).mean(axis=0)
    feats = np.stack([e_h, e_v, e_a], axis=-1)     # [J, 3]
    return feats.reshape(-1).astype(np.float32)    # 72


# ---------------------------------------------------------------------------
# Manual (geometric / Muller relational) features
# ---------------------------------------------------------------------------


def _dist(a, b):
    return np.linalg.norm(a - b, axis=-1)


class _Frame:
    """Joint access for one frame with Muller's virtual joints."""

    def __init__(self, pos_t: np.ndarray):
        self.pos = pos_t  # [24, 3]

    def get(self, name: str) -> np.ndarray:
        if name == "zero":
            return np.zeros(3)
        if name == "y_unit":
            return np.array([0.0, 1.0, 0.0])
        if name == "minus_y_unit":
            return np.array([0.0, -1.0, 0.0])
        if name == "y_min":
            out = np.zeros(3)
            out[1] = self.pos[:, 1].min()
            return out
        return self.pos[_J[name]]


def _angle_within(a1, a2, b1, b2, lo_deg, hi_deg) -> float:
    """Is the angle between vectors (a2-a1) and (b2-b1) in [lo, hi] deg?"""
    u = a2 - a1
    w = b2 - b1
    nu, nw = np.linalg.norm(u), np.linalg.norm(w)
    if nu < 1e-9 or nw < 1e-9:
        return 0.0
    ang = np.degrees(np.arccos(np.clip(np.dot(u, w) / (nu * nw), -1, 1)))
    return float(lo_deg <= ang <= hi_deg)


def _plane(f: _Frame, j1, j2, j3, j4, threshold) -> float:
    """Is j4 at signed distance > threshold from the plane through
    j1, j2, j3 (normal = (j2-j1) x (j3-j1))?"""
    p1, p2, p3, p4 = f.get(j1), f.get(j2), f.get(j3), f.get(j4)
    n = np.cross(p2 - p1, p3 - p1)
    nn = np.linalg.norm(n)
    if nn < 1e-9:
        return 0.0
    d = np.dot(p4 - p1, n / nn)
    return float(d > threshold)


def _nplane(f: _Frame, j1, j2, j3, j4, threshold) -> float:
    """Is j4 at signed distance > threshold from the plane through j3 with
    normal j2-j1?"""
    p1, p2, p3, p4 = f.get(j1), f.get(j2), f.get(j3), f.get(j4)
    n = p2 - p1
    nn = np.linalg.norm(n)
    if nn < 1e-9:
        return 0.0
    d = np.dot(p4 - p3, n / nn)
    return float(d > threshold)


def _move(f: _Frame, f_prev: _Frame, j1, j2, j3, j4, threshold) -> float:
    """Is the velocity of j4 relative to j3, projected on direction j2-j1,
    above threshold (units/s)?"""
    n = f.get(j2) - f.get(j1)
    nn = np.linalg.norm(n)
    if nn < 1e-9:
        return 0.0
    v = ((f.get(j4) - f_prev.get(j4)) - (f.get(j3) - f_prev.get(j3)))
    d = np.dot(v, n / nn) / _FRAME_TIME
    return float(d > threshold)


def _nmove(f: _Frame, f_prev: _Frame, j1, j2, j3, j4, threshold) -> float:
    """Like _move with normal = cross(j2-j1, j3-j1)."""
    p1 = f.get(j1)
    n = np.cross(f.get(j2) - p1, f.get(j3) - p1)
    nn = np.linalg.norm(n)
    if nn < 1e-9:
        return 0.0
    v = f.get(j4) - f_prev.get(j4)
    d = np.dot(v, n / nn) / _FRAME_TIME
    return float(d > threshold)


def _fast(f: _Frame, f_prev: _Frame, j, threshold) -> float:
    """Is |velocity(j)| above threshold (units/s)?"""
    v = np.linalg.norm(f.get(j) - f_prev.get(j)) / _FRAME_TIME
    return float(v > threshold)


def extract_manual_features(positions: np.ndarray) -> np.ndarray:
    """[T, 24, 3] joints -> 32-dim boolean-expression feature vector
    (per-frame booleans averaged over frames 1..T-1)."""
    positions = np.asarray(positions, np.float64)
    assert positions.ndim == 3, positions.shape
    p0 = positions[0]
    hl = _dist(p0[_J["lshoulder"]], p0[_J["lelbow"]])   # humerus length
    sw = _dist(p0[_J["lshoulder"]], p0[_J["rshoulder"]])  # shoulder width
    hw = _dist(p0[_J["lhip"]], p0[_J["rhip"]])            # hip width

    rows = []
    for t in range(1, positions.shape[0]):
        f = _Frame(positions[t])
        fp = _Frame(positions[t - 1])
        rows.append([
            _nmove(f, fp, "neck", "rhip", "lhip", "rwrist", 1.8 * hl),
            _nmove(f, fp, "neck", "lhip", "rhip", "lwrist", 1.8 * hl),
            _nplane(f, "chest", "neck", "neck", "rwrist", 0.2 * hl),
            _nplane(f, "chest", "neck", "neck", "lwrist", 0.2 * hl),
            _move(f, fp, "belly", "chest", "chest", "rwrist", 1.8 * hl),
            _move(f, fp, "belly", "chest", "chest", "lwrist", 1.8 * hl),
            _angle_within(f.get("relbow"), f.get("rshoulder"),
                          f.get("relbow"), f.get("rwrist"), 0, 110),
            _angle_within(f.get("lelbow"), f.get("lshoulder"),
                          f.get("lelbow"), f.get("lwrist"), 0, 110),
            _nplane(f, "lshoulder", "rshoulder", "lwrist", "rwrist",
                    2.5 * sw),
            _move(f, fp, "lwrist", "rwrist", "rwrist", "lwrist", 1.4 * hl),
            _move(f, fp, "rwrist", "root", "lwrist", "root", 1.4 * hl),
            _move(f, fp, "lwrist", "root", "rwrist", "root", 1.4 * hl),
            _fast(f, fp, "rwrist", 2.5 * hl),
            _fast(f, fp, "lwrist", 2.5 * hl),
            _plane(f, "root", "lhip", "ltoes", "rankle", 0.38 * hl),
            _plane(f, "root", "rhip", "rtoes", "lankle", 0.38 * hl),
            _nplane(f, "zero", "y_unit", "y_min", "rankle", 1.2 * hl),
            _nplane(f, "zero", "y_unit", "y_min", "lankle", 1.2 * hl),
            _nplane(f, "lhip", "rhip", "lankle", "rankle", 2.1 * hw),
            _angle_within(f.get("rknee"), f.get("rhip"),
                          f.get("rknee"), f.get("rankle"), 0, 110),
            _angle_within(f.get("lknee"), f.get("lhip"),
                          f.get("lknee"), f.get("lankle"), 0, 110),
            _fast(f, fp, "rankle", 2.5 * hl),
            _fast(f, fp, "lankle", 2.5 * hl),
            _angle_within(f.get("neck"), f.get("root"),
                          f.get("rshoulder"), f.get("relbow"), 25, 180),
            _angle_within(f.get("neck"), f.get("root"),
                          f.get("lshoulder"), f.get("lelbow"), 25, 180),
            _angle_within(f.get("neck"), f.get("root"),
                          f.get("rhip"), f.get("rknee"), 50, 180),
            _angle_within(f.get("neck"), f.get("root"),
                          f.get("lhip"), f.get("lknee"), 50, 180),
            _plane(f, "rankle", "neck", "lankle", "root", 0.5 * hl),
            _angle_within(f.get("neck"), f.get("root"),
                          f.get("zero"), f.get("y_unit"), 70, 110),
            _nplane(f, "zero", "minus_y_unit", "y_min", "rwrist",
                    -1.2 * hl),
            _nplane(f, "zero", "minus_y_unit", "y_min", "lwrist",
                    -1.2 * hl),
            _fast(f, fp, "root", 2.3 * hl),
        ])
    return np.asarray(rows, np.float32).mean(axis=0)
