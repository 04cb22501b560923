"""Homography estimation (normalized DLT) and perspective transforms.

Replaces the reference's cv2.findHomography / cv2.perspectiveTransform usage
in the stop-sign depth geometry (estimation/object_detection.py:135-140) and
video rectification (reference_tracking.py:76,169-170) with a first-class,
jittable op (works in numpy or jax.numpy).
"""

from __future__ import annotations

import numpy as np


def find_homography(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Normalized DLT: least-squares homography mapping src -> dst.

    src, dst: [N, 2] with N >= 4. Returns [3, 3] with h22 == 1.
    """
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    n = src.shape[0]
    if n < 4:
        raise ValueError("need >= 4 point correspondences")

    def normalize(pts):
        c = pts.mean(axis=0)
        d = np.sqrt(((pts - c) ** 2).sum(axis=1)).mean()
        s = np.sqrt(2.0) / max(d, 1e-12)
        t = np.array([[s, 0, -s * c[0]], [0, s, -s * c[1]], [0, 0, 1]])
        ph = np.concatenate([pts, np.ones((n, 1))], axis=1) @ t.T
        return ph[:, :2], t

    s_n, t_s = normalize(src)
    d_n, t_d = normalize(dst)

    a = np.zeros((2 * n, 9))
    for i in range(n):
        x, y = s_n[i]
        u, v = d_n[i]
        a[2 * i] = [-x, -y, -1, 0, 0, 0, u * x, u * y, u]
        a[2 * i + 1] = [0, 0, 0, -x, -y, -1, v * x, v * y, v]
    _, _, vt = np.linalg.svd(a)
    h_n = vt[-1].reshape(3, 3)
    h = np.linalg.inv(t_d) @ h_n @ t_s
    return h / h[2, 2]


def perspective_transform(pts: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Apply homography to [N, 2] points."""
    pts = np.asarray(pts, np.float64)
    ph = np.concatenate([pts, np.ones((pts.shape[0], 1))], axis=1)
    out = ph @ np.asarray(h).T
    return out[:, :2] / out[:, 2:3]


def warp_perspective_nearest(img: np.ndarray, h: np.ndarray,
                             out_hw=None) -> np.ndarray:
    """Inverse-mapped nearest-neighbour perspective warp (numpy)."""
    hh, ww = img.shape[:2] if out_hw is None else out_hw
    ys, xs = np.mgrid[0:hh, 0:ww]
    pts = np.stack([xs.ravel(), ys.ravel()], axis=1).astype(np.float64)
    src = perspective_transform(pts, np.linalg.inv(np.asarray(h)))
    sx = np.round(src[:, 0]).astype(int)
    sy = np.round(src[:, 1]).astype(int)
    ok = (sx >= 0) & (sx < img.shape[1]) & (sy >= 0) & (sy < img.shape[0])
    out = np.zeros((hh, ww) + img.shape[2:], img.dtype)
    out.reshape(hh * ww, *img.shape[2:])[ok] = img[sy[ok], sx[ok]]
    return out
