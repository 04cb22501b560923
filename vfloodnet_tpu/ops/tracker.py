"""First-party correlation-filter tracker (MOSSE) in JAX.

The reference tracks its fixed reference objects with OpenCV CSRT
(estimation/reference_tracking.py:105-113); this environment's cv2 5.0
ships no CSRT, so the tracking capability gets a first-party
implementation instead of a silent static-bbox fallback: a MOSSE
correlation filter (Bolme et al., CVPR 2010) — FFT cross-correlation with
an adaptive filter learned against a Gaussian response, PSR-gated updates.

TPU-native shape discipline: everything runs at a fixed 64x64 working
window (static shapes, one jitted graph shared by every tracker
instance); the host only crops/resizes the window patch. Beyond classic
translation-only MOSSE, a DSST-style scale search (Danelljan et al.,
BMVC 2014 idea, filter-reuse variant) evaluates the SAME filter on crops
at {1/step, 1, step} window scales each frame — the best-PSR scale wins
and the window/bbox sizes follow with damping — covering the scale-drift
behaviour the reference gets from CSRT
(estimation/reference_tracking.py:105-113) on long outdoor videos. An
optional rotation search does the same over small angle offsets
(``search_rot=True``; off by default — the tracked reference objects are
static scene anchors).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SIZE = 64          # working window (static)
_REG = 1e-5        # filter regulariser
_SIGMA = 2.0       # target response sigma (window units)


def _hann2d() -> np.ndarray:
    w = np.hanning(SIZE).astype(np.float32)
    return w[:, None] * w[None, :]


def _gauss_target() -> np.ndarray:
    c = SIZE // 2
    y, x = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)
    g = np.exp(-((x - c) ** 2 + (y - c) ** 2) / (2.0 * _SIGMA ** 2))
    return g


@jax.jit
def _preprocess(patch: jnp.ndarray) -> jnp.ndarray:
    """log -> zero-mean/unit-var -> cosine window (MOSSE preprocessing)."""
    p = jnp.log1p(patch.astype(jnp.float32))
    p = (p - p.mean()) / (p.std() + 1e-5)
    return p * jnp.asarray(_hann2d())


@jax.jit
def _init_filter(patches: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """patches [K, S, S] (augmented crops) -> (num, den) filter terms."""
    g = jnp.fft.fft2(jnp.asarray(_gauss_target()))

    def one(p):
        f = jnp.fft.fft2(_preprocess(p))
        return g * jnp.conj(f), f * jnp.conj(f)

    nums, dens = jax.vmap(one)(patches)
    return nums.sum(0), dens.sum(0)


@jax.jit
def _respond(num: jnp.ndarray, den: jnp.ndarray, patch: jnp.ndarray):
    """-> (dy, dx, psr, fft(patch)): peak displacement from the window
    centre and the peak-to-sidelobe ratio."""
    f = jnp.fft.fft2(_preprocess(patch))
    h = num / (den + _REG)
    resp = jnp.real(jnp.fft.ifft2(h * f))
    idx = jnp.argmax(resp)
    py, px = idx // SIZE, idx % SIZE
    peak = resp.reshape(-1)[idx]

    # sidelobe: everything outside an 11x11 window around the peak
    y, x = jnp.mgrid[0:SIZE, 0:SIZE]
    side = (jnp.abs(y - py) > 5) | (jnp.abs(x - px) > 5)
    n_side = jnp.maximum(side.sum(), 1)
    mu = jnp.sum(resp * side) / n_side
    var = jnp.sum(jnp.square(resp - mu) * side) / n_side
    psr = (peak - mu) / jnp.sqrt(var + 1e-9)

    # the target Gaussian is centred at SIZE/2, so an aligned object peaks
    # at the window centre; displacement is relative to it
    dy = (py - SIZE // 2).astype(jnp.float32)
    dx = (px - SIZE // 2).astype(jnp.float32)
    return dy, dx, psr, f


@jax.jit
def _respond_multi(num: jnp.ndarray, den: jnp.ndarray,
                   patches: jnp.ndarray):
    """patches [K, S, S] (scale/rotation candidates) -> per-candidate
    (dy [K], dx [K], psr [K]) from one vmapped correlation pass."""
    def one(p):
        dy, dx, psr, _ = _respond(num, den, p)
        return dy, dx, psr

    return jax.vmap(one)(patches)


@jax.jit
def _update_filter(num, den, f, lr: jnp.ndarray):
    g = jnp.fft.fft2(jnp.asarray(_gauss_target()))
    return ((1.0 - lr) * num + lr * g * jnp.conj(f),
            (1.0 - lr) * den + lr * f * jnp.conj(f))


def _to_gray(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2:
        return img.astype(np.float32)
    return img[..., :3].astype(np.float32).mean(axis=-1)


class MosseTracker:
    """cv2-tracker-compatible interface: ``init(img, (x, y, w, h))`` then
    ``ok, (x, y, w, h) = update(img)``."""

    def __init__(self, lr: float = 0.125, psr_min: float = 5.0,
                 pad: float = 2.0, n_warps: int = 8, seed: int = 0,
                 search_scale: bool = True, scale_step: float = 1.035,
                 scale_damp: float = 0.6, search_rot: bool = False,
                 rot_step: float = 3.0):
        self.lr = lr
        self.psr_min = psr_min
        self.pad = pad
        self.n_warps = n_warps
        self.seed = seed
        self.search_scale = search_scale
        self.scale_step = scale_step
        self.scale_damp = scale_damp
        self.search_rot = search_rot
        self.rot_step = rot_step
        self._angle = 0.0          # cumulative window rotation (degrees)
        self._num = None
        self._den = None

    # -- host-side window crop (resized to the static working size) -------
    def _crop(self, gray: np.ndarray, scale: float = 1.0,
              angle: float = 0.0) -> np.ndarray:
        import cv2
        if self._angle + angle != 0.0:
            # rotated window: warp around the centre, then axis-aligned crop
            m = cv2.getRotationMatrix2D(self._center,
                                        self._angle + angle, 1.0)
            gray = cv2.warpAffine(gray, m, gray.shape[::-1],
                                  borderMode=cv2.BORDER_REPLICATE)
        cx, cy = self._center
        ww, wh = self._win[0] * scale, self._win[1] * scale
        x1, y1 = int(round(cx - ww / 2)), int(round(cy - wh / 2))
        h, w = gray.shape
        pad_l = max(0, -x1)
        pad_t = max(0, -y1)
        pad_r = max(0, x1 + int(ww) - w)
        pad_b = max(0, y1 + int(wh) - h)
        g = np.pad(gray, ((pad_t, pad_b), (pad_l, pad_r)), mode="edge")
        patch = g[y1 + pad_t:y1 + pad_t + int(wh),
                  x1 + pad_l:x1 + pad_l + int(ww)]
        return cv2.resize(patch, (SIZE, SIZE)).astype(np.float32)

    def init(self, img: np.ndarray, bbox: Tuple[int, int, int, int]) -> None:
        import cv2
        x, y, w, h = [float(v) for v in bbox]
        self._size = (w, h)
        self._center = (x + w / 2.0, y + h / 2.0)
        self._win = (max(w * self.pad, 8.0), max(h * self.pad, 8.0))

        gray = _to_gray(img)
        base = self._crop(gray)
        rng = np.random.default_rng(self.seed)
        patches = [base]
        c = SIZE / 2.0
        for _ in range(self.n_warps - 1):
            ang = rng.uniform(-8.0, 8.0)
            scale = rng.uniform(0.97, 1.03)
            m = cv2.getRotationMatrix2D((c, c), ang, scale)
            patches.append(cv2.warpAffine(base, m, (SIZE, SIZE),
                                          borderMode=cv2.BORDER_REFLECT))
        num, den = _init_filter(jnp.asarray(np.stack(patches)))
        self._num, self._den = num, den

    def update(self, img: np.ndarray
               ) -> Tuple[bool, Tuple[int, int, int, int]]:
        assert self._num is not None, "call init() first"
        gray = _to_gray(img)

        scales = ((1.0 / self.scale_step, 1.0, self.scale_step)
                  if self.search_scale else (1.0,))
        angles = ((-self.rot_step, 0.0, self.rot_step)
                  if self.search_rot else (0.0,))
        cands = [(s, a) for a in angles for s in scales]
        patches = np.stack([self._crop(gray, s, a) for s, a in cands])
        dys, dxs, psrs = (np.asarray(v) for v in _respond_multi(
            self._num, self._den, jnp.asarray(patches)))
        best = int(np.argmax(psrs))
        s_best, a_best = cands[best]
        psr = float(psrs[best])
        ok = psr >= self.psr_min
        if ok:
            # displacement in window units of the WINNING crop scale
            sx = self._win[0] * s_best / SIZE
            sy = self._win[1] * s_best / SIZE
            # rotated-crop displacements are in the rotated frame; rotate
            # back into image coordinates
            th = np.deg2rad(self._angle + a_best)
            dx_i = float(dxs[best]) * np.cos(th) + float(dys[best]) * np.sin(th)
            dy_i = -float(dxs[best]) * np.sin(th) + float(dys[best]) * np.cos(th)
            cx = self._center[0] + dx_i * sx
            cy = self._center[1] + dy_i * sy
            h, w = gray.shape
            self._center = (float(np.clip(cx, 0, w - 1)),
                            float(np.clip(cy, 0, h - 1)))
            if s_best != 1.0:                 # damped scale adaptation
                g = s_best ** self.scale_damp
                self._win = (max(self._win[0] * g, 8.0),
                             max(self._win[1] * g, 8.0))
                self._size = (self._size[0] * g, self._size[1] * g)
            if a_best != 0.0:                 # damped rotation adaptation
                self._angle += a_best * self.scale_damp
            # re-crop at the new centre so the filter trains on-target
            f = jnp.fft.fft2(_preprocess(jnp.asarray(self._crop(gray))))
            self._num, self._den = _update_filter(
                self._num, self._den, f, jnp.float32(self.lr))
        bw, bh = self._size
        bbox = (int(round(self._center[0] - bw / 2)),
                int(round(self._center[1] - bh / 2)),
                int(round(bw)), int(round(bh)))
        return ok, bbox
