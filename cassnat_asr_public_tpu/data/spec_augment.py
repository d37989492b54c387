"""SpecAugment on host (numpy), applied by data-loader workers.

Matches the reference semantics (reference: src/data/spec_augment.py):
  * time warp (config-gated, off by default in the recipes): warp a random
    center column to a random offset via piecewise-linear resampling
    (the reference used PIL bicubic resize; we use linear interpolation —
    both are approximations of the SpecAugment paper's sparse warp)
  * n_freq_mask random frequency bands of width <= max_freq_width
  * n_time_mask random time bands of width <= max_time_width (fractional
    values mean a fraction of the utterance length, spec_augment.py:96-100)

A jittable on-device variant lives in ops/frontend.py (spec_augment_jit)
for the fused-frontend path.
"""

import numpy as np


def time_warp(x: np.ndarray, max_time_warp: int = 5,
              rng: np.random.Generator = None) -> np.ndarray:
    rng = rng or np.random.default_rng()
    t = x.shape[0]
    if t - 2 * max_time_warp <= max_time_warp or max_time_warp < 1:
        return x
    center = int(rng.integers(max_time_warp, t - max_time_warp))
    warped = int(center + rng.integers(-max_time_warp, max_time_warp + 1))
    warped = int(np.clip(warped, 1, t - 1))
    src_left = np.linspace(0, center, warped, endpoint=False)
    src_right = np.linspace(center, t - 1, t - warped)
    src = np.concatenate([src_left, src_right])
    lo = np.floor(src).astype(int)
    hi = np.minimum(lo + 1, t - 1)
    frac = (src - lo)[:, None]
    return (1 - frac) * x[lo] + frac * x[hi]


def freq_mask(x: np.ndarray, max_width: int = 27, n_mask: int = 2,
              replace_with_zero: bool = False,
              rng: np.random.Generator = None) -> np.ndarray:
    rng = rng or np.random.default_rng()
    fill = 0.0 if replace_with_zero else float(x.mean())
    dim = x.shape[1]
    for _ in range(n_mask):
        w = int(rng.integers(0, max_width + 1))
        if w == 0 or w >= dim:
            continue
        f0 = int(rng.integers(0, dim - w))
        x[:, f0:f0 + w] = fill
    return x


def time_mask(x: np.ndarray, max_width=0.05, n_mask: int = 10,
              replace_with_zero: bool = False,
              rng: np.random.Generator = None) -> np.ndarray:
    rng = rng or np.random.default_rng()
    fill = 0.0 if replace_with_zero else float(x.mean())
    t = x.shape[0]
    width = int(max_width * t) if max_width < 1 else int(max_width)
    width = max(1, min(width, t))
    for _ in range(n_mask):
        w = int(rng.integers(0, width + 1))
        if w == 0 or w >= t:
            continue
        t0 = int(rng.integers(0, t - w))
        x[t0:t0 + w] = fill
    return x


def spec_aug(feat: np.ndarray, conf, rng: np.random.Generator = None
             ) -> np.ndarray:
    """Combined augmentation (reference: spec_augment.py:118-153)."""
    rng = rng or np.random.default_rng()
    x = np.array(feat, np.float32, copy=True)
    if getattr(conf, "use_time_warp", False):
        x = time_warp(x, getattr(conf, "max_time_warp", 5), rng)
    x = freq_mask(x, getattr(conf, "max_freq_width", 27),
                  getattr(conf, "n_freq_mask", 2),
                  getattr(conf, "replace_with_zero", False), rng)
    x = time_mask(x, getattr(conf, "max_time_width", 0.05),
                  getattr(conf, "n_time_mask", 10),
                  getattr(conf, "replace_with_zero", False), rng)
    return x
