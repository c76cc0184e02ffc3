"""Robust-VOS-Benchmark perturbations as pure frame transforms.

Reference: ``Robust-VOS-Benchmark/CFBI&AOC(ours)/datasets_robustness.py``
(:459-506 for the defined ops; the ``image_type`` dispatch at :508-539
is broken in the release — §2.9 — so the mapping below follows the
comments' intent):

  0 clean | 1/2/3 Gaussian noise σ∈{5,10,30} | 4/5/6 box blur k∈{3,5,9}
  | 7/8/9 salt-&-pepper {1000,1000,5000} points.

Perturbations are input-side only (model/engine untouched), so they
compose with any dataset as a frame hook.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False


def gaussian_noise(img: np.ndarray, std: float,
                   rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """cv2.randn + cv2.add semantics: float noise, clipped at [0,255]
    (datasets_robustness.py:459-473)."""
    rng = rng or np.random.default_rng()
    noise = rng.normal(0.0, std, img.shape).astype(np.float32)
    out = img.astype(np.float32) + noise
    return np.clip(out, 0, 255).astype(np.float32)


def box_blur(img: np.ndarray, k: int) -> np.ndarray:
    """cv2.blur (normalized box filter), k×k (ref :475-485)."""
    if _HAS_CV2:
        return cv2.blur(img.astype(np.float32), (k, k))
    # separable box filter fallback
    x = img.astype(np.float32)
    pad = k // 2
    xp = np.pad(x, ((pad, k - 1 - pad), (pad, k - 1 - pad), (0, 0)), "edge")
    c = np.cumsum(np.cumsum(xp, axis=0), axis=1)
    c = np.pad(c, ((1, 0), (1, 0), (0, 0)))
    h, w = x.shape[:2]
    out = (c[k:k + h, k:k + w] - c[:h, k:k + w]
           - c[k:k + h, :w] + c[:h, :w]) / (k * k)
    return out


def salt_and_pepper(img: np.ndarray, n_points: int,
                    rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Alternating white/black pixels at n random points (ref :487-506)."""
    rng = rng or np.random.default_rng()
    out = img.astype(np.float32).copy()
    h, w = out.shape[:2]
    rows = rng.integers(0, h, n_points)
    cols = rng.integers(0, w, n_points)
    odd = np.arange(n_points) % 2 == 1
    out[rows[odd], cols[odd]] = 255.0
    out[rows[~odd], cols[~odd]] = 0.0
    return out


def get_perturbation(image_type: int,
                     rng: Optional[np.random.Generator] = None
                     ) -> Callable[[np.ndarray], np.ndarray]:
    """image_type 0-9 → frame transform (intended dispatch, §2.9)."""
    table = {
        0: lambda x: x.astype(np.float32),
        1: lambda x: gaussian_noise(x, 5, rng),
        2: lambda x: gaussian_noise(x, 10, rng),
        3: lambda x: gaussian_noise(x, 30, rng),
        4: lambda x: box_blur(x, 3),
        5: lambda x: box_blur(x, 5),
        6: lambda x: box_blur(x, 9),
        7: lambda x: salt_and_pepper(x, 1000, rng),
        8: lambda x: salt_and_pepper(x, 1000, rng),
        9: lambda x: salt_and_pepper(x, 5000, rng),
    }
    if image_type not in table:
        raise ValueError(f"image_type must be 0-9, got {image_type}")
    return table[image_type]
