"""Otsu binarization — the rebuild of the native thresholding stage.

The reference's wrapper never sees pixels after setImage; thresholding
happens inside the DLL (contract: 8-bit grey / 24-32bpp color / 1-bpp
binary accepted, TessAPI.java:368-385). Here: numpy-vectorized Otsu over
uint8 greyscale; color collapses via luma first.
"""

from __future__ import annotations

import numpy as np


def to_grey(img: np.ndarray) -> np.ndarray:
    """(H,W) or (H,W,3) uint8 -> (H,W) uint8 grey (integer luma)."""
    if img.ndim == 2:
        return img
    if img.ndim == 3 and img.shape[2] == 3:
        r = img[..., 0].astype(np.uint32)
        g = img[..., 1].astype(np.uint32)
        b = img[..., 2].astype(np.uint32)
        return ((77 * r + 150 * g + 29 * b) >> 8).astype(np.uint8)
    raise ValueError(f"unsupported image shape {img.shape}")


def otsu_threshold(grey: np.ndarray) -> int:
    """Classic Otsu: maximize between-class variance over the histogram."""
    hist = np.bincount(grey.ravel(), minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 127
    omega = np.cumsum(hist) / total                 # class-0 probability
    mu = np.cumsum(hist * np.arange(256)) / total   # cumulative mean
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    denom[denom == 0] = np.nan
    sigma_b = (mu_t * omega - mu) ** 2 / denom
    if np.all(np.isnan(sigma_b)):
        # constant image: no foreground/background split exists; pick a
        # threshold below the single value so nothing counts as ink
        return max(int(mu_t) - 1, 0)
    return int(np.nanargmax(sigma_b))


def otsu_binarize(img: np.ndarray) -> np.ndarray:
    """uint8 image -> {0,1} ink map (1 = ink/dark)."""
    grey = to_grey(img)
    t = otsu_threshold(grey)
    return (grey <= t).astype(np.uint8)
