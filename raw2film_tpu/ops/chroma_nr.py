"""Chroma noise reduction: blur chromaticity, keep luminance.

Reference: XYZ -> xyY, separable Gaussian on x,y only (size = 2*nr+1,
sigma = 0.3*((size-1)/2 - 1) + 0.8 — the OpenCV auto-sigma rule), back to
XYZ (reference: src/raw2film/effects.py:421-561, numba kernels).
"""

from __future__ import annotations

import jax.numpy as jnp

from raw2film_tpu.ops import conv as convops

EPS = 1e-8


def xyz_to_xyy(img: jnp.ndarray) -> jnp.ndarray:
    x, y, z = img[0], img[1], img[2]
    s = x + y + z
    safe = s > EPS
    inv = jnp.where(safe, 1.0 / jnp.maximum(s, EPS), 0.0)
    return jnp.stack([x * inv, y * inv, y])


def xyy_to_xyz(img: jnp.ndarray) -> jnp.ndarray:
    cx, cy, yy = img[0], img[1], img[2]
    safe = cy > EPS
    inv = jnp.where(safe, yy / jnp.maximum(cy, EPS), 0.0)
    x = cx * inv
    z = (1.0 - cx - cy) * inv
    return jnp.stack(
        [jnp.where(safe, x, 0.0), jnp.where(safe, yy, 0.0), jnp.where(safe, z, 0.0)]
    )


def _cv_gaussian_kernel1d(size: int, sigma: float):
    import numpy as np

    k = size // 2
    x = np.arange(size, dtype=np.float64) - k
    g = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (g / g.sum()).astype(np.float32)


def chroma_nr(img: jnp.ndarray, size: int) -> jnp.ndarray:
    """Apply chroma NR of strength ``size`` (0 = no-op) to XYZ (3, H, W)."""
    if size <= 0:
        return img
    ksize = int(size) * 2 + 1
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1.0) + 0.8
    k = _cv_gaussian_kernel1d(ksize, sigma)
    xyy = xyz_to_xyy(img)
    chroma = convops.separable_conv(xyy[:2], k, k)
    xyy = jnp.concatenate([chroma, xyy[2:]], axis=0)
    return xyy_to_xyz(xyy)
