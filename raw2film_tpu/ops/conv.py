"""Convolution primitives for planar (3, H, W) images on TPU.

Replaces the reference's OpenCV `cv.filter2D` dense convs
(reference: src/raw2film/effects.py:146-156) and its WGSL `convolution.wgsl`
GPU pass with XLA `conv_general_dilated` in depthwise (grouped) form, plus a
host-side SVD factorization that turns any small 2D kernel into a sum of
separable row/column passes — O(k) per pixel instead of O(k^2), and the form
XLA pipelines best on TPU.

Boundary convention: 'reflect' (REFLECT_101), matching cv2.filter2D's default
border and scipy's 'mirror'.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

PAD_MODE = "reflect"


def _pad_hw(img: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    if ph == 0 and pw == 0:
        return img
    cfg = [(0, 0)] * (img.ndim - 2) + [(ph, ph), (pw, pw)]
    return jnp.pad(img, cfg, mode=PAD_MODE)


def depthwise_conv2d(img: jnp.ndarray, kernels: jnp.ndarray) -> jnp.ndarray:
    """Dense per-channel 2D convolution.

    img: (C, H, W); kernels: (C, kh, kw) or (kh, kw) shared across channels.
    Correlation orientation (matches cv2.filter2D / the reference shaders).
    """
    if kernels.ndim == 2:
        kernels = jnp.broadcast_to(kernels[None], (img.shape[0], *kernels.shape))
    c, kh, kw = kernels.shape
    x = _pad_hw(img, kh // 2, kw // 2)[None]  # (1, C, H+, W+)
    w = kernels[:, None]  # (C, 1, kh, kw)
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
    )
    return out[0]


def separable_conv(img: jnp.ndarray, kv: jnp.ndarray, kh: jnp.ndarray) -> jnp.ndarray:
    """Separable conv: 1D kernel ``kv`` down columns then ``kh`` along rows.

    img: (C, H, W); kv: (C, k) or (k,); kh likewise.
    """
    c = img.shape[0]
    if kv.ndim == 1:
        kv = jnp.broadcast_to(kv[None], (c, kv.shape[0]))
    if kh.ndim == 1:
        kh = jnp.broadcast_to(kh[None], (c, kh.shape[0]))
    x = _pad_hw(img, kv.shape[1] // 2, 0)[None]
    out = lax.conv_general_dilated(
        x,
        kv[:, None, :, None],
        (1, 1),
        "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
    )
    x = _pad_hw(out[0], 0, kh.shape[1] // 2)[None]
    out = lax.conv_general_dilated(
        x,
        kh[:, None, None, :],
        (1, 1),
        "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
    )
    return out[0]


def svd_separable(kernel: np.ndarray, tol: float = 1e-4, max_rank: int = 6):
    """Host: factor a 2D kernel into separable rank-1 terms by SVD.

    Returns (U, V): U (r, kh) column kernels, V (r, kw) row kernels with
    kernel ~= sum_r outer(U[r], V[r]). Rank chosen so the spectral tail is
    below ``tol`` of the leading singular value.
    """
    u, s, vt = np.linalg.svd(np.asarray(kernel, np.float64))
    keep = max(1, int(np.sum(s > tol * s[0])))
    keep = min(keep, max_rank)
    scale = np.sqrt(s[:keep])
    return (
        (u[:, :keep] * scale).T.astype(np.float32),
        (vt[:keep] * scale[:, None]).astype(np.float32),
    )


def conv2d_svd(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Apply a host-factored kernel: sum of separable passes.

    u: (r, kh) or (C, r, kh) per-channel; v likewise (r, kw) / (C, r, kw).
    """
    per_channel = u.ndim == 3
    r = u.shape[-2]
    out = None
    for i in range(r):
        kv = u[:, i, :] if per_channel else u[i]
        kh = v[:, i, :] if per_channel else v[i]
        term = separable_conv(img, kv, kh)
        out = term if out is None else out + term
    return out


def gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """Host: scipy-compatible 1D Gaussian (radius = int(truncate*sigma+0.5))."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, sigma: float, truncate: float = 4.0) -> jnp.ndarray:
    """Separable Gaussian blur with host-built kernel (static sigma)."""
    k = jnp.asarray(gaussian_kernel1d(sigma, truncate))
    return separable_conv(img, k, k)


def box_downsample(img: jnp.ndarray, factor: int) -> jnp.ndarray:
    """INTER_AREA-style integer-factor downsample: mean over factor x factor
    blocks (cv2 INTER_AREA equals block mean for integer factors,
    reference usage: src/raw2film/utils.py:232, effects.py:370)."""
    c, h, w = img.shape
    h2, w2 = h // factor, w // factor
    x = img[:, : h2 * factor, : w2 * factor]
    x = x.reshape(c, h2, factor, w2, factor)
    return x.mean(axis=(2, 4))


def bilinear_upsample(img: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize up (align-corners=False, half-pixel centers)."""
    return jax.image.resize(img, (img.shape[0], *out_hw), method="bilinear")


def zoom_upsample(img: jnp.ndarray, factor: int, out_hw: tuple[int, int]) -> jnp.ndarray:
    """scipy.ndimage.zoom(order=1)-compatible integer upsample then edge-pad /
    crop to ``out_hw`` (reference: src/raw2film/effects.py:381-385)."""
    c, h, w = img.shape
    # ndimage.zoom with order=1 maps output grid to input via
    # in = out * (in_size-1)/(out_size-1) (align-corners style).
    oh, ow = h * factor, w * factor
    up = jax.image.resize(img, (c, oh, ow), method="linear")
    # jax linear resize uses half-pixel centers; difference from ndimage.zoom
    # is sub-pixel at the borders of a low-res mask that then gets cropped —
    # acceptable for the burn stage it serves.
    ph = max(out_hw[0] - oh, 0)
    pw = max(out_hw[1] - ow, 0)
    if ph or pw:
        up = jnp.pad(up, [(0, 0), (0, ph), (0, pw)], mode="edge")
    return up[:, : out_hw[0], : out_hw[1]]
