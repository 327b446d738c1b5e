"""NumPy/SciPy oracle implementations of every spatial effect.

These mirror the *reference semantics* (stage math of
src/raw2film/cpu_processor.py:269-414 and effects.py) in plain NumPy and act
as ground truth for the device ops. All images planar (3, H, W) float32.
"""

from __future__ import annotations

import math

import numpy as np
from scipy import ndimage
from scipy.signal import convolve2d

from raw2film_tpu.ops.halation import exponential_blur_kernel
from raw2film_tpu.ops.mtf import mtf_kernel, _hashable_mtf


def conv2d_reflect(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Per-channel 2D correlation with REFLECT_101 border (cv2.filter2D)."""
    out = np.empty_like(img)
    k = kernel[::-1, ::-1]  # correlate via convolve
    for c in range(img.shape[0]):
        kc = k if kernel.ndim == 2 else k[..., c]
        out[c] = convolve2d(img[c], kc, mode="same", boundary="symm")
    return out


def conv2d_reflect101(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Per-channel correlation with reflect-101 padding (matches device)."""
    ph, pw = kernel.shape[-2] // 2, kernel.shape[-1] // 2
    out = np.empty_like(img)
    for c in range(img.shape[0]):
        kc = kernel if kernel.ndim == 2 else kernel[c]
        padded = np.pad(img[c], ((ph, ph), (pw, pw)), mode="reflect")
        out[c] = convolve2d(padded, kc[::-1, ::-1], mode="valid")
    return out


def halation_oracle(
    img: np.ndarray,
    scale: float,
    halation_size: float = 1.0,
    halation_red_factor: float = 1.0,
    halation_green_factor: float = 0.4,
    halation_blue_factor: float = 0.0,
    halation_intensity: float = 1.0,
    bw: bool = False,
) -> np.ndarray:
    if bw:
        halation_red_factor = halation_green_factor
        halation_blue_factor = halation_green_factor
    f = halation_intensity * np.array(
        [halation_red_factor, halation_green_factor, halation_blue_factor],
        np.float32,
    ).reshape(3, 1, 1)
    k = exponential_blur_kernel(scale / 4.0 * halation_size)
    blur = conv2d_reflect101(img, k.astype(np.float32))
    return (img + f * blur) / (1.0 + f)


def film_sharpness_oracle(
    img: np.ndarray, mtf, scale: float, strength: float = 0.0, sigma: float = 1.0
) -> np.ndarray:
    k = mtf_kernel(_hashable_mtf(mtf), float(scale), float(strength), float(sigma))
    return conv2d_reflect101(img, k)


def down_up_blur_oracle(mask: np.ndarray, burn_scale: float = 50.0) -> np.ndarray:
    """(1, H, W); box downsample -> gaussian(3, trunc 2) -> linear upsample."""
    h, w = mask.shape[-2:]
    factor = max(1, math.ceil(min(h, w) / burn_scale))
    h2, w2 = h // factor, w // factor
    x = mask[0, : h2 * factor, : w2 * factor].reshape(h2, factor, w2, factor)
    small = x.mean(axis=(1, 3))
    blurred = ndimage.gaussian_filter(small, sigma=3, truncate=2, mode="mirror")
    import jax.numpy as jnp  # use the same resize as device for the up path

    import jax.image

    up = np.asarray(
        jax.image.resize(jnp.asarray(blurred), (h2 * factor, w2 * factor), "linear")
    )
    up = np.pad(
        up,
        [(0, max(h - up.shape[0], 0)), (0, max(w - up.shape[1], 0))],
        mode="edge",
    )[:h, :w]
    return up[None]


def burn_oracle(
    density: np.ndarray, d_ref_green: float, hb: float, burn_scale: float = 50.0
) -> np.ndarray:
    mask = np.maximum(density[1:2] - d_ref_green, 0.0)
    blur = down_up_blur_oracle(mask, burn_scale)
    return np.maximum(density - hb * blur, 0.0)


def chroma_nr_oracle(img: np.ndarray, size: int) -> np.ndarray:
    if size <= 0:
        return img
    ksize = int(size) * 2 + 1
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1.0) + 0.8
    k = ksize // 2
    x = np.arange(ksize) - k
    g = np.exp(-(x * x) / (2 * sigma * sigma))
    g /= g.sum()

    x_, y_, z_ = img[0], img[1], img[2]
    s = x_ + y_ + z_
    safe = s > 1e-8
    inv = np.where(safe, 1.0 / np.maximum(s, 1e-8), 0.0)
    xyy = np.stack([x_ * inv, y_ * inv, y_])

    def sep_blur(plane):
        padded = np.pad(plane, ((k, k), (0, 0)), mode="reflect")
        tmp = convolve2d(padded, g[::-1, None], mode="valid")
        padded = np.pad(tmp, ((0, 0), (k, k)), mode="reflect")
        return convolve2d(padded, g[None, ::-1], mode="valid")

    xyy[0] = sep_blur(xyy[0])
    xyy[1] = sep_blur(xyy[1])

    cy = xyy[1]
    safe2 = cy > 1e-8
    inv2 = np.where(safe2, xyy[2] / np.maximum(cy, 1e-8), 0.0)
    out = np.stack(
        [
            np.where(safe2, xyy[0] * inv2, 0.0),
            np.where(safe2, xyy[2], 0.0),
            np.where(safe2, (1 - xyy[0] - cy) * inv2, 0.0),
        ]
    )
    return out.astype(np.float32)


# ------------------------------------------------------------------ LUTs


def apply_lut_2d_oracle(img: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """Reference shaders/lut_2d.wgsl semantics, vectorized numpy."""
    n = lut.shape[0]
    s = img.sum(axis=0)
    safe = s > 1e-12
    inv = np.where(safe, (n - 1.0) / np.maximum(s, 1e-12), 0.0)
    r = img[0] * inv
    g = img[1] * inv
    ri = np.clip(r.astype(np.int32), 0, n - 2)
    gi = np.clip(g.astype(np.int32), 0, n - 2)
    rf = r - ri
    gf = g - gi
    upper = rf + gf > 1.0
    r_val = lut[ri + 1, gi]
    g_val = lut[ri, gi + 1]
    lo = (
        r_val * rf[..., None]
        + g_val * gf[..., None]
        + lut[ri, gi] * (1 - rf - gf)[..., None]
    )
    hi = (
        r_val * (1 - gf)[..., None]
        + g_val * (1 - rf)[..., None]
        + lut[ri + 1, gi + 1] * (rf + gf - 1)[..., None]
    )
    out = np.where(upper[..., None], hi, lo) * s[..., None]
    out = np.where(safe[..., None], out, 0.0)
    return np.moveaxis(out, -1, 0).astype(np.float32)


def apply_lut_tetrahedral_oracle(
    img: np.ndarray, lut: np.ndarray, scale: float = 0.25
) -> np.ndarray:
    """Reference src/raw2film/utils.py:247-380 semantics, vectorized."""
    n = lut.shape[0]
    coords = img * (scale * (n - 1))
    i0 = np.clip(coords.astype(np.int32), 0, n - 2)
    d = coords - i0
    d = np.where(coords >= n - 1, 1.0, d)
    d = np.clip(d, 0.0, 1.0)
    r0, g0, b0 = i0
    dr, dg, db = (x[..., None] for x in d)
    c000 = lut[r0, g0, b0]
    c100 = lut[r0 + 1, g0, b0]
    c010 = lut[r0, g0 + 1, b0]
    c001 = lut[r0, g0, b0 + 1]
    c110 = lut[r0 + 1, g0 + 1, b0]
    c101 = lut[r0 + 1, g0, b0 + 1]
    c011 = lut[r0, g0 + 1, b0 + 1]
    c111 = lut[r0 + 1, g0 + 1, b0 + 1]
    t1 = c000 + dr * (c100 - c000) + dg * (c110 - c100) + db * (c111 - c110)
    t2 = c000 + dr * (c100 - c000) + db * (c101 - c100) + dg * (c111 - c101)
    t3 = c000 + db * (c001 - c000) + dr * (c101 - c001) + dg * (c111 - c101)
    t4 = c000 + db * (c001 - c000) + dg * (c011 - c001) + dr * (c111 - c011)
    t5 = c000 + dg * (c010 - c000) + db * (c011 - c010) + dr * (c111 - c011)
    t6 = c000 + dg * (c010 - c000) + dr * (c110 - c010) + db * (c111 - c110)
    rg = dr >= dg
    gb = dg >= db
    rb = dr >= db
    out = np.where(
        rg,
        np.where(gb, t1, np.where(rb, t2, t3)),
        np.where(~gb, t4, np.where(~rb, t5, t6)),
    )
    return np.moveaxis(out, -1, 0).astype(np.float32)
