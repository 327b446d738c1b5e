"""Halation: red-dominant glow around highlights.

The reference convolves the linear-exposure image with an exponential-falloff
kernel of radius ``scale/4 * halation_size`` px (~0.25 mm) with per-channel
color factors, normalized so the image mean is preserved:
``out = (img + f_c * blur(img)) / (1 + f_c)``
(reference: src/raw2film/effects.py:200-287).

TPU design: the kernel radius grows with export scale (>100 px at 400 px/mm),
so a dense conv is bandwidth-hopeless and even FFT costs ~90 ms at 45 MP.
Instead the exact kernel is fitted (host, least-squares on radial profiles)
with a small sum of isotropic Gaussians; each Gaussian is applied as a
separable conv — wide ones on a box-downsampled pyramid level, which is
accurate because a >30 px Gaussian has no content above the Nyquist of a
4x-decimated grid. Fit residual is checked by tests (<2% of kernel mass).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from raw2film_tpu.ops import conv as convops


def exponential_blur_kernel(size: float) -> np.ndarray:
    """Host: the exact halation kernel — (1/d^2) * max((r - d)/r, 0), center
    weight 1, normalized (reference: src/raw2film/effects.py:200-217)."""
    radius = size / 2.0
    n = 2 * int(np.floor(np.ceil(size) / 2)) + 1
    center = np.ceil(n / 2.0)
    ii = np.arange(1, n + 1, dtype=np.float64)
    di = (ii - center) ** 2
    dist = di[:, None] + di[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        k = np.where(
            dist == 0.0,
            1.0,
            (1.0 / dist) * np.maximum((radius - np.sqrt(dist)) / radius, 0.0),
        )
    return k / k.sum()


INNER_RADIUS = 5  # dense correction window half-size (11x11)


@lru_cache(maxsize=32)
def fit_gaussian_mixture(size: float, n_terms: int = 5):
    """Host: factor the exact kernel as

        k = inner_correction (dense, 11x11)  +  sum_i w_i * Gaussian(sigma_i)

    The Gaussians are least-squares fitted to the full kernel; whatever they
    miss inside the 11x11 core (the 1/d^2 spike lives there) goes verbatim
    into the dense correction, so the only approximation error is the smooth
    outer tail. Returns (sigmas, weights, inner (11,11), residual_l1 over the
    outer region).
    """
    k = exponential_blur_kernel(size)
    n = k.shape[0]
    c = n // 2
    yy, xx = np.mgrid[0:n, 0:n]
    r2 = (yy - c) ** 2.0 + (xx - c) ** 2.0
    radius = max(size / 2.0, 1.0)
    sigmas = np.geomspace(max(1.2, radius / 30.0), radius / 1.7, n_terms)
    basis = np.stack(
        [np.exp(-0.5 * r2 / s**2) / (2 * np.pi * s**2) for s in sigmas], axis=-1
    )
    a = basis.reshape(-1, n_terms)
    # Fit the tail only (core handled exactly by the correction kernel).
    outer = (r2 > INNER_RADIUS**2).ravel()
    w, *_ = np.linalg.lstsq(a[outer], k.ravel()[outer], rcond=None)
    w = np.maximum(w, 0.0)
    recon = (a @ w).reshape(n, n)
    resid_outer = float(np.abs(recon - k)[r2 > INNER_RADIUS**2].sum())
    inner = np.zeros((2 * INNER_RADIUS + 1,) * 2, np.float64)
    lo_src = max(c - INNER_RADIUS, 0)
    hi_src = min(c + INNER_RADIUS + 1, n)
    lo_dst = lo_src - (c - INNER_RADIUS)
    patch = (k - recon)[lo_src:hi_src, lo_src:hi_src]
    inner[lo_dst : lo_dst + patch.shape[0], lo_dst : lo_dst + patch.shape[1]] = patch
    return (
        tuple(float(s) for s in sigmas),
        tuple(float(x) for x in w),
        inner.astype(np.float32),
        resid_outer,
    )


PYRAMID_SIGMA = 8.0  # sigmas above this run on a decimated level


def _gaussian_pyramid_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Isotropic Gaussian via separable conv; larger sigmas run on a
    box-downsampled level and bilinear-upsample back (standard fast-glow).
    A sigma > 2.5 Gaussian has negligible content above the Nyquist of a
    2x-decimated grid, so each tier is accurate to <1% of the term's mass."""
    if sigma <= PYRAMID_SIGMA:
        return convops.gaussian_blur(img, sigma, truncate=3.0)
    factor = 4 if sigma <= 48.0 else 8
    small = convops.box_downsample(img, factor)
    blurred = convops.gaussian_blur(small, sigma / factor, truncate=3.0)
    return convops.bilinear_upsample(blurred, img.shape[-2:])


@lru_cache(maxsize=32)
def _full_res_ranks(size: float):
    """Host: separable rank terms for the full-res part of the mixture tier
    (inner correction + sub-pyramid Gaussians COMBINED into one 2D kernel and
    SVD-factored — one fewer rank than factoring them independently), plus
    the pyramid (sigma, weight) terms grouped by decimation factor.

    Returns (us, vs, by_factor) with us/vs tuples of 1-D tap tuples.
    """
    sigmas, weights, inner, _ = fit_gaussian_mixture(size)
    full, by_factor = [], {}
    for s, w in zip(sigmas, weights):
        if w <= 1e-6:
            continue
        if s <= PYRAMID_SIGMA:
            full.append((s, w))
        else:
            by_factor.setdefault(4 if s <= 48.0 else 8, []).append((s, w))
    rad = INNER_RADIUS
    for s, _ in full:
        rad = max(rad, int(3.0 * s + 0.5))
    n = 2 * rad + 1
    comb = np.zeros((n, n), np.float64)
    ir = inner.shape[0] // 2
    comb[rad - ir : rad + ir + 1, rad - ir : rad + ir + 1] += inner
    for s, w in full:
        g = convops.gaussian_kernel1d(s, truncate=3.0).astype(np.float64)
        r1 = len(g) // 2
        comb[rad - r1 : rad + r1 + 1, rad - r1 : rad + r1 + 1] += w * np.outer(g, g)
    u, v = convops.svd_separable(comb, tol=3e-3, max_rank=5)
    us = tuple(tuple(float(t) for t in r_) for r_ in u)
    vs = tuple(tuple(float(t) for t in r_) for r_ in v)
    return us, vs, by_factor


def _pyramid_small_blur(img: jnp.ndarray, f: int, terms) -> jnp.ndarray:
    """Decimate by ``f`` and apply the pyramid Gaussian terms (fused ranks)."""
    from raw2film_tpu.ops import pallas_conv2, pallas_pyramid

    small = pallas_pyramid.box_downsample_pallas(img, f)
    su = [w * convops.gaussian_kernel1d(s / f, truncate=3.0) for s, w in terms]
    sv = [convops.gaussian_kernel1d(s / f, truncate=3.0) for s, _ in terms]
    return pallas_conv2.fused_sep_rank_mxu(small, su, sv)


def halation_blur(
    img: jnp.ndarray, scale: float, halation_size: float, exact: bool = False
) -> jnp.ndarray:
    """The glow term alone (callers fuse the combine into their elementwise
    chain): blur(img) with the exponential halation kernel."""
    size = scale / 4.0 * halation_size
    if exact or size <= 12.0:
        k = exponential_blur_kernel(size).astype(np.float32)
        return convops.depthwise_conv2d(img, k)
    if size <= 40.0:
        u, v = convops.svd_separable(
            exponential_blur_kernel(size).astype(np.float32), tol=1e-4, max_rank=8
        )
        return convops.conv2d_svd(img, u, v)
    if convops._use_pallas():
        from raw2film_tpu.ops import pallas_conv2, pallas_pyramid

        us, vs, by_factor = _full_res_ranks(size)
        blur = pallas_conv2.fused_sep_rank_mxu(img, list(us), list(vs))
        for f, terms in by_factor.items():
            small_blur = _pyramid_small_blur(img, f, terms)
            blur = blur + pallas_pyramid.bilinear_upsample_pallas(
                small_blur, f, img.shape[-2:]
            )
        return blur
    sigmas, weights, inner, _ = fit_gaussian_mixture(size)
    blur = convops.depthwise_conv2d(img, inner)
    for s, w in zip(sigmas, weights):
        if w <= 1e-6:
            continue
        blur = blur + w * _gaussian_pyramid_blur(img, s)
    return blur


def halation_combined_fused(
    img: jnp.ndarray,
    scale: float,
    halation_size: float,
    factors: jnp.ndarray,
    interpret: bool = False,
    develop: jnp.ndarray | None = None,
    conservative: bool = False,
) -> jnp.ndarray | None:
    """The whole halation stage — full-res ranks + /4 pyramid upsample +
    per-channel combine — in ONE streaming pallas kernel
    (ops/pallas_halation.py). ``factors``: traced (3,) color factors.
    ``develop``: optional f32[19] H&D vector (see halation_mega) to also
    develop to density in-kernel (identity-masking fast path).
    ``conservative``: proven-safe tile budget (see halation_mega).

    Returns None when the mixture tier doesn't apply or the shape can't be
    served; the caller falls back to halation_blur + elementwise combine.
    """
    size = scale / 4.0 * halation_size
    if size <= 40.0 or not convops._use_pallas():
        return None
    h, w = img.shape[-2:]
    if h % 4 or w % 4:
        return None
    us, vs, by_factor = _full_res_ranks(size)
    if list(by_factor) != [4]:
        return None  # mega kernel serves the /4-only pyramid (all real scales)
    from raw2film_tpu.ops import pallas_halation, pallas_pyramid

    small_blur = _pyramid_small_blur(img, 4, by_factor[4])
    small_rows_up = pallas_pyramid.bilinear_upsample_rows_pallas(
        small_blur, 4, oh=h, interpret=interpret
    )
    return pallas_halation.halation_mega(
        img, list(us), list(vs), small_rows_up, factors,
        interpret=interpret, develop=develop, conservative=conservative,
    )


def halation_with_factors(
    img: jnp.ndarray,
    scale: float,
    halation_size: float,
    factors: jnp.ndarray,
    exact: bool = False,
) -> jnp.ndarray:
    """Core halation apply with *traced* per-channel color factors (3, 1, 1)
    so intensity/green-factor sliders never retrigger compilation; only the
    kernel geometry (scale, halation_size) is static."""
    blur = halation_blur(img, scale, halation_size, exact=exact)
    return (img + factors * blur) / (1.0 + factors)


def halation(
    img: jnp.ndarray,
    scale: float,
    halation_size: float = 1.0,
    halation_red_factor: float = 1.0,
    # 0.4 here vs 0.3 in pipeline/params.py is reference-faithful, not a
    # drift: the reference's op-level default is 0.4 (effects.py:243) while
    # its settings schema ships 0.3 (gui.py:500) — users get 0.3, direct
    # op callers get 0.4, exactly as upstream.
    halation_green_factor: float = 0.4,
    halation_blue_factor: float = 0.0,
    halation_intensity: float = 1.0,
    bw: bool = False,
    exact: bool = False,
) -> jnp.ndarray:
    """Device: apply halation to a linear-exposure planar image (3, H, W).

    ``exact=True`` uses the dense kernel (for small scales / validation);
    default is the Gaussian-mixture pyramid path.
    """
    if bw:
        halation_red_factor = halation_green_factor
        halation_blue_factor = halation_green_factor
    factors = halation_intensity * jnp.asarray(
        [halation_red_factor, halation_green_factor, halation_blue_factor],
        img.dtype,
    ).reshape(3, 1, 1)
    return halation_with_factors(img, scale, halation_size, factors, exact=exact)
