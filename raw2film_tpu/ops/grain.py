"""Device grain synthesis: seeded PRNG noise -> correlation conv -> amplitude.

Reference pipeline: Gaussian noise (PCG hash + Box-Muller, fresh seed every
render — shaders/noise.wgsl, gpu_processor.py:586-591), convolved with a
grain correlation kernel, scaled by a density-dependent amplitude LUT and
added to the density image (shaders/grain.wgsl).

TPU design differences:
* deterministic: noise comes from jax.random over an explicit key, so a
  render is reproducible (the reference GPU path is intentionally not);
* the amplitude is evaluated analytically from the stock's GrainModel
  (no LUT gather);
* the correlation conv is separable (the kernel is an isotropic Gaussian).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from raw2film_tpu.film.grain import ISO_APERTURE_UM
from raw2film_tpu.ops import conv as convops
from raw2film_tpu.ops import fastmath as fm


def correlation_sigma_px(
    scale: float, grain_size_mm: float, grain_sigma: float
) -> float:
    return grain_size_mm * scale * grain_sigma


def generate_grain_field(
    key: jax.Array,
    hw: tuple[int, int],
    scale: float,
    grain_size_mm: float = 0.006,
    grain_sigma: float = 0.4,
    bw: bool = False,
    row_offset=0,
) -> jnp.ndarray:
    """Unit-variance correlated grain field, planar (3, H, W).

    One construction on every backend: the positionally-stateless PCG-3D
    hash + popcount-binomial + separable correlation (the pallas kernels
    are the TPU fast path for the identical function, the jnp mirror
    serves elsewhere) — so grain is deterministic per (seed, position)
    regardless of platform, tiling, or row sharding. ``row_offset`` shifts
    the hash rows to GLOBAL image coordinates for space-sharded renders.
    """
    sigma_px = correlation_sigma_px(scale, grain_size_mm, grain_sigma)
    from raw2film_tpu.ops.conv import _use_pallas
    from raw2film_tpu.ops.pallas_grain import seed2

    sd = seed2((key[0] ^ key[1]).astype(jnp.uint32), row_offset)
    if _use_pallas():
        # Stateless-hash pallas kernel: noise + correlation fused in one
        # write; halos regenerated from the hash (no neighbor reads).
        from raw2film_tpu.ops.pallas_grain import grain_field_pallas

        return grain_field_pallas(sd, hw, sigma_px, bw=bw)
    from raw2film_tpu.ops.pallas_grain import grain_field_hash

    return grain_field_hash(sd, hw, sigma_px, bw=bw)


def grain_amplitude_device(
    density: jnp.ndarray,
    rms: float,
    d_lo: float,
    d_hi: float,
    scale: float,
    peak_density: float,
    width: float,
    floor: float,
    bw_grain: bool = False,
) -> jnp.ndarray:
    """jnp mirror of GrainModel.amplitude * pixel_rms_scale
    (:mod:`raw2film_tpu.film.grain`)."""
    rng = max(float(d_hi - d_lo), 1e-3)
    t = (density - d_lo) / rng
    shape = floor + (1 - floor) * fm.expe(
        -0.5 * ((t - peak_density / rng * 0.5 - 0.25) / (width * 0.35)) ** 2
    )
    pixel_um = 1000.0 / scale
    amp = (rms / 1000.0) * shape * (ISO_APERTURE_UM / pixel_um)
    if bw_grain:
        amp = jnp.broadcast_to(amp.mean(axis=0, keepdims=True), amp.shape)
    return amp


def apply_grain(
    density: jnp.ndarray,
    key: jax.Array,
    stock,
    scale: float,
    grain_size_mm: float = 0.006,
    grain_sigma: float = 0.4,
    bw_grain: bool = False,
) -> jnp.ndarray:
    """density (3,H,W) + amplitude(density) * field; clipped at 0 after
    (reference: src/raw2film/cpu_processor.py:387-397)."""
    gm = stock.grain
    if gm is None:
        return density
    d_min, *_ = stock.curve.params()
    lo = float(np.min(d_min))
    hi = float(np.max(stock.curve.d_max))
    if hi < lo:
        lo, hi = hi, lo
    field = generate_grain_field(
        key, density.shape[-2:], scale, grain_size_mm, grain_sigma, bw=bw_grain
    )
    amp = grain_amplitude_device(
        density, gm.rms, lo, hi, scale, gm.peak_density, gm.width, gm.floor,
        bw_grain=bw_grain,
    )
    return jnp.maximum(density + amp * field, 0.0)
