"""Film MTF sharpness: frequency-domain transfer function -> spatial conv.

Mirrors the reference's construction (radial MTF response on the FFT
frequency grid, inverse FFT, fftshift-center, normalize — reference:
src/raw2film/effects.py:114-197) including the optional unsharp-mask term
baked into the kernel, then applies it on device as SVD-separable passes
(the kernel is radially symmetric, so a handful of separable ranks capture
it to ~1e-4).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from scipy import ndimage

from raw2film_tpu.ops import conv as convops

KERNEL_SIZE_MM = 0.1  # spatial support of the MTF kernel (reference: effects.py:161)


def mtf_kernel_layer(
    logf: np.ndarray, vals: np.ndarray, scale: float, signed: bool = False
) -> np.ndarray:
    """Host: one channel's spatial kernel from tabulated (log1p f, MTF).

    ``signed=False`` reproduces the reference construction exactly,
    including its np.abs() rectification of the inverse FFT (reference:
    src/raw2film/effects.py:139-141) — which destroys the negative lobes
    the adjacency-effect bump needs and softens the kernel's measured
    MTF-50 to 0.45-0.85 of the tabulated figure (pinned in
    tests/test_film_science.py::TestDatasheetAnchors). ``signed=True`` is
    the r2f fidelity mode (``mtf_fidelity`` param): keep the real part's
    sign so the built kernel's response tracks the tabulated curve."""
    pixel_size_mm = 1.0 / scale
    n = round(KERNEL_SIZE_MM / pixel_size_mm)
    if n % 2 == 0:
        n += 1
    n = max(n, 3)
    fx = np.fft.fftfreq(n, d=pixel_size_mm)
    f = np.sqrt(fx[:, None] ** 2 + fx[None, :] ** 2)
    h = np.interp(np.log1p(f), logf, vals, left=1.0, right=0.0)
    ks = np.fft.ifft2(h).real
    k = np.fft.fftshift(ks if signed else np.abs(ks))
    return (k / k.sum()).astype(np.float32)


@lru_cache(maxsize=50)
def mtf_kernel(
    mtf_key,  # hashable: tuple of per-channel (tuple(logf), tuple(vals))
    scale: float,
    sharpening_strength: float = 0.0,
    sharpening_sigma: float = 1.0,
    signed: bool = False,
) -> np.ndarray:
    """Host: stacked (3, k, k) kernel, with optional unsharp boost
    k += strength * (k - gauss(k, sigma*scale/50)) (reference:
    src/raw2film/effects.py:179-184)."""
    layers = [
        mtf_kernel_layer(np.asarray(lf), np.asarray(v), scale, signed=signed)
        for lf, v in mtf_key
    ]
    if len(layers) == 1:
        layers = layers * 3
    k = np.stack(layers).astype(np.float32)
    if sharpening_strength:
        sigma = sharpening_sigma * scale / 50.0
        blurred = np.stack([ndimage.gaussian_filter(ki, sigma=sigma) for ki in k])
        k = k + np.float32(sharpening_strength) * (k - blurred)
    return k


def _hashable_mtf(mtf) -> tuple:
    return tuple((tuple(map(float, lf)), tuple(map(float, v))) for lf, v in mtf)


def film_sharpness(
    img: jnp.ndarray,
    mtf,
    scale: float,
    sharpening_strength: float = 0.0,
    sharpening_sigma: float = 1.0,
    signed: bool = False,
) -> jnp.ndarray:
    """Device: apply the per-channel MTF kernel to a density-domain image."""
    return film_sharpness_from_key(
        img, _hashable_mtf(mtf), scale, sharpening_strength, sharpening_sigma,
        signed=signed,
    )


def _svd_stack(k: np.ndarray, tol: float, max_rank: int):
    """Per-channel SVD factorization padded to a common rank."""
    us, vs = [], []
    rank = 0
    for c in range(3):
        u, v = convops.svd_separable(k[c], tol=tol, max_rank=max_rank)
        us.append(u)
        vs.append(v)
        rank = max(rank, u.shape[0])
    u3 = np.zeros((3, rank, k.shape[-2]), np.float32)
    v3 = np.zeros((3, rank, k.shape[-1]), np.float32)
    for c in range(3):
        u3[c, : us[c].shape[0]] = us[c]
        v3[c, : vs[c].shape[0]] = vs[c]
    return u3, v3


def film_sharpness_from_key(
    img: jnp.ndarray,
    mtf_key: tuple,
    scale: float,
    sharpening_strength: float = 0.0,
    sharpening_sigma: float = 1.0,
    signed: bool = False,
    conservative: bool = False,
    fusion: bool = True,
) -> jnp.ndarray:
    """Same, taking the pre-hashed MTF tabulation (jit-static friendly).

    ``conservative``/``fusion`` mirror the VMEM-ladder rungs the fused
    MTF+grain kernel honors (render.py): rung 1 re-tiles to the long-proven
    (32, 512), rung 2 skips the Pallas kernel for the XLA SVD conv — so a
    Mosaic VMEM failure in the standalone (grain-off) kernel is recoverable
    instead of failing identically three times."""
    k = mtf_kernel(
        mtf_key, float(scale), float(sharpening_strength),
        float(sharpening_sigma), signed=signed,
    )
    if k.shape[-1] <= 15:
        return convops.depthwise_conv2d(img, k)
    u3, v3 = _svd_stack(k, tol=2e-3, max_rank=4)
    if convops._use_pallas() and fusion:
        # Same measured tile ladder as the MTF+grain mega kernel (the
        # grain-less program needs strictly less VMEM): standalone MTF at
        # (96, 256) runs 7.7-8.2 ms vs 8.8-10.6 for the generic auto tile
        # at 45MP on v5e — this is what made grain-off configs slower than
        # the fused MTF+grain pair (round-4 stage breakdowns' negative
        # grain marginal).
        from raw2film_tpu.ops import pallas_conv2

        tile, chunk = _grain_mega_tile(
            img.shape[-2], img.shape[-1], u3.shape[1],
            u3.shape[2] // 2, v3.shape[2] // 2,
            conservative=conservative,
        )
        out = pallas_conv2.fused_sep_rank_mxu(
            img, u3, v3, precision="dc", tile_h=tile, chunk=chunk
        )
        if out is not None:
            return out
    return convops.conv2d_svd(img, u3, v3)


def _grain_vmem_ok(th, w, chunk, nr, rh, rw, budget=17_000_000):
    """Scoped-VMEM estimate for a (th, chunk) MTF+grain mega-kernel config
    (pallas_conv2.fused_sep_rank_mxu with the grain epilogue): grid-mapped
    arrays double-buffered, constant bands + scratch single, plus the grain
    hash/noise temporaries. Calibrated against v5e measurements at 45MP
    (W=8208, per-channel rank 4, rh=rw=13): (96, 256) estimates 16.6M,
    compiles, and is the fastest variant (5.7 vs 14.5 ms for the shipped
    (32, 512)); the default budget 17M sits just above it. NOT in the model:
    whatever pushed the historical (48, 512) configuration to a 19.06M
    Mosaic OOM (estimate here 13.3M) — so (48, 512) stays excluded from the
    candidate ladder and wide chunks are only used at tile 32."""
    cur_out = 2 * th * w * 4 * 2
    halos = 2 * max(rh, 1) * w * 4 * 2
    bands = nr * (chunk + 2 * rw) * chunk * 4
    colband = nr * th * (th + 2 * rh) * 4
    win = (th + 2 * rh) * (chunk + 2 * rw) * 4
    tmp = nr * th * (chunk + 2 * rw) * 4
    grain_tmp = 4 * th * chunk * 4
    return cur_out + halos + bands + colband + win + tmp + grain_tmp <= budget


def _grain_mega_tile(h, w, nr, rh, rw, conservative=False):
    """(tile_h, chunk) for the MTF+grain mega-kernel.

    Measured ladder on a v5e at 45MP (benchmarks/mtf_sweep.py, colmerge on):
    (96,256) 5.68 ms · (72,256) 7.15 ms · (48,512) excluded (historical
    19.06M OOM) · (48,256) 12.6 ms · (32,512) 14.5 ms. Tall tiles win on MXU
    row utilization exactly as in the halation mega-kernel; the VMEM gate
    keeps unmeasured (tile, W) combinations from compiling at the cliff.
    The ``conservative`` rung pins the long-proven (32, 512) so a
    downgrade-ladder recompile is a genuinely smaller program."""
    if conservative:
        return 32, 512
    for t, c in ((96, 256), (72, 256), (64, 256), (56, 256), (48, 256), (40, 512)):
        if h % t == 0 and h > 2 * t + 1 and _grain_vmem_ok(t, w, c, nr, rh, rw):
            return t, c
    return 32, 512


def film_sharpness_grain_from_key(
    img: jnp.ndarray,
    mtf_key: tuple,
    scale: float,
    sharpening_strength: float,
    sharpening_sigma: float,
    grain_seed,
    grain_sigma_px: float,
    grain_prm,
    interpret: bool = False,
    conservative: bool = False,
    signed: bool = False,
) -> jnp.ndarray | None:
    """MTF sharpness with the film-grain apply fused as an in-kernel epilogue
    (the density never returns to HBM between the two stages). Returns None
    when the Pallas path can't serve the shape — the caller then runs the
    stages separately. On the Pallas platforms where it dispatches, this
    equals film_sharpness_from_key -> grain_apply_pallas bit-for-bit: the
    grain field is positionally stateless, and both paths factor small
    (k<=15) kernels through the same tol=1e-4/rank-6 SVD that
    depthwise_conv2d uses on TPU (zero-padded common-rank terms add exact
    zeros).
    """
    from raw2film_tpu.ops import pallas_conv2

    k = mtf_kernel(
        mtf_key, float(scale), float(sharpening_strength),
        float(sharpening_sigma), signed=signed,
    )
    tol, max_rank = (1e-4, 6) if k.shape[-1] <= 15 else (2e-3, 4)
    u3, v3 = _svd_stack(k, tol=tol, max_rank=max_rank)
    h, w = img.shape[-2:]
    tile, chunk = _grain_mega_tile(
        h, w, u3.shape[1], u3.shape[2] // 2, v3.shape[2] // 2,
        conservative=conservative,
    )
    return pallas_conv2.fused_sep_rank_mxu(
        img, u3, v3, precision="dc", tile_h=tile, chunk=chunk,
        grain=(grain_seed, grain_prm, float(grain_sigma_px)),
        interpret=interpret,
    )
