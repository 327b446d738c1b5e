"""Pallas grain-field kernel: stateless hash noise + fused correlation.

The XLA path (ops/grain.py) draws threefry normals with jax.random and then
convolves — two full passes plus an expensive counter RNG. This kernel makes
the noise *positionally stateless* (PCG-3D hash of (x, y, seed^channel) +
Box-Muller, the same construction the reference's GPU engine uses,
reference: shaders/noise.wgsl), so every tile can regenerate its own halo
noise — no neighbor blocks, one output write total.

Statistical contract (tested): unit variance after the L2-normalized
correlation kernel, zero mean, deterministic per (seed, shape, channel).
Values differ from the jax.random CPU path — grain is texture, not signal;
per-backend determinism is what matters (and the reference GPU isn't even
deterministic run-to-run).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raw2film_tpu.ops import fastmath as fm

SUBLANE = 8


def _round_up(x, m):
    return (x + m - 1) // m * m


def _pcg3d(x, y, z):
    """PCG-3D hash (Jarzynski & Olano), uint32 in/out."""
    v0 = x * np.uint32(1664525) + np.uint32(1013904223)
    v1 = y * np.uint32(1664525) + np.uint32(1013904223)
    v2 = z * np.uint32(1664525) + np.uint32(1013904223)
    v0 = v0 + v1 * v2
    v1 = v1 + v2 * v0
    v2 = v2 + v0 * v1
    v0 = v0 ^ (v0 >> np.uint32(16))
    v1 = v1 ^ (v1 >> np.uint32(16))
    v2 = v2 ^ (v2 >> np.uint32(16))
    v0 = v0 + v1 * v2
    v1 = v1 + v2 * v0
    v2 = v2 + v0 * v1
    return v0, v1, v2


def _gauss_pair_boxmuller(u_bits, v_bits):
    """Box-Muller from two uint32 draws -> one standard normal.

    uint32->float32 casts go through int32 on TPU (top bit reads as sign), so
    draws are reduced to 24 bits first — which is also exactly a float32
    mantissa.
    """
    inv24 = np.float32(1.0 / 16777216.0)

    def to_unit(bits):
        # Mosaic has no uint32->f32 cast; >>8 clears the top byte so a
        # bitcast to int32 is value-preserving, and int32->f32 is supported.
        i32 = pltpu.bitcast(bits >> np.uint32(8), jnp.int32)
        return i32.astype(jnp.float32) * inv24

    u1 = jnp.maximum(to_unit(u_bits), np.float32(1e-7))
    u2 = to_unit(v_bits)
    # log in base-2 form (ops/fastmath.py): -2*ln(u1) = -2*ln2*log2(u1).
    r = jnp.sqrt(np.float32(-2.0 * np.log(2.0)) * jnp.log2(u1))
    return r * jnp.cos(np.float32(2.0 * np.pi) * u2)


def _popcount(v):
    """SWAR popcount, uint32 -> uint32 in [0, 32]."""
    v = v - ((v >> np.uint32(1)) & np.uint32(0x55555555))
    v = (v & np.uint32(0x33333333)) + ((v >> np.uint32(2)) & np.uint32(0x33333333))
    v = (v + (v >> np.uint32(4))) & np.uint32(0x0F0F0F0F)
    return (v * np.uint32(0x01010101)) >> np.uint32(24)


def _gauss_pair(u_bits, v_bits):
    """Standard normal from two uint32 hash words via bit-sum binomial:
    popcount(u) + popcount(v) ~ Binomial(64, 1/2) -> (S - 32) / 4.

    Exactly unit variance, excess kurtosis -0.031 (within the grain field's
    |k|<0.1 contract), support +-8 sigma — and ~5 cheap integer ops per word
    where Box-Muller costs log+sqrt+cos on the VPU (grain kernel measured
    14.1 -> see BENCHMARKS). Film grain is blind to the 65-level
    quantization: the correlation kernel and the amplitude curve smooth it,
    and real grain is binary clumps anyway.
    """
    s = _popcount(u_bits) + _popcount(v_bits)
    i32 = pltpu.bitcast(s, jnp.int32)  # values 0..64: bitcast is exact
    return (i32.astype(jnp.float32) - np.float32(32.0)) * np.float32(0.25)


def seed2(seed, row_off=0) -> jnp.ndarray:
    """Normalize to the SMEM uint32 pair [seed, global_row_offset] every
    grain kernel consumes. Accepts python ints, 0-d/1-d arrays; a (2,)
    array passes through. row_off may be a traced int (space sharding)."""
    if isinstance(seed, jnp.ndarray) and seed.shape == (2,):
        return seed.astype(jnp.uint32)
    s = jnp.asarray(seed, jnp.uint32).reshape(-1)[0]
    r = jnp.asarray(row_off, jnp.int32).astype(jnp.uint32).reshape(())
    return jnp.stack([s, r])


def grain_field_hash(seed, hw: tuple, sigma_px: float, bw: bool = False):
    """jnp mirror of the pallas hash-grain field — identical VALUES on any
    backend (the positionally-stateless PCG-3D + popcount-binomial +
    separable-correlation construction). Used by the XLA fallback path so
    grain is platform- AND tiling-invariant; the pallas kernels are the
    fast path for the same function."""
    from jax.lax import bitcast_convert_type as bc

    h, w = hw
    taps = grain_corr_taps(sigma_px)
    r = len(taps) // 2
    c = 1 if bw else 3
    sd = seed2(seed)
    eh, ew = h + 2 * r, w + 2 * r
    yy_i = jax.lax.broadcasted_iota(jnp.int32, (c, eh, ew), 1)
    xx_i = jax.lax.broadcasted_iota(jnp.int32, (c, eh, ew), 2)
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, eh, ew), 0)
    z_i = ch * np.int32(-1640531527) if not bw else jnp.zeros_like(ch)
    a, b, _ = _pcg3d(
        bc(xx_i, jnp.uint32),
        bc(yy_i, jnp.uint32) + sd[1],
        bc(z_i, jnp.uint32) + sd[0],
    )
    s = _popcount(a) + _popcount(b)
    noise = (bc(s, jnp.int32).astype(jnp.float32) - np.float32(32.0)) * np.float32(
        0.25
    )
    col = None
    for q in range(len(taps)):
        term = taps[q] * noise[:, q : q + h, :]
        col = term if col is None else col + term
    field = None
    for q in range(len(taps)):
        term = taps[q] * col[:, :, q : q + w]
        field = term if field is None else field + term
    if bw:
        field = jnp.broadcast_to(field, (3, h, w))
    return field


def grain_corr_taps(sigma_px: float) -> tuple:
    """Host: L2-normalized correlation taps (separable pass applied twice
    keeps the field at unit variance). sigma_px < 0.3 -> white noise."""
    if sigma_px >= 0.3:
        from raw2film_tpu.ops.conv import gaussian_kernel1d

        k = gaussian_kernel1d(sigma_px, truncate=2.5).astype(np.float64)
        k = k / np.linalg.norm(k)
    else:
        k = np.ones(1, np.float64)
    return tuple(float(t) for t in k)


def grain_field_block(seed_ref, taps, th, cw, row0, col0, z_mul):
    """In-kernel: the correlated grain field for an output block whose top-left
    is (row0, col0). Positionally stateless: the noise sample feeding output
    (y, x) at tap (qy, qx) has hash coordinates (y + qy, x + qx), so ANY
    tiling reproduces the identical field (this is what lets the grain
    epilogue fuse into other kernels bit-exactly). seed_ref is the SMEM
    uint32 pair [seed, global_row_offset] — the offset makes a row-sharded
    image reproduce the single-device field (mod-2^32 coordinate add, so a
    negative offset wraps harmlessly)."""
    r = len(taps) // 2
    eh = th + 2 * r
    ew = cw + 2 * r
    yy_i = jax.lax.broadcasted_iota(jnp.int32, (eh, ew), 0) + row0
    xx_i = jax.lax.broadcasted_iota(jnp.int32, (eh, ew), 1) + col0
    z_i = jnp.full((eh, ew), 1, jnp.int32) * z_mul
    a, b, _ = _pcg3d(
        pltpu.bitcast(xx_i, jnp.uint32),
        pltpu.bitcast(yy_i, jnp.uint32) + seed_ref[1],
        pltpu.bitcast(z_i, jnp.uint32) + seed_ref[0],
    )
    noise = _gauss_pair(a, b)
    col = None
    for q in range(len(taps)):
        term = taps[q] * noise[q : q + th, :]
        col = term if col is None else col + term
    field = None
    for q in range(len(taps)):
        term = taps[q] * col[:, q : q + cw]
        field = term if field is None else field + term
    return field


def grain_amplitude_block(d, prm_ref):
    """In-kernel: rms_eff * shape(d) amplitude from the SMEM param vector
    [rms_eff, floor, peak_over_rng_half, inv_width, lo, inv_rng]."""
    rms_eff = prm_ref[0]
    floor = prm_ref[1]
    peak_half = prm_ref[2]
    inv_width = prm_ref[3]
    lo = prm_ref[4]
    inv_rng = prm_ref[5]
    t = (d - lo) * inv_rng
    # exp in base-2 form (ops/fastmath.py) — matches the jnp fallback
    # (ops/grain.py grain_amplitude) expression-for-expression.
    shape = floor + (np.float32(1.0) - floor) * fm.expe(
        np.float32(-0.5) * ((t - peak_half - np.float32(0.25)) * inv_width) ** 2
    )
    return rms_eff * shape


def _grain_kernel(seed_ref, o_ref, *, taps, th, w, chunk, row0_offset):
    """Write one (1, th, w) block of correlated unit-variance noise."""
    # Mosaic restrictions shape this: program_id is int32 (and int32 leaking
    # into uint32 math demotes the whole hash chain to sign-extending int32),
    # scalar bitcasts are unsupported, and uint32->f32 casts don't exist. So:
    # build coordinates in int32 2-D arrays, bitcast the ARRAYS to uint32.
    ch = pl.program_id(0)
    j = pl.program_id(1)
    r = len(taps) // 2
    eh = th + 2 * r
    for c0 in range(0, w, chunk):
        cw = min(chunk, w - c0)
        ew = cw + 2 * r
        # Global coordinates of the extended window (halo regenerated, may
        # run beyond the image - the hash doesn't care).
        yy_i = jax.lax.broadcasted_iota(jnp.int32, (eh, ew), 0) + j * np.int32(th)
        xx_i = jax.lax.broadcasted_iota(jnp.int32, (eh, ew), 1) + np.int32(
            c0 + row0_offset
        )
        # 0x9E3779B9 as a signed 32-bit literal: -1640531527.
        z_i = jnp.full((eh, ew), 1, jnp.int32) * (ch * np.int32(-1640531527))
        yy = pltpu.bitcast(yy_i, jnp.uint32) + seed_ref[1]
        xx = pltpu.bitcast(xx_i, jnp.uint32)
        zz = pltpu.bitcast(z_i, jnp.uint32) + seed_ref[0]
        a, b, _ = _pcg3d(xx, yy, zz)
        noise = _gauss_pair(a, b)
        # Separable correlation: columns then rows (taps tiny).
        col = None
        for q in range(len(taps)):
            term = taps[q] * noise[q : q + th, :]
            col = term if col is None else col + term
        out = None
        for q in range(len(taps)):
            term = taps[q] * col[:, q : q + cw]
            out = term if out is None else out + term
        o_ref[0, :, c0 : c0 + cw] = out


def grain_field_pallas(
    seed: int | jnp.ndarray,
    shape_hw: tuple[int, int],
    sigma_px: float,
    bw: bool = False,
    tile_h: int = 64,
    chunk: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """(3, H, W) correlated ~unit-variance grain field, deterministic per
    seed. sigma_px < 0.3 yields uncorrelated white noise (identity kernel,
    reference gpu_processor.py:931-932 fallback)."""
    h, w = shape_hw
    taps = grain_corr_taps(sigma_px)
    th = min(tile_h, _round_up(h, SUBLANE))
    hp = _round_up(h, th)
    c = 1 if bw else 3
    seed_arr = seed2(seed)
    out = pl.pallas_call(
        lambda s_ref, o_ref: _grain_kernel(
            s_ref, o_ref, taps=taps, th=th, w=w, chunk=chunk, row0_offset=0
        ),
        out_shape=jax.ShapeDtypeStruct((c, hp, w), jnp.float32),
        grid=(c, hp // th),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (1, th, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(seed_arr)
    out = out[:, :h, :]
    if bw:
        out = jnp.broadcast_to(out, (3, h, w))
    return out


def _grain_apply_kernel(seed_ref, prm_ref, d_ref, o_ref, *, taps, th, w, chunk):
    """out = max(density + amplitude(density) * field, 0) in one pass.

    prm: SMEM f32 [rms_eff, floor, peak_over_rng_half, inv_width, lo, inv_rng]
    with amplitude = rms_eff * (floor + (1-floor) *
    exp(-0.5 * ((t - peak_over_rng_half - 0.25) * inv_width)^2)), t = (d-lo)*inv_rng.
    """
    ch = pl.program_id(0)
    j = pl.program_id(1)
    for c0 in range(0, w, chunk):
        cw = min(chunk, w - c0)
        field = grain_field_block(
            seed_ref, taps, th, cw,
            j * np.int32(th), np.int32(c0), ch * np.int32(-1640531527),
        )
        d = d_ref[0, :, c0 : c0 + cw]
        o_ref[0, :, c0 : c0 + cw] = jnp.maximum(
            d + grain_amplitude_block(d, prm_ref) * field, np.float32(0.0)
        )


def grain_apply_pallas(
    density: jnp.ndarray,
    seed,
    sigma_px: float,
    rms_eff,
    floor,
    peak_half,
    inv_width,
    lo,
    inv_rng,
    tile_h: int = 64,
    chunk: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused color-grain apply (independent per-channel fields)."""
    c, h, w = density.shape
    taps = grain_corr_taps(sigma_px)
    th = min(tile_h, _round_up(h, SUBLANE))
    hp = _round_up(h, th)
    d = density
    if hp != h:
        d = jnp.pad(density, [(0, 0), (0, hp - h), (0, 0)], mode="edge")
    seed_arr = seed2(seed)
    prm = jnp.stack(
        [
            jnp.asarray(v, jnp.float32).reshape(())
            for v in (rms_eff, floor, peak_half, inv_width, lo, inv_rng)
        ]
    )
    out = pl.pallas_call(
        lambda s_ref, p_ref, d_ref, o_ref: _grain_apply_kernel(
            s_ref, p_ref, d_ref, o_ref, taps=taps, th=th, w=w, chunk=chunk
        ),
        out_shape=jax.ShapeDtypeStruct((c, hp, w), jnp.float32),
        grid=(c, hp // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, th, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(seed_arr, prm, d)
    return out[:, :h, :]


def _grain_apply_bw_kernel(seed_ref, prm_ref, d_ref, o_ref, *, taps, th, w, chunk):
    """BW grain (reference grain==1): ONE shared field for all channels and
    the amplitude averaged across channels. Blocks carry all 3 channels."""
    j = pl.program_id(0)
    r = len(taps) // 2
    eh = th + 2 * r
    rms_eff = prm_ref[0]
    floor = prm_ref[1]
    peak_half = prm_ref[2]
    inv_width = prm_ref[3]
    lo = prm_ref[4]
    inv_rng = prm_ref[5]
    third = np.float32(1.0 / 3.0)
    for c0 in range(0, w, chunk):
        cw = min(chunk, w - c0)
        ew = cw + 2 * r
        yy_i = jax.lax.broadcasted_iota(jnp.int32, (eh, ew), 0) + j * np.int32(th)
        xx_i = jax.lax.broadcasted_iota(jnp.int32, (eh, ew), 1) + np.int32(c0)
        z_i = jnp.zeros((eh, ew), jnp.int32)
        a, b, _ = _pcg3d(
            pltpu.bitcast(xx_i, jnp.uint32),
            pltpu.bitcast(yy_i, jnp.uint32) + seed_ref[1],
            pltpu.bitcast(z_i, jnp.uint32) + seed_ref[0],
        )
        noise = _gauss_pair(a, b)
        col = None
        for q in range(len(taps)):
            term = taps[q] * noise[q : q + th, :]
            col = term if col is None else col + term
        field = None
        for q in range(len(taps)):
            term = taps[q] * col[:, q : q + cw]
            field = term if field is None else field + term

        def shape_of(d):
            t = (d - lo) * inv_rng
            return floor + (np.float32(1.0) - floor) * fm.expe(
                np.float32(-0.5)
                * ((t - peak_half - np.float32(0.25)) * inv_width) ** 2
            )

        d0 = d_ref[0, :, c0 : c0 + cw]
        d1 = d_ref[1, :, c0 : c0 + cw]
        d2 = d_ref[2, :, c0 : c0 + cw]
        amp = rms_eff * third * (shape_of(d0) + shape_of(d1) + shape_of(d2))
        g = amp * field
        o_ref[0, :, c0 : c0 + cw] = jnp.maximum(d0 + g, np.float32(0.0))
        o_ref[1, :, c0 : c0 + cw] = jnp.maximum(d1 + g, np.float32(0.0))
        o_ref[2, :, c0 : c0 + cw] = jnp.maximum(d2 + g, np.float32(0.0))


def grain_apply_bw_pallas(
    density: jnp.ndarray,
    seed,
    sigma_px: float,
    rms_eff,
    floor,
    peak_half,
    inv_width,
    lo,
    inv_rng,
    tile_h: int = 32,
    chunk: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused BW-grain apply (shared field, channel-mean amplitude)."""
    c, h, w = density.shape
    taps = grain_corr_taps(sigma_px)
    th = min(tile_h, _round_up(h, SUBLANE))
    hp = _round_up(h, th)
    d = density
    if hp != h:
        d = jnp.pad(density, [(0, 0), (0, hp - h), (0, 0)], mode="edge")
    seed_arr = seed2(seed)
    prm = jnp.stack(
        [
            jnp.asarray(v, jnp.float32).reshape(())
            for v in (rms_eff, floor, peak_half, inv_width, lo, inv_rng)
        ]
    )
    out = pl.pallas_call(
        lambda s_ref, p_ref, d_ref, o_ref: _grain_apply_bw_kernel(
            s_ref, p_ref, d_ref, o_ref, taps=taps, th=th, w=w, chunk=chunk
        ),
        out_shape=jax.ShapeDtypeStruct((c, hp, w), jnp.float32),
        grid=(hp // th,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, th, w), lambda j: (0, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, th, w), lambda j: (0, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(seed_arr, prm, d)
    return out[:, :h, :]
