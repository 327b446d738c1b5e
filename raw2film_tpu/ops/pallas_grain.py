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


def _gauss_pair(u_bits, v_bits):
    """Box-Muller from two uint32 draws -> one standard normal.

    uint32->float32 casts go through int32 on TPU (top bit reads as sign), so
    draws are reduced to 24 bits first — which is also exactly a float32
    mantissa.
    """
    inv24 = np.float32(1.0 / 16777216.0)
    u1 = jnp.maximum(
        (u_bits >> np.uint32(8)).astype(jnp.float32) * inv24, np.float32(1e-7)
    )
    u2 = (v_bits >> np.uint32(8)).astype(jnp.float32) * inv24
    r = jnp.sqrt(np.float32(-2.0) * jnp.log(u1))
    return r * jnp.cos(np.float32(2.0 * np.pi) * u2)


def _grain_kernel(seed_ref, o_ref, *, taps, th, w, chunk, row0_offset):
    """Write one (1, th, w) block of correlated unit-variance noise."""
    # program_id returns int32 tracers; any int32 leaking into the hash
    # demotes the uint32 chain to int32 (sign-extending shifts, negative
    # casts) — keep every term explicitly uint32.
    ch = pl.program_id(0).astype(jnp.uint32)
    j = pl.program_id(1).astype(jnp.uint32)
    r = len(taps) // 2
    eh = th + 2 * r
    seed = seed_ref[0].astype(jnp.uint32) + ch * jnp.uint32(0x9E3779B9)
    for c0 in range(0, w, chunk):
        cw = min(chunk, w - c0)
        ew = cw + 2 * r
        # Global coordinates of the extended window (halo regenerated, may
        # be negative or beyond the image - the hash doesn't care).
        yy = jax.lax.broadcasted_iota(jnp.uint32, (eh, ew), 0) + j * jnp.uint32(th)
        xx = jax.lax.broadcasted_iota(jnp.uint32, (eh, ew), 1) + jnp.uint32(
            c0 + row0_offset
        )
        a, b, _ = _pcg3d(xx, yy, jnp.broadcast_to(seed, (eh, ew)))
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
    if sigma_px >= 0.3:
        from raw2film_tpu.ops.conv import gaussian_kernel1d

        k = gaussian_kernel1d(sigma_px, truncate=2.5).astype(np.float64)
        k = k / np.linalg.norm(k)  # separable pass applied twice -> unit L2
    else:
        k = np.ones(1, np.float64)
    taps = tuple(float(t) for t in k)
    th = min(tile_h, _round_up(h, SUBLANE))
    hp = _round_up(h, th)
    c = 1 if bw else 3
    seed_arr = jnp.asarray([seed], jnp.uint32) if np.isscalar(seed) else seed.astype(jnp.uint32).reshape(1)
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
