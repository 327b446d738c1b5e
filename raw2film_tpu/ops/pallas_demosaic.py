"""Pallas Malvar-He-Cutler demosaic: all four 5x5 interpolants + the Bayer
phase selects in ONE streaming kernel.

The XLA formulation (ops/demosaic.py::demosaic_mhc) runs four separate conv
launches over the mosaic and then a select pass — ~2.3 GB of HBM traffic at
24MP where the information content is one mosaic read + one RGB write
(~0.4 GB). Here each row-band block computes the four shift-add interpolants
on the VPU from one shared halo window and writes the phase-selected RGB
directly.

Coefficients are the published Malvar-He-Cutler (ICASSP 2004) kernels,
identical to ops/demosaic.py. Border convention matches: reflect-101.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANE = 8
R = 2  # 5x5 kernel radius


def _demosaic_kernel(
    top_ref, cur_ref, bot_ref, *rest, th, chunk, w, nh, ry, rx, matrix=False
):
    if matrix:
        m_ref, o_ref, win = rest
    else:
        o_ref, win = rest
    j = pl.program_id(0)
    for c0 in range(0, w, chunk):
        cw = min(chunk, w - c0)
        ew = cw + 2 * R

        def fill(dst_rows, src_ref, src_rows):
            def src(rows, lo, hi):
                return src_ref[0, rows, lo:hi]

            lo = c0 - R
            hi = c0 + cw + R
            if lo >= 0 and hi <= w:
                win[dst_rows, 0:ew] = src(src_rows, lo, hi)
                return
            pos = 0
            if lo < 0:
                n = -lo
                for idx in range(n):
                    win[dst_rows, idx : idx + 1] = src(
                        src_rows, n - idx, n - idx + 1
                    )
                pos = n
                lo = 0
            take = min(hi, w) - lo
            win[dst_rows, pos : pos + take] = src(src_rows, lo, lo + take)
            pos += take
            if hi > w:
                n = hi - w
                for idx in range(n):
                    win[dst_rows, pos + idx : pos + idx + 1] = src(
                        src_rows, w - 2 - idx, w - 1 - idx
                    )

        # H halos from (1, R, w) row bands (see fused_sep_rank_mxu: full
        # neighbor blocks triple the mosaic read traffic).
        fill(slice(0, R), top_ref, slice(0, R))
        fill(slice(R, R + th), cur_ref, slice(0, th))
        fill(slice(R + th, R + th + R), bot_ref, slice(0, R))

        @pl.when(j == 0)
        def _top():
            for k in range(R):
                fill(slice(k, k + 1), cur_ref, slice(R - k, R - k + 1))

        @pl.when(j == nh - 1)
        def _bottom():
            for k in range(R):
                fill(
                    slice(R + th + k, R + th + k + 1),
                    cur_ref,
                    slice(th - 2 - k, th - 1 - k),
                )

        # Four interpolants from SHARED pair sums (the MHC kernels decompose
        # over the same symmetric neighbor groups): 13 shifted window reads
        # + ~35 VPU ops instead of 48 reads + ~92 ops for tap-by-tap.
        #   h1/v1: distance-1 horiz/vert pairs, h2/v2: distance-2 pairs,
        #   dg: the four diagonals, m: center.
        def sh(dy, dx):
            return win[dy : dy + th, dx : dx + cw]

        m = sh(R, R)
        h1 = sh(2, 1) + sh(2, 3)
        v1 = sh(1, 2) + sh(3, 2)
        h2 = sh(2, 0) + sh(2, 4)
        v2 = sh(0, 2) + sh(4, 2)
        dg = (sh(1, 1) + sh(1, 3)) + (sh(3, 1) + sh(3, 3))
        e = np.float32(0.125)
        hv2 = h2 + v2
        t_g = e * (np.float32(4.0) * m + np.float32(2.0) * (h1 + v1) - hv2)
        t_row = e * (
            np.float32(5.0) * m + np.float32(4.0) * h1 - dg - h2
            + np.float32(0.5) * v2
        )
        t_col = e * (
            np.float32(5.0) * m + np.float32(4.0) * v1 - dg - v2
            + np.float32(0.5) * h2
        )
        t_opp = e * (
            np.float32(6.0) * m + np.float32(2.0) * dg - np.float32(1.5) * hv2
        )
        # Bayer phase masks from GLOBAL parities.
        yy = (
            jax.lax.broadcasted_iota(jnp.int32, (th, cw), 0) + j * np.int32(th)
        ) & np.int32(1)
        xx = (
            jax.lax.broadcasted_iota(jnp.int32, (th, cw), 1) + np.int32(c0)
        ) & np.int32(1)
        is_r = (yy == ry) & (xx == rx)
        is_b = (yy == 1 - ry) & (xx == 1 - rx)
        g_r_row = (yy == ry) & (xx == 1 - rx)
        g_b_row = (yy == 1 - ry) & (xx == rx)

        sl = slice(c0, c0 + cw)
        if not matrix:
            o_ref[1, :, sl] = jnp.where(is_r | is_b, t_g, m)
            o_ref[0, :, sl] = jnp.where(
                is_r, m, jnp.where(g_r_row, t_row, jnp.where(g_b_row, t_col, t_opp))
            )
            o_ref[2, :, sl] = jnp.where(
                is_b, m, jnp.where(g_b_row, t_row, jnp.where(g_r_row, t_col, t_opp))
            )
        else:
            # Input-transform epilogue: clip the demosaiced RGB to [0,1],
            # apply the traced 3x3 (camera->chain input, VPU scalar
            # mul-adds, exact f32 like render._matp) and floor at 0 — the
            # RGB image never exists outside VMEM (saves a full-res XLA
            # elementwise pass, ~1.1 GB of HBM at 45MP).
            one = np.float32(1.0)
            zero = np.float32(0.0)
            rch = jnp.clip(
                jnp.where(
                    is_r, m,
                    jnp.where(g_r_row, t_row, jnp.where(g_b_row, t_col, t_opp)),
                ),
                zero, one,
            )
            gch = jnp.clip(jnp.where(is_r | is_b, t_g, m), zero, one)
            bch = jnp.clip(
                jnp.where(
                    is_b, m,
                    jnp.where(g_b_row, t_row, jnp.where(g_r_row, t_col, t_opp)),
                ),
                zero, one,
            )
            for c in range(3):
                o_ref[c, :, sl] = jnp.maximum(
                    m_ref[3 * c] * rch + m_ref[3 * c + 1] * gch + m_ref[3 * c + 2] * bch,
                    zero,
                )


def _demosaic_vmem_ok(th, w, chunk, budget=14_000_000):
    """Round-4 v5e calibration at 45MP (benchmarks/demosaic_sweep.py):
    (48, 1024) estimates ~13.0M, compiles, and runs 3.58 ms vs 5.16 for the
    round-3 tile 32; (72, 1024) ~19M and (48, 2048) hard-fail the remote
    compile. The model: double-buffered cur/out blocks + halo bands +
    scratch."""
    if chunk > 1024:
        # (48, 2048) failed the remote compile despite a ~13M model
        # estimate — Mosaic's scoped accounting for the wide scratch is not
        # captured by this model; stay inside the measured region.
        return False
    cur = th * w * 4 * 2
    out = 3 * th * w * 4 * 2
    halos = 2 * R * w * 4 * 2
    scratch = (th + 2 * R) * (chunk + 2 * R) * 4
    return cur + out + halos + scratch <= budget


def _demosaic_tile(h, w, chunk):
    for t in (48, 32):
        if h % t == 0 and h > 2 * t and _demosaic_vmem_ok(t, w, chunk):
            return t
    return 32


def demosaic_mhc_pallas(
    mosaic: jnp.ndarray,
    ry: int,
    rx: int,
    tile_h: int | None = None,
    chunk: int = 1024,
    interpret: bool = False,
    mat: jnp.ndarray | None = None,
) -> jnp.ndarray | None:
    """(H, W) mosaic -> (3, H, W) RGB; returns None when the shape can't be
    served (caller falls back to the XLA formulation).

    ``mat``: optional traced (3, 3) input-transform matrix — the kernel then
    returns max(mat @ clip01(rgb), 0) (the chain's exposure image) instead of
    the raw RGB."""
    h, w = mosaic.shape
    th = tile_h if tile_h is not None else _demosaic_tile(h, w, chunk)
    if h % th != 0 or h <= 2 * th or w <= chunk + R:
        return None
    nh = h // th
    x = mosaic[None]
    # Halo row bands: top[k] = last R rows of block k, bot[k] = first R rows
    # of block k+1 (j==0 / j==nh-1 get garbage via the clamped map and
    # overwrite it with the in-kernel reflection).
    blocks = mosaic.reshape(nh, th, w)
    top_arr = blocks[: nh - 1, th - R :, :]
    bot_arr = blocks[1:, :R, :]
    halo = lambda off: (lambda j: (jnp.clip(j + off, 0, nh - 2), 0, 0))
    mat_args, mat_specs = (), []
    if mat is not None:
        mat_args = (jnp.reshape(mat, (9,)).astype(jnp.float32),)
        mat_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    out = pl.pallas_call(
        lambda t, cu, b, *rest: _demosaic_kernel(
            t, cu, b, *rest,
            th=th, chunk=chunk, w=w, nh=nh, ry=ry, rx=rx,
            matrix=mat is not None,
        ),
        out_shape=jax.ShapeDtypeStruct((3, h, w), mosaic.dtype),
        grid=(nh,),
        in_specs=[
            pl.BlockSpec((1, R, w), halo(-1), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w), lambda j: (0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, w), halo(0), memory_space=pltpu.VMEM),
            *mat_specs,
        ],
        out_specs=pl.BlockSpec(
            (3, th, w), lambda j: (0, j, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((th + 2 * R, chunk + 2 * R), mosaic.dtype)],
        interpret=interpret,
    )(top_arr, x, bot_arr, *mat_args)
    return out
