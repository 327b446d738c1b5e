"""Pallas separable convolution, v2: Mosaic-pipelined blocks.

Lessons from v1 (pallas_conv.py): manual HBM DMAs of row-strided tiles
decompose into per-row descriptors and become latency-bound (~180ms for one
9-tap separable pass at 45MP), and Mosaic's scoped-VMEM stack keeps one temp
per unrolled tap alive. v2 therefore:

* uses plain BlockSpec grids so Mosaic's automatic pipeline does the DMA
  (large contiguous row-band blocks, double-buffered by the compiler),
* solves the H-halo problem by passing the SAME padded array three times
  with index maps j, j+1, j+2 over a top/bottom-extended layout (overlapping
  halo reads are inexpressible in one BlockSpec, but neighbor blocks are),
* bounds VMEM temps by chunking the W axis inside the kernel, so tap temps
  are (TH, CW) instead of (TH, W).

Public: :func:`conv_w` (row conv), :func:`conv_h` (column conv),
:func:`sep_conv` (both), :func:`sep_conv_rank` (sum of R separable passes).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _chunks(total: int, chunk: int):
    """Static (start, size) list covering [0, total)."""
    out = []
    c0 = 0
    while c0 < total:
        out.append((c0, min(chunk, total - c0)))
        c0 += chunk
    return out


def _conv_w_chunked_kernel(x_ref, o_ref, *, taps, w_out, chunk):
    """x (1, TH, W+2r) -> o (1, TH, W); W processed in chunks so tap temps
    stay (TH, chunk)."""
    for c0, cw in _chunks(w_out, chunk):
        first = True
        for q in range(len(taps)):
            if taps[q] == 0.0:
                continue
            term = taps[q] * x_ref[0, :, c0 + q : c0 + q + cw]
            if first:
                o_ref[0, :, c0 : c0 + cw] = term
                first = False
            else:
                o_ref[0, :, c0 : c0 + cw] = o_ref[0, :, c0 : c0 + cw] + term


def _conv_h_neighbor_kernel(prev_ref, cur_ref, next_ref, o_ref, win, *, taps, th, chunk, w):
    """Blocks (1, TH, W) with previous/next row-band neighbors; assemble the
    halo window per W-chunk in scratch, then tap-accumulate."""
    r = len(taps) // 2
    for c0, cw in _chunks(w, chunk):
        sl = slice(c0, c0 + cw)
        # win: (TH + 2r, chunk) scratch; top halo from prev, bottom from next.
        win[0:r, 0:cw] = prev_ref[0, th - r : th, sl]
        win[r : r + th, 0:cw] = cur_ref[0, :, sl]
        win[r + th : r + th + r, 0:cw] = next_ref[0, 0:r, sl]
        first = True
        for q in range(len(taps)):
            if taps[q] == 0.0:
                continue
            term = taps[q] * win[q : q + th, 0:cw]
            if first:
                o_ref[0, :, sl] = term
                first = False
            else:
                o_ref[0, :, sl] = o_ref[0, :, sl] + term


def conv_w(
    img: jnp.ndarray,
    taps,
    tile_h: int = 64,
    chunk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Row (along W) 1-D correlation, reflect border. img (C, H, W)."""
    taps = tuple(float(t) for t in np.asarray(taps).ravel())
    r = len(taps) // 2
    c, h, w = img.shape
    th = min(tile_h, _round_up(h, SUBLANE))
    hp = _round_up(h, th)
    x = jnp.pad(img, [(0, 0), (0, hp - h), (r, r)], mode="reflect" if r else "edge")
    out = pl.pallas_call(
        lambda x_ref, o_ref: _conv_w_chunked_kernel(
            x_ref, o_ref, taps=taps, w_out=w, chunk=chunk
        ),
        out_shape=jax.ShapeDtypeStruct((c, hp, w), img.dtype),
        grid=(c, hp // th),
        in_specs=[
            pl.BlockSpec(
                (1, th, w + 2 * r), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, th, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x)
    return out[:, :h, :]


def conv_h(
    img: jnp.ndarray,
    taps,
    tile_h: int = 32,
    chunk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Column (along H) 1-D correlation, reflect border. img (C, H, W).

    Requires halo radius <= tile_h (true for every kernel in the pipeline).
    """
    taps = tuple(float(t) for t in np.asarray(taps).ravel())
    r = len(taps) // 2
    c, h, w = img.shape
    th = min(tile_h, _round_up(h, SUBLANE))
    hp = _round_up(h, th)
    if r > th or h <= 2 * th + 1 or hp - h + th >= h:
        # Small images: the neighbor-block layout needs h > 2*tile; the XLA
        # shift-add path is cheap at these sizes.
        from raw2film_tpu.ops import conv as convops

        return convops._conv1d_axis(img, np.asarray(taps, np.float32), -2)
    # Layout: [one full extra block on top][image rows][grid padding + one
    # extra block at the bottom], all reflect-filled; stored block j+1 holds
    # image band j, so a band's neighbors are stored blocks j and j+2.
    x = jnp.pad(img, [(0, 0), (th, hp - h + th), (0, 0)], mode="reflect")
    nh = hp // th
    out = pl.pallas_call(
        lambda p_ref, c_ref, n_ref, o_ref, win: _conv_h_neighbor_kernel(
            p_ref, c_ref, n_ref, o_ref, win, taps=taps, th=th, chunk=chunk, w=w
        ),
        out_shape=jax.ShapeDtypeStruct((c, hp, w), img.dtype),
        grid=(c, nh),
        in_specs=[
            pl.BlockSpec((1, th, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, th, w), lambda i, j: (i, j + 1, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, th, w), lambda i, j: (i, j + 2, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * (len(taps) // 2), chunk), img.dtype),
        ],
        interpret=interpret,
    )(x, x, x)
    return out[:, :h, :]


def sep_conv(
    img: jnp.ndarray, kv, kh, interpret: bool = False
) -> jnp.ndarray:
    """Separable conv: column kernel kv then row kernel kh."""
    return conv_w(conv_h(img, kv, interpret=interpret), kh, interpret=interpret)


def sep_conv_rank(img: jnp.ndarray, u, v, interpret: bool = False) -> jnp.ndarray:
    """Sum over rank terms of sep_conv(img, u[r], v[r])."""
    out = None
    for kv, kh in zip(u, v):
        term = sep_conv(img, kv, kh, interpret=interpret)
        out = term if out is None else out + term
    return out
