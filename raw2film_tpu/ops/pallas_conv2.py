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


# ---------------------------------------------------------------------------
# v3: both axes + all rank terms fused in a single streaming kernel.
# ---------------------------------------------------------------------------


def _fused_rank_kernel(
    prev_ref, cur_ref, next_ref, o_ref, win, tmp,
    *, ranks, th, chunk, w, rh_max,
):
    """One row-band: for every rank, column-conv into tmp then row-conv
    accumulated into o_ref. W edges reflect in-kernel (full width in block);
    H halos come from the neighbor blocks.

    ranks: tuple of (taps_v, taps_h, rw) — rw = row-kernel radius.
    win: (th + 2*rh_max, chunk + 2*rw_max) scratch
    tmp: (th, chunk + 2*rw_max) scratch
    """
    for c0 in range(0, w, chunk):
        cw = min(chunk, w - c0)
        for ri, (tv, thaps, rw) in enumerate(ranks):
            rv = len(tv) // 2
            ew = cw + 2 * rw  # extended chunk width for the row conv
            # ---- assemble win rows [th+2rv] x cols [ew] with W reflection
            def fill(dst_rows, src_ref, src_rows):
                # columns c0-rw .. c0+cw+rw with reflect-101 at 0 and w
                lo = c0 - rw
                hi = c0 + cw + rw
                # interior fast path
                if lo >= 0 and hi <= w:
                    win[dst_rows, 0:ew] = src_ref[0, src_rows, lo:hi]
                    return
                # Edge chunks: reflect column-by-column (Mosaic has no `rev`;
                # at most rw tiny copies on the first/last chunk only).
                pos = 0
                if lo < 0:
                    n = -lo
                    for idx in range(n):
                        win[dst_rows, idx : idx + 1] = src_ref[
                            0, src_rows, n - idx : n - idx + 1
                        ]
                    pos = n
                    lo = 0
                take = min(hi, w) - lo
                win[dst_rows, pos : pos + take] = src_ref[0, src_rows, lo : lo + take]
                pos += take
                if hi > w:
                    n = hi - w
                    for idx in range(n):
                        win[dst_rows, pos + idx : pos + idx + 1] = src_ref[
                            0, src_rows, w - 2 - idx : w - 1 - idx
                        ]

            if rv:
                fill(slice(0, rv), prev_ref, slice(th - rv, th))
            fill(slice(rv, rv + th), cur_ref, slice(0, th))
            if rv:
                fill(slice(rv + th, rv + th + rv), next_ref, slice(0, rv))
            # ---- column conv -> tmp (th, ew)
            first = True
            for q in range(len(tv)):
                if tv[q] == 0.0:
                    continue
                term = tv[q] * win[q : q + th, 0:ew]
                if first:
                    tmp[:, 0:ew] = term
                    first = False
                else:
                    tmp[:, 0:ew] = tmp[:, 0:ew] + term
            # ---- row conv -> accumulate out
            first_h = ri == 0
            for q in range(len(thaps)):
                if thaps[q] == 0.0:
                    continue
                term = thaps[q] * tmp[:, q : q + cw]
                if first_h:
                    o_ref[0, :, c0 : c0 + cw] = term
                    first_h = False
                else:
                    o_ref[0, :, c0 : c0 + cw] = (
                        o_ref[0, :, c0 : c0 + cw] + term
                    )


def fused_sep_rank(
    img: jnp.ndarray,
    u,
    v,
    tile_h: int = 32,
    chunk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sum of R separable (u[r], v[r]) passes in ONE streaming kernel:
    one read (x3 for H neighbor blocks) + one write regardless of rank."""
    u = [np.asarray(r_, np.float64).ravel() for r_ in u]
    v = [np.asarray(r_, np.float64).ravel() for r_ in v]
    c, h, w = img.shape
    th = min(tile_h, _round_up(h, SUBLANE))
    hp = _round_up(h, th)
    rh_max = max(len(r_) // 2 for r_ in u)
    rw_max = max(len(r_) // 2 for r_ in v)
    if rh_max > th or h <= 2 * th + 1 or hp - h + th >= h or w <= 2 * rw_max + chunk // 8:
        from raw2film_tpu.ops import conv as convops

        out = None
        for kv, kh in zip(u, v):
            term = convops._conv1d_axis(
                convops._conv1d_axis(img, np.asarray(kv, np.float32), -2),
                np.asarray(kh, np.float32),
                -1,
            )
            out = term if out is None else out + term
        return out
    ranks = tuple(
        (
            tuple(float(t) for t in kv),
            tuple(float(t) for t in kh),
            len(kh) // 2,
        )
        for kv, kh in zip(u, v)
    )
    x = jnp.pad(img, [(0, 0), (th, hp - h + th), (0, 0)], mode="reflect")
    nh = hp // th
    out = pl.pallas_call(
        lambda p_ref, c_ref, n_ref, o_ref, win, tmp: _fused_rank_kernel(
            p_ref, c_ref, n_ref, o_ref, win, tmp,
            ranks=ranks, th=th, chunk=chunk, w=w, rh_max=rh_max,
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
            pltpu.VMEM((th + 2 * rh_max, chunk + 2 * rw_max), img.dtype),
            pltpu.VMEM((th, chunk + 2 * rw_max), img.dtype),
        ],
        interpret=interpret,
    )(x, x, x)
    return out[:, :h, :]


# ---------------------------------------------------------------------------
# v4: row conv on the MXU (banded constant matmul), column conv on the VPU.
# ---------------------------------------------------------------------------


def _band_matrix(taps, ew: int, cw: int) -> np.ndarray:
    """(ew, cw) banded matrix B with B[q + j, j] = taps[q]: row-conv as
    tmp(th, ew) @ B -> (th, cw)."""
    b = np.zeros((ew, cw), np.float32)
    for q, t in enumerate(taps):
        if t == 0.0:
            continue
        idx = np.arange(cw)
        b[q + idx, idx] = t
    return b


def _fused_rank_mxu_kernel(
    prev_ref, cur_ref, next_ref, *rest,
    ranks, th, chunk, w, rh_max,
):
    # rest = [band_main_0, band_last_0, ...] + [colband_0, ...], o_ref, win, tmp
    nr = len(ranks)
    band_refs = rest[: 2 * nr]
    colband_refs = rest[2 * nr : 3 * nr]
    o_ref, win, tmp = rest[3 * nr], rest[3 * nr + 1], rest[3 * nr + 2]
    """Like _fused_rank_kernel but the row conv is tmp @ B on the MXU."""
    n_chunks = len(_chunks(w, chunk))
    for ci, (c0, cw) in enumerate(_chunks(w, chunk)):
        for ri, (tv, thaps, rw) in enumerate(ranks):
            rv = len(tv) // 2
            ew = cw + 2 * rw

            def fill(dst_rows, src_ref, src_rows):
                lo = c0 - rw
                hi = c0 + cw + rw
                if lo >= 0 and hi <= w:
                    win[dst_rows, 0:ew] = src_ref[0, src_rows, lo:hi]
                    return
                pos = 0
                if lo < 0:
                    n = -lo
                    for idx in range(n):
                        win[dst_rows, idx : idx + 1] = src_ref[
                            0, src_rows, n - idx : n - idx + 1
                        ]
                    pos = n
                    lo = 0
                take = min(hi, w) - lo
                win[dst_rows, pos : pos + take] = src_ref[0, src_rows, lo : lo + take]
                pos += take
                if hi > w:
                    n = hi - w
                    for idx in range(n):
                        win[dst_rows, pos + idx : pos + idx + 1] = src_ref[
                            0, src_rows, w - 2 - idx : w - 1 - idx
                        ]

            if rv:
                fill(slice(0, rv), prev_ref, slice(th - rv, th))
            fill(slice(rv, rv + th), cur_ref, slice(0, th))
            if rv:
                fill(slice(rv + th, rv + th + rv), next_ref, slice(0, rv))

            # Column conv on the MXU: (th, th+2rv) banded @ (th+2rv, ew).
            tmp[:, 0:ew] = jnp.dot(
                colband_refs[ri][...],
                win[0 : th + 2 * rv, 0:ew],
                preferred_element_type=jnp.float32,
            )

            band_ref = band_refs[2 * ri + (1 if ci == n_chunks - 1 else 0)]
            res = jnp.dot(
                tmp[:, 0:ew], band_ref[...], preferred_element_type=jnp.float32
            )
            if ri == 0:
                o_ref[0, :, c0 : c0 + cw] = res
            else:
                o_ref[0, :, c0 : c0 + cw] = o_ref[0, :, c0 : c0 + cw] + res


def fused_sep_rank_mxu(
    img: jnp.ndarray,
    u,
    v,
    tile_h: int = 32,
    chunk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """fused_sep_rank with the row conv on the MXU via banded matmuls.

    Requires W % chunk handling: a distinct band matrix serves the (possibly
    shorter) last chunk.
    """
    u = [np.asarray(r_, np.float64).ravel() for r_ in u]
    v = [np.asarray(r_, np.float64).ravel() for r_ in v]
    c, h, w = img.shape
    rh_max = max(len(r_) // 2 for r_ in u)
    rw_max = max(len(r_) // 2 for r_ in v)
    # The H halo must fit in one neighbor block: grow the tile for wide
    # kernels instead of silently falling back.
    th = min(max(tile_h, _round_up(rh_max, SUBLANE)), _round_up(h, SUBLANE))
    hp = _round_up(h, th)
    if rh_max > th or h <= 2 * th + 1 or hp - h + th >= h or w <= chunk:
        return fused_sep_rank(img, u, v, tile_h=tile_h, chunk=chunk,
                              interpret=interpret)
    ranks = tuple(
        (
            tuple(float(t) for t in kv),
            tuple(float(t) for t in kh),
            len(kh) // 2,
        )
        for kv, kh in zip(u, v)
    )
    last_cw = w - (len(_chunks(w, chunk)) - 1) * chunk
    bands = tuple(
        (
            _band_matrix(kh, chunk + 2 * (len(kh) // 2), chunk),
            _band_matrix(kh, last_cw + 2 * (len(kh) // 2), last_cw),
        )
        for _, kh in zip(u, v)
    )
    x = jnp.pad(img, [(0, 0), (th, hp - h + th), (0, 0)], mode="reflect")
    nh = hp // th
    band_specs = []
    band_args = []
    for bm, bl in bands:
        band_specs.append(
            pl.BlockSpec(bm.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        )
        band_args.append(jnp.asarray(bm))
        band_specs.append(
            pl.BlockSpec(bl.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        )
        band_args.append(jnp.asarray(bl))
    for kv, _ in zip(u, v):
        # (th, th+2rv): row i picks sum_q tv[q] * win[q+i]
        cb = _band_matrix(tuple(float(t) for t in kv), th + 2 * (len(kv) // 2), th).T
        cb = np.ascontiguousarray(cb, np.float32)
        band_specs.append(
            pl.BlockSpec(cb.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        )
        band_args.append(jnp.asarray(cb))
    out = pl.pallas_call(
        lambda p_ref, c_ref, n_ref, *rest: _fused_rank_mxu_kernel(
            p_ref, c_ref, n_ref, *rest,
            ranks=ranks, th=th, chunk=chunk, w=w, rh_max=rh_max,
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
            *band_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, th, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * rh_max, chunk + 2 * rw_max), img.dtype),
            pltpu.VMEM((th, chunk + 2 * rw_max), img.dtype),
        ],
        interpret=interpret,
    )(x, x, x, *band_args)
    return out[:, :h, :]
