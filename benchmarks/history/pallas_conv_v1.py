"""Pallas separable conv kernels, v1 — SUPERSEDED by pallas_conv2.

Kept as a measured record (tests exercise it in interpret mode): the
manual-DMA tile design here turned out latency-bound on hardware — HBM DMAs
of row-strided tiles decompose into per-row descriptors (~180ms for one
9-tap pass at 45MP) and the double-buffered variant was worse. The
production path is ops/pallas_conv2.py (Mosaic-pipelined BlockSpecs,
neighbor-block halos, banded MXU matmuls). Nothing in the pipeline
dispatches here anymore.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8


def _pad_reflect(img, ph, pw):
    if ph == 0 and pw == 0:
        return img
    cfg = [(0, 0)] * (img.ndim - 2) + [(ph, ph), (pw, pw)]
    return jnp.pad(img, cfg, mode="reflect")


def _round_up(x, m):
    return (x + m - 1) // m * m


def _conv_w_kernel(x_ref, out_ref, *, taps, w_out):
    """x block (1, TH, W+2r) -> out (1, TH, W): conv along the last axis.

    ``taps`` is a 1-D tuple shared by all channels in this call (per-channel
    kernels are handled by per-channel calls at the dispatch layer).

    Accumulates in-place into out_ref: a functional sum-chain makes Mosaic's
    stack allocator keep every tap temp live simultaneously (observed 40MB
    scoped VMEM for 17 taps at 45MP).
    """
    x = x_ref[0]
    out_ref[0] = taps[0] * x[:, 0:w_out]
    for i in range(1, len(taps)):
        if taps[i] == 0.0:
            continue
        out_ref[0] = out_ref[0] + taps[i] * x[:, i : i + w_out]


def _conv_h_kernel(x_ref, out_ref, *, taps, h_out):
    x = x_ref[0]
    out_ref[0] = taps[0] * x[0:h_out, :]
    for i in range(1, len(taps)):
        if taps[i] == 0.0:
            continue
        out_ref[0] = out_ref[0] + taps[i] * x[i : i + h_out, :]


def _conv_w_rank_kernel(x_ref, out_ref, *, tap_rows, w_out):
    """x (1, TH, W+2r) -> out (R, 1, TH, W): R row kernels in one read."""
    x = x_ref[0]
    for r, taps in enumerate(tap_rows):
        acc = taps[0] * x[:, 0:w_out]
        for i in range(1, len(taps)):
            if taps[i] == 0.0:
                continue
            acc = acc + taps[i] * x[:, i : i + w_out]
        out_ref[r, 0] = acc


def _conv_h_sum_kernel(x_ref, out_ref, *, tap_rows, h_out):
    """x (R, 1, H+2r, TW) -> out (1, H, TW): column convs summed over R."""
    total = None
    for r, taps in enumerate(tap_rows):
        x = x_ref[r, 0]
        acc = taps[0] * x[0:h_out, :]
        for i in range(1, len(taps)):
            if taps[i] == 0.0:
                continue
            acc = acc + taps[i] * x[i : i + h_out, :]
        total = acc if total is None else total + acc
    out_ref[0] = total


def _sep_tile_kernel(x_hbm, o_ref, xs, ts, sem, *, kv, kh, th, tw, th2, tw2):
    """One (TH, TW) output tile: DMA tile+halo from HBM, column conv then row
    conv in VMEM, write the tile.

    xs: (th2, tw2) input scratch (halo window rounded up to sublane/lane
    alignment — DMA slice sizes must be tile-aligned); ts: (TH, tw2)
    column-conv scratch. In-place ref accumulation keeps Mosaic's
    scoped-VMEM stack at ~2 temps instead of taps temps.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    cp = pltpu.make_async_copy(
        x_hbm.at[i, pl.ds(j * th, th2), pl.ds(k * tw, tw2)],
        xs,
        sem,
    )
    cp.start()
    cp.wait()
    ts[...] = kv[0] * xs[0:th, :]
    for t in range(1, len(kv)):
        if kv[t] == 0.0:
            continue
        ts[...] = ts[...] + kv[t] * xs[t : t + th, :]
    o_ref[0] = kh[0] * ts[:, 0:tw]
    for t in range(1, len(kh)):
        if kh[t] == 0.0:
            continue
        o_ref[0] = o_ref[0] + kh[t] * ts[:, t : t + tw]


def _rank_tile_kernel(
    x_hbm, o_ref, xs2, ts, sem2, *, tap_rows_v, tap_rows_h, th, tw, th2, tw2, nh, nw
):
    """Rank-fused tile with double-buffered input DMA.

    Grid is flattened to 1D (channel-major); scratch persists across grid
    steps, so step t waits on the copy started at t-1 while kicking off the
    prefetch for t+1. All rank rows are zero-padded to a common tap count
    with centers aligned, so every term reads the same halo window.
    """
    t = pl.program_id(0)
    n = pl.num_programs(0)

    def dma(step, slot):
        i = step // (nh * nw)
        j = (step // nw) % nh
        k = step % nw
        return pltpu.make_async_copy(
            x_hbm.at[i, pl.ds(j * th, th2), pl.ds(k * tw, tw2)],
            xs2.at[slot],
            sem2.at[slot],
        )

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        dma(0, 0).start()

    @pl.when(t + 1 < n)
    def _():
        dma(t + 1, jax.lax.rem(t + 1, 2)).start()

    dma(t, slot).wait()

    def body(s):
        for r, (kv, kh) in enumerate(zip(tap_rows_v, tap_rows_h)):
            first_v = True
            for q in range(len(kv)):
                if kv[q] == 0.0:
                    continue
                term = kv[q] * xs2[s, q : q + th, :]
                if first_v:
                    ts[...] = term
                    first_v = False
                else:
                    ts[...] = ts[...] + term
            first_h = True
            for q in range(len(kh)):
                if kh[q] == 0.0:
                    continue
                term = kh[q] * ts[:, q : q + tw]
                if r == 0 and first_h:
                    o_ref[0] = term
                    first_h = False
                else:
                    o_ref[0] = o_ref[0] + term

    # Static unroll over the two slots (dynamic leading-index reads of VMEM
    # scratch are avoided for Mosaic friendliness).
    @pl.when(slot == 0)
    def _():
        body(0)

    @pl.when(slot == 1)
    def _():
        body(1)


def _pad_taps(rows: np.ndarray, taps: int) -> np.ndarray:
    """Zero-pad (R, k) tap rows to k=taps keeping centers aligned."""
    rows = np.atleast_2d(np.asarray(rows, np.float64))
    k = rows.shape[1]
    off = (taps - k) // 2
    out = np.zeros((rows.shape[0], taps), np.float64)
    out[:, off : off + k] = rows
    return out


def sep_conv2d_rank_tiled(
    img: jnp.ndarray,
    u,
    v,
    tile: tuple[int, int] = (256, 1024),
    interpret: bool = False,
) -> jnp.ndarray:
    """Sum of R separable passes in ONE streaming pass (manual-DMA tiles,
    double-buffered prefetch).

    u: list/array of column-tap rows; v: matching row-tap rows (any lengths —
    they are center-aligned and zero-padded to the longest)."""
    u = [np.asarray(r, np.float64).ravel() for r in u]
    v = [np.asarray(r, np.float64).ravel() for r in v]
    kt_v = max(len(r) for r in u)
    kt_h = max(len(r) for r in v)
    if kt_v % 2 == 0:
        kt_v += 1
    if kt_h % 2 == 0:
        kt_h += 1
    uu = np.stack([_pad_taps(r, kt_v)[0] for r in u])
    vv = np.stack([_pad_taps(r, kt_h)[0] for r in v])
    tap_rows_v = tuple(tuple(float(t) for t in row) for row in uu)
    tap_rows_h = tuple(tuple(float(t) for t in row) for row in vv)
    rv = kt_v // 2
    rh = kt_h // 2
    c, h, w = img.shape
    th, tw = tile
    th = min(th, _round_up(h, SUBLANE))
    tw = min(tw, _round_up(w, LANE))
    hp = _round_up(h, th)
    wp = _round_up(w, tw)
    th2 = _round_up(th + 2 * rv, SUBLANE)
    tw2 = _round_up(tw + 2 * rh, LANE)
    x = _pad_reflect(img, rv, rh)
    pad_h = (hp - h) + (th2 - (th + 2 * rv))
    pad_w = (wp - w) + (tw2 - (tw + 2 * rh))
    x = jnp.pad(x, [(0, 0), (0, pad_h), (0, pad_w)], mode="edge")
    nh = hp // th
    nw = wp // tw
    out = pl.pallas_call(
        lambda x_hbm, o_ref, xs2, ts, sem2: _rank_tile_kernel(
            x_hbm, o_ref, xs2, ts, sem2,
            tap_rows_v=tap_rows_v, tap_rows_h=tap_rows_h,
            th=th, tw=tw, th2=th2, tw2=tw2, nh=nh, nw=nw,
        ),
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), img.dtype),
        grid=(c * nh * nw,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, th, tw),
            lambda t: (t // (nh * nw), (t // nw) % nh, t % nw),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, th2, tw2), img.dtype),
            pltpu.VMEM((th, tw2), img.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x)
    return out[:, :h, :w]


def sep_conv2d_tiled(
    img: jnp.ndarray,
    kv: np.ndarray,
    kh: np.ndarray,
    tile: tuple[int, int] = (256, 512),
    interpret: bool = False,
) -> jnp.ndarray:
    """Separable conv as one Pallas op: manual-DMA tiles with halos in both
    axes (BlockSpec index maps cannot express overlapping halo reads)."""
    kv = tuple(float(t) for t in np.asarray(kv).ravel())
    kh = tuple(float(t) for t in np.asarray(kh).ravel())
    rv = len(kv) // 2
    rh = len(kh) // 2
    c, h, w = img.shape
    th, tw = tile
    th = min(th, _round_up(h, SUBLANE))
    tw = min(tw, _round_up(w, LANE))
    hp = _round_up(h, th)
    wp = _round_up(w, tw)
    # DMA window sizes, alignment-rounded.
    th2 = _round_up(th + 2 * rv, SUBLANE)
    tw2 = _round_up(tw + 2 * rh, LANE)
    x = _pad_reflect(img, rv, rh)
    # Trailing pad covers both the tile grid and the aligned DMA windows of
    # the last tiles.
    pad_h = (hp - h) + (th2 - (th + 2 * rv))
    pad_w = (wp - w) + (tw2 - (tw + 2 * rh))
    x = jnp.pad(x, [(0, 0), (0, pad_h), (0, pad_w)], mode="edge")
    out = pl.pallas_call(
        lambda x_hbm, o_ref, xs, ts, sem: _sep_tile_kernel(
            x_hbm, o_ref, xs, ts, sem, kv=kv, kh=kh, th=th, tw=tw, th2=th2, tw2=tw2
        ),
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), img.dtype),
        grid=(c, hp // th, wp // tw),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, th, tw), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((th2, tw2), img.dtype),
            pltpu.VMEM((th, tw2), img.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x)
    return out[:, :h, :w]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _tile_rows(h: int, vmem_budget: int, row_bytes: int) -> int:
    th = max(SUBLANE, min(h, vmem_budget // max(row_bytes, 1)))
    return _round_up(min(th, h), SUBLANE)


def conv_w_pallas(img: jnp.ndarray, taps: np.ndarray, interpret: bool = False):
    """Conv along W with a shared 1-D kernel. img (C, H, W) float32."""
    taps = tuple(float(t) for t in np.asarray(taps).ravel())
    r = len(taps) // 2
    c, h, w = img.shape
    x = _pad_reflect(img, 0, r)
    wp = w + 2 * r
    th = _tile_rows(h, 2 * 1024 * 1024, wp * 4)
    hp = _round_up(h, th)
    if hp != h:
        x = jnp.pad(x, [(0, 0), (0, hp - h), (0, 0)], mode="edge")
    grid = (c, hp // th)
    out = pl.pallas_call(
        lambda x_ref, o_ref: _conv_w_kernel(x_ref, o_ref, taps=taps, w_out=w),
        out_shape=jax.ShapeDtypeStruct((c, hp, w), img.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, wp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, th, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x)
    return out[:, :h, :]


def conv_h_pallas(img: jnp.ndarray, taps: np.ndarray, interpret: bool = False):
    """Conv along H with a shared 1-D kernel. img (C, H, W) float32."""
    taps = tuple(float(t) for t in np.asarray(taps).ravel())
    r = len(taps) // 2
    c, h, w = img.shape
    x = _pad_reflect(img, r, 0)
    hp = h + 2 * r
    tw = _tile_rows(w, 2 * 1024 * 1024, hp * 4)  # column strip width
    tw = _round_up(min(tw, w), LANE) if w >= LANE else w
    wp = _round_up(w, tw)
    if wp != w:
        x = jnp.pad(x, [(0, 0), (0, 0), (0, wp - w)], mode="edge")
    grid = (c, wp // tw)
    out = pl.pallas_call(
        lambda x_ref, o_ref: _conv_h_kernel(x_ref, o_ref, taps=taps, h_out=h),
        out_shape=jax.ShapeDtypeStruct((c, h, wp), img.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hp, tw), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, h, tw), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x)
    return out[:, :, :w]


def sep_conv2d(
    img: jnp.ndarray, kv: np.ndarray, kh: np.ndarray, interpret: bool | None = None
) -> jnp.ndarray:
    """Separable conv (columns kv then rows kh), Pallas on TPU, XLA fallback."""
    if interpret is None and not _on_tpu():
        from raw2film_tpu.ops import conv as convops

        return convops.separable_conv(img, np.asarray(kv), np.asarray(kh))
    return sep_conv2d_rank_tiled(img, [kv], [kh], interpret=bool(interpret))


def sep_conv2d_rank(
    img: jnp.ndarray,
    u: np.ndarray,
    v: np.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Sum of R separable passes: out = sum_r conv_h(u[r], conv_w(v[r], img)).

    u: (R, kh_taps) column kernels; v: (R, kw_taps) row kernels (shared
    across channels). The W pass computes all R row-convolutions in one
    streaming read; the H pass consumes them and reduces — total HBM traffic
    (2 + 2R) x image instead of 4R x.
    """
    u = np.asarray(u, np.float64)
    v = np.asarray(v, np.float64)
    if interpret is None and not _on_tpu():
        from raw2film_tpu.ops import conv as convops

        return convops.conv2d_svd(img, u.astype(np.float32), v.astype(np.float32))
    return sep_conv2d_rank_tiled(img, list(u), list(v), interpret=bool(interpret))
