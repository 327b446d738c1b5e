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
    top_ref, cur_ref, bot_ref, *rest,
    ranks, th, chunk, w, rh_max, rw_max, nh, patch_edges, precision=None,
    same_last=False, grain_taps=None, colmerge=False,
):
    """Like _fused_rank_kernel but the row conv is tmp @ B on the MXU.

    The halo window is assembled ONCE per W-chunk at the max radii and every
    rank slices its sub-window — one set of VMEM copies regardless of rank.
    H halos arrive as (1, 1, rh, w) row bands gathered host-side (full
    prev/next neighbor blocks would triple the HBM read traffic and eat the
    VMEM that taller, MXU-friendlier tiles need). With ``patch_edges`` the
    first/last row-band reflects its halo rows in-kernel; in padded mode the
    halo bands come pre-reflected from the jnp.pad frame.

    ``grain_taps``: when set, a film-grain epilogue runs on each finished
    chunk (MTF + grain mega-fusion: the post-conv density never returns to
    HBM between the stages). The hash field is positionally stateless, so
    this reproduces ops.pallas_grain.grain_apply_pallas bit-for-bit.

    ``colmerge``: every rank's column conv runs as ONE (nr*th, .) matmul —
    nr-fold better MXU row utilization for the column pass.
    """
    # rest = [band_main_0, band_last_0, ...] + [colband_0, ...],
    #        [grain seed, grain prm (SMEM) if grain_taps], o_ref, win, tmp
    # band/colband refs are (1, ., .) blocks of per-channel (C_b, ., .)
    # stacks (C_b=1 when all channels share one kernel).
    nr = len(ranks)
    bands_per_rank = 1 if same_last else 2
    band_refs = rest[: bands_per_rank * nr]
    n_cb = 1 if colmerge else nr
    colband_refs = rest[bands_per_rank * nr : bands_per_rank * nr + n_cb]
    if grain_taps is not None:
        seed_ref = rest[bands_per_rank * nr + n_cb]
        prm_ref = rest[bands_per_rank * nr + n_cb + 1]
    o_ref, win, tmp = rest[-3], rest[-2], rest[-1]
    n_chunks = len(_chunks(w, chunk))
    j = pl.program_id(1)
    for ci, (c0, cw) in enumerate(_chunks(w, chunk)):
        ew_max = cw + 2 * rw_max

        def fill(dst_rows, src_ref, src_rows, halo=False):
            # Columns [c0-rw_max, c0+cw+rw_max) with reflect-101 at 0 and w.
            def src(rows, lo, hi):
                return (
                    src_ref[0, 0, rows, lo:hi] if halo else src_ref[0, rows, lo:hi]
                )

            lo = c0 - rw_max
            hi = c0 + cw + rw_max
            if lo >= 0 and hi <= w:
                win[dst_rows, 0:ew_max] = src(src_rows, lo, hi)
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

        if rh_max:
            fill(slice(0, rh_max), top_ref, slice(0, rh_max), halo=True)
        fill(slice(rh_max, rh_max + th), cur_ref, slice(0, th))
        if rh_max:
            fill(
                slice(rh_max + th, rh_max + th + rh_max),
                bot_ref,
                slice(0, rh_max),
                halo=True,
            )
        if patch_edges and rh_max:
            # First/last band: halo rows reflect the band itself (the
            # clamped halo index map delivered the wrong rows).
            @pl.when(j == 0)
            def _top():
                for k in range(rh_max):
                    fill(slice(k, k + 1), cur_ref, slice(rh_max - k, rh_max - k + 1))

            @pl.when(j == nh - 1)
            def _bottom():
                for k in range(rh_max):
                    fill(
                        slice(rh_max + th + k, rh_max + th + k + 1),
                        cur_ref,
                        slice(th - 2 - k, th - 1 - k),
                    )

        split = precision == "split"
        prec = None if precision in ("split", "dc") else precision

        def _bf16_trunc(x):
            """Zero the low 16 mantissa bits: exactly bf16-representable.
            Bit ops (not dtype casts) so --xla_allow_excess_precision can't
            fold hi/lo back together."""
            bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
            return jax.lax.bitcast_convert_type(
                bits & jnp.uint32(0xFFFF0000), jnp.float32
            )

        def mm(a, b):
            """a @ b with f32 accumulation; in split mode the IMAGE operand
            ``b`` goes through the MXU twice as bf16 hi + lo halves (error ~
            1e-6 instead of the default's bf16-input ~4e-3), while the
            constant band ``a`` is DC-compensated on the host."""
            if not split:
                return jnp.dot(
                    a, b, preferred_element_type=jnp.float32, precision=prec
                )
            hi_part = _bf16_trunc(b)
            lo = b - hi_part
            return jnp.dot(
                a, hi_part, preferred_element_type=jnp.float32
            ) + jnp.dot(a, lo, preferred_element_type=jnp.float32)

        if colmerge:
            # All ranks' column convs as one (nr*th, th+2rh) @ (th+2rh, ew).
            tmp[:, 0:ew_max] = mm(
                colband_refs[0][0], win[0 : th + 2 * rh_max, 0:ew_max]
            )
        for ri, (tv, thaps, rw) in enumerate(ranks):
            rv = len(tv) // 2
            ew = cw + 2 * rw
            coff = rw_max - rw
            if colmerge:
                t_in = tmp[ri * th : (ri + 1) * th, coff : coff + ew]
            else:
                # Column conv on the MXU: (th, th+2rv) banded @ (th+2rv, ew).
                tmp[:, 0:ew] = mm(
                    colband_refs[ri][0],
                    win[rh_max - rv : rh_max + th + rv, coff : coff + ew],
                )
                t_in = tmp[:, 0:ew]

            band_ref = band_refs[
                bands_per_rank * ri
                + (1 if (not same_last and ci == n_chunks - 1) else 0)
            ]
            # Row conv: the image operand is on the LEFT here.
            if split:
                t_hi = _bf16_trunc(t_in)
                tlo = t_in - t_hi
                res = jnp.dot(
                    t_hi, band_ref[0], preferred_element_type=jnp.float32
                ) + jnp.dot(
                    tlo, band_ref[0], preferred_element_type=jnp.float32
                )
            else:
                res = jnp.dot(
                    t_in,
                    band_ref[0],
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )
            if ri == 0:
                o_ref[0, :, c0 : c0 + cw] = res
            else:
                o_ref[0, :, c0 : c0 + cw] = o_ref[0, :, c0 : c0 + cw] + res

        if grain_taps is not None:
            from raw2film_tpu.ops.pallas_grain import (
                grain_amplitude_block,
                grain_field_block,
            )

            field = grain_field_block(
                seed_ref, grain_taps, th, cw,
                j * np.int32(th), np.int32(c0),
                pl.program_id(0) * np.int32(-1640531527),
            )
            d = o_ref[0, :, c0 : c0 + cw]
            o_ref[0, :, c0 : c0 + cw] = jnp.maximum(
                d + grain_amplitude_block(d, prm_ref) * field, np.float32(0.0)
            )


def _auto_tile(h, w, u, v, chunk, rh_max, rw_max) -> int:
    """Tile height for fused_sep_rank_mxu's auto mode.

    Taller tiles raise MXU row utilization (M=48: 12.2 vs 14.5 ms for the
    halation pass at 45MP; 64 blows the double-buffered VMEM budget).
    Prefer a height that divides H so the pad-free clamped-index mode
    applies — but only if the tile's VMEM estimate clears the 16MB scoped
    limit with margin: Mosaic's accounting varies run to run at the cliff
    (the per-channel rank-4 MTF at tile 48 / W=8208 compiled at ~15.9M for
    dozens of runs, then flipped to a 19.06M hard OOM), so a borderline
    tile is a latent compile flake, not a perf win.

    The fallback (no candidate divides h) keeps the tall-tile preference:
    demote ONLY at the budget cliff. (Demoting the /4 halation-pyramid
    blur from its long-standing tile 48 to 32 at 1368x2052 flipped the
    whole fused 45MP chain to a Mosaic compile failure — tall tiles are
    both the fast AND the proven-lowerable configuration for these
    shapes; tests/test_pallas.py pins the chain's shapes.)
    """
    band_bytes = 4 * sum((chunk + 2 * (len(r_) // 2)) * chunk for r_ in v)

    def _vmem_est(t):
        # cur + out double-buffered, plus the two (rh, w) halo row bands
        # (the old full prev/next neighbor blocks cost 2*t*w*4*2 more).
        io = 2 * t * w * 4 * 2 + 2 * max(rh_max, 1) * w * 4 * 2
        cols = 4 * sum((t + 2 * rh_max) * t for _ in u)  # merged col stack
        scratch = 4 * (t + 2 * rh_max + len(u) * t) * (chunk + 2 * rw_max)
        return io + band_bytes + cols + scratch

    budget = 13_500_000
    return next(
        (t for t in (48, 40, 32) if h % t == 0 and _vmem_est(t) <= budget),
        next((t for t in (48, 40, 32, 24, 16) if _vmem_est(t) <= budget), 16),
    )


def fused_sep_rank_mxu(
    img: jnp.ndarray,
    u,
    v,
    tile_h: int | str = "auto",
    chunk: int = 512,
    interpret: bool = False,
    precision=None,
    grain: tuple | None = None,
    colmerge: bool = True,
) -> jnp.ndarray | None:
    """fused_sep_rank with the row conv on the MXU via banded matmuls.

    ``u``/``v`` are either rank lists [(k,), ...] shared across channels, or
    per-channel (C, R, k) arrays — per-channel kernels run in the SAME
    single pallas call, with the band stacks indexed by the channel grid
    axis (this is how the per-channel MTF runs as one launch).

    Requires W % chunk handling: a distinct band matrix serves the (possibly
    shorter) last chunk.

    ``grain``: optional (seed uint32[1], prm f32[6], sigma_px) — fuses the
    film-grain apply (ops.pallas_grain semantics) onto the conv output as an
    in-kernel epilogue. Returns None if the shape forces the XLA fallback
    (the caller then runs conv and grain separately).
    """
    c, h, w = img.shape
    if precision is not None and precision not in ("split", "dc"):
        # HIGHEST-precision matmuls hold multi-pass temps on the Mosaic
        # scoped-VMEM stack; narrower chunks keep them under the 16MB limit.
        chunk = min(chunk, 256)
    per_channel = np.asarray(u[0]).ndim == 2 or (
        hasattr(u, "ndim") and getattr(u, "ndim", 0) == 3
    )
    if per_channel:
        u3 = [[np.asarray(r_, np.float64).ravel() for r_ in uc] for uc in u]
        v3 = [[np.asarray(r_, np.float64).ravel() for r_ in vc] for vc in v]
        assert len(u3) == c
        u, v = u3[0], v3[0]  # rank/length structure (identical across c)
    else:
        u = [np.asarray(r_, np.float64).ravel() for r_ in u]
        v = [np.asarray(r_, np.float64).ravel() for r_ in v]
        u3, v3 = [u], [v]
    rh_max = max(len(r_) // 2 for r_ in u)
    rw_max = max(len(r_) // 2 for r_ in v)
    if tile_h == "auto":
        tile_h = _auto_tile(h, w, u, v, chunk, rh_max, rw_max)
    # The H halo must fit in one neighbor block: grow the tile for wide
    # kernels instead of silently falling back.
    th = min(max(tile_h, _round_up(rh_max, SUBLANE)), _round_up(h, SUBLANE))
    hp = _round_up(h, th)
    if rh_max > th or h <= 2 * th + 1 or hp - h + th >= h or w <= chunk:
        if grain is not None:
            return None  # caller falls back to conv + separate grain apply
        if per_channel:
            return jnp.concatenate(
                [
                    fused_sep_rank(
                        img[ci : ci + 1], u3[ci], v3[ci],
                        tile_h=tile_h, chunk=chunk, interpret=interpret,
                    )
                    for ci in range(c)
                ]
            )
        return fused_sep_rank(img, u, v, tile_h=tile_h, chunk=chunk,
                              interpret=interpret)
    if precision in ("split", "dc"):
        # The MXU rounds the band taps to bf16; rescale each tap vector so
        # its bf16 image preserves the exact DC gain. "dc" stops there
        # (kernel-shape perturbation ~0.2%, within the rank-truncation
        # contract; image-side rounding noise is ~5x below film grain);
        # "split" additionally runs the image operand through the MXU as
        # hi/lo halves (2 dots).
        def _dc(taps):
            import ml_dtypes

            t = np.asarray(taps, np.float64)
            tb = float(t.astype(ml_dtypes.bfloat16).astype(np.float64).sum())
            s = float(t.sum())
            if abs(tb) > 1e-3 * (np.abs(t).max() + 1e-30):
                return t * (s / tb)
            return t

        u3 = [[_dc(r_) for r_ in uc] for uc in u3]
        v3 = [[_dc(r_) for r_ in vc] for vc in v3]
        u, v = u3[0], v3[0]
    ranks = tuple(
        (
            tuple(float(t) for t in kv),
            tuple(float(t) for t in kh),
            len(kh) // 2,
        )
        for kv, kh in zip(u, v)
    )
    last_cw = w - (len(_chunks(w, chunk)) - 1) * chunk
    # Halo row bands instead of full prev/next neighbor blocks (see kernel
    # docstring). Pad-free mode when the grid tiles H exactly: the boundary
    # bands reflect in-kernel — no full-frame jnp.pad copy (~4ms at 45MP).
    rh = max(rh_max, 1)
    patch_edges = hp == h
    if patch_edges:
        x = img
        nh = h // th
        blocks = img.reshape(c, nh, th, w)
        # top[k] = last rh rows of block k; bot[k] = first rh rows of k+1.
        top_arr = blocks[:, : nh - 1, th - rh :, :]
        bot_arr = blocks[:, 1:, :rh, :]
        top_map = lambda i, j: (i, jnp.maximum(j - 1, 0), 0, 0)
        cur_map = lambda i, j: (i, j, 0)
        bot_map = lambda i, j: (i, jnp.minimum(j, nh - 2), 0, 0)
    else:
        x = jnp.pad(img, [(0, 0), (th, hp - h + th), (0, 0)], mode="reflect")
        nh = hp // th
        xb = x.reshape(c, nh + 2, th, w)
        top_arr = xb[:, :nh, th - rh :, :]
        bot_arr = xb[:, 2:, :rh, :]
        top_map = lambda i, j: (i, j, 0, 0)
        cur_map = lambda i, j: (i, j + 1, 0)
        bot_map = lambda i, j: (i, j, 0, 0)
    cb_count = len(u3)  # 1 (shared) or C (per-channel)

    def _stack(mats):  # (C_b, a, b) band stack + channel-indexed BlockSpec
        arr = np.stack(mats).astype(np.float32)
        spec = pl.BlockSpec(
            (1, *arr.shape[1:]),
            lambda i, j: (i if arr.shape[0] > 1 else 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        return jnp.asarray(arr), spec

    same_last = last_cw == chunk
    band_specs = []
    band_args = []
    widths = (chunk,) if same_last else (chunk, last_cw)
    for ri in range(len(u)):
        for cw_ in widths:
            mats = [
                _band_matrix(
                    v3[ci][ri], cw_ + 2 * (len(v3[ci][ri]) // 2), cw_
                )
                for ci in range(cb_count)
            ]
            arr, spec = _stack(mats)
            band_args.append(arr)
            band_specs.append(spec)
    col_specs = []
    col_args = []
    if colmerge and rh_max:
        # One (nr*th, th+2rh) stack per channel: smaller supports are
        # zero-padded to the shared rh window so every rank reads the same
        # win rows in the single merged dot.
        mats = []
        for ci in range(cb_count):
            cbs = []
            for ri in range(len(u)):
                kv = u3[ci][ri]
                rv = len(kv) // 2
                cb = _band_matrix(
                    tuple(float(t) for t in kv), th + 2 * rv, th
                ).T
                pad = rh_max - rv
                if pad:
                    cb = np.pad(cb, [(0, 0), (pad, pad)])
                cbs.append(cb)
            mats.append(
                np.ascontiguousarray(np.concatenate(cbs, axis=0), np.float32)
            )
        arr, spec = _stack(mats)
        col_args.append(arr)
        col_specs.append(spec)
    else:
        colmerge = False
        for ri in range(len(u)):
            mats = []
            for ci in range(cb_count):
                kv = u3[ci][ri]
                cb = _band_matrix(
                    tuple(float(t) for t in kv), th + 2 * (len(kv) // 2), th
                ).T
                mats.append(np.ascontiguousarray(cb, np.float32))
            arr, spec = _stack(mats)
            col_args.append(arr)
            col_specs.append(spec)
    band_specs += col_specs
    band_args += col_args
    grain_taps = None
    if grain is not None:
        from raw2film_tpu.ops.pallas_grain import grain_corr_taps, seed2

        seed_arr, prm_arr, sigma_px = grain
        seed_arr = seed2(seed_arr)  # [seed, global_row_offset] uint32 pair
        grain_taps = grain_corr_taps(float(sigma_px))
        band_specs += [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        band_args += [
            seed_arr,
            jnp.asarray(prm_arr, jnp.float32).reshape(6),
        ]
    out = pl.pallas_call(
        lambda t_ref, c_ref, b_ref, *rest: _fused_rank_mxu_kernel(
            t_ref, c_ref, b_ref, *rest,
            ranks=ranks, th=th, chunk=chunk, w=w, rh_max=rh_max,
            rw_max=rw_max, nh=nh, patch_edges=patch_edges, precision=precision,
            same_last=same_last, grain_taps=grain_taps, colmerge=colmerge,
        ),
        out_shape=jax.ShapeDtypeStruct((c, hp, w), img.dtype),
        grid=(c, nh),
        in_specs=[
            pl.BlockSpec((1, 1, rh, w), top_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w), cur_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rh, w), bot_map, memory_space=pltpu.VMEM),
            *band_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, th, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * rh_max, chunk + 2 * rw_max), img.dtype),
            pltpu.VMEM(
                ((len(ranks) * th) if colmerge else th, chunk + 2 * rw_max),
                img.dtype,
            ),
        ],
        interpret=interpret,
    )(top_arr, x, bot_arr, *band_args)
    return out[:, :h, :]
