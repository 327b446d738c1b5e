"""Halation mega-kernel: fused rank conv + pyramid upsample + combine.

The halation stage is the chain's dominant cost (~17.7 ms of ~40 at 45MP
before this kernel). Its separate-kernel structure (full-res fused ranks,
/4 pyramid blur, full-res bilinear upsample, XLA combine) pays ~1.6 GB of
avoidable HBM traffic: the upsampled glow is materialized at full resolution
just to be added once, and the combine re-reads the exposure image and both
blur terms.

This kernel runs the full-res separable ranks exactly like
ops.pallas_conv2.fused_sep_rank_mxu (row conv as banded matmuls on the MXU,
H halos from clamped neighbor blocks, in-kernel reflect at the frame edges)
and then, per W-chunk while the block is still in VMEM:

  * horizontally upsamples the /4 pyramid blur (delivered ROW-pre-upsampled
    at w/4 width by ops.pallas_pyramid.bilinear_upsample_rows_pallas, so the
    block needs no neighbor rows and the tile height stays at the
    MXU-efficient 48) with half-pixel lerp matrices on the MXU,
  * adds it to the rank accumulator,
  * applies the halation combine (img + f_c * blur) / (1 + f_c) with traced
    per-channel factors from SMEM.

The output IS the halation-combined exposure image — the full-res glow never
touches HBM and the downstream develop section reads one array instead of
three.

Replaces the ping-pong pass structure of the reference GPU engine
(reference: src/raw2film/gpu_processor.py:1757-1877, convolution.wgsl).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raw2film_tpu.ops import fastmath as fm
from raw2film_tpu.ops.pallas_conv2 import _band_matrix, _chunks
from raw2film_tpu.ops.pallas_pyramid import _lerp_matrix

SUBLANE = 8
PYR_F = 4  # pyramid decimation factor served by the fused upsample


def _mega_kernel(
    top_ref, cur_ref, bot_ref, sm_ref, *rest,
    ranks, th, chunk, w, rh_max, rw_max, nh, same_last, develop=False,
    colmerge=False,
):
    """Grid (C, nh). Blocks: ep (1, th, w) current band + (1, 1, rh, w) halo
    row bands (gathered host-side — the full neighbor blocks would triple the
    HBM read traffic and cap tile_h at 48); pyramid blur (1, th, w4)
    row-aligned; band/col matrices; horizontal lerp matrices; fac SMEM
    f32[C]; [dev SMEM f32[19] when develop]; out (1, th, w); scratch win,
    tmp. ``colmerge``: all ranks' column convs run as ONE (nr*th, .) matmul
    (better MXU row utilization than nr dots at M=th)."""
    nr = len(ranks)
    bands_per_rank = 1 if same_last else 2
    band_refs = rest[: bands_per_rank * nr]
    n_cb = 1 if colmerge else nr
    colband_refs = rest[bands_per_rank * nr : bands_per_rank * nr + n_cb]
    uwf_ref = rest[bands_per_rank * nr + n_cb]
    uwm_ref = rest[bands_per_rank * nr + n_cb + 1]
    uwl_ref = rest[bands_per_rank * nr + n_cb + 2]
    fac_ref = rest[bands_per_rank * nr + n_cb + 3]
    dev_ref = rest[bands_per_rank * nr + n_cb + 4] if develop else None
    o_ref, win, tmp = rest[-3], rest[-2], rest[-1]

    j = pl.program_id(1)
    pieces = _chunks(w, chunk)
    n_chunks = len(pieces)
    f = fac_ref[pl.program_id(0)]
    inv = np.float32(1.0) / (np.float32(1.0) + f)

    for ci, (c0, cw) in enumerate(pieces):
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
        if rh_max:
            # First/last band: halo rows reflect the band itself (the clamped
            # halo index map delivered the wrong rows).
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

        # ---- separable ranks: col conv on MXU, row conv as banded matmul.
        if colmerge:
            # One (nr*th, th+2rh) @ (th+2rh, ew) dot for every rank at once.
            tmp[:, 0:ew_max] = jnp.dot(
                colband_refs[0][0],
                win[0 : th + 2 * rh_max, 0:ew_max],
                preferred_element_type=jnp.float32,
            )
        for ri, (tv, thaps, rw) in enumerate(ranks):
            rv = len(tv) // 2
            ew = cw + 2 * rw
            coff = rw_max - rw
            if colmerge:
                t_in = tmp[ri * th : (ri + 1) * th, coff : coff + ew]
            else:
                tmp[:, 0:ew] = jnp.dot(
                    colband_refs[ri][0],
                    win[rh_max - rv : rh_max + th + rv, coff : coff + ew],
                    preferred_element_type=jnp.float32,
                )
                t_in = tmp[:, 0:ew]
            band_ref = band_refs[
                bands_per_rank * ri
                + (1 if (not same_last and ci == n_chunks - 1) else 0)
            ]
            res = jnp.dot(
                t_in, band_ref[0], preferred_element_type=jnp.float32
            )
            if ri == 0:
                o_ref[0, :, c0 : c0 + cw] = res
            else:
                o_ref[0, :, c0 : c0 + cw] = o_ref[0, :, c0 : c0 + cw] + res

        # ---- pyramid horizontal upsample for this chunk (rows already
        # upsampled; half-pixel lerp columns on the MXU, edge clamp in the
        # first/last chunk matrices).
        cs = cw // PYR_F
        if ci == 0:
            uw, lo4, n_in = uwf_ref, 0, cs + 1
        elif ci == n_chunks - 1:
            uw, lo4, n_in = uwl_ref, c0 // PYR_F - 1, cs + 1
        else:
            uw, lo4, n_in = uwm_ref, c0 // PYR_F - 1, cs + 2
        up = jnp.dot(
            sm_ref[0, :, lo4 : lo4 + n_in],
            uw[0:n_in, 0:cw],
            preferred_element_type=jnp.float32,
        )

        # ---- combine: (img + f * blur) / (1 + f), blur = ranks + pyramid.
        blur = o_ref[0, :, c0 : c0 + cw] + up
        img = win[rh_max : rh_max + th, rw_max : rw_max + cw]
        combined = (img + f * blur) * inv
        if develop:
            # Develop epilogue (identity-masking fast path): log exposure ->
            # per-channel H&D density, so the exposure image never returns
            # to HBM. dev SMEM layout: [flare, dmin*3, gamma*3, x_toe*3,
            # x_shoulder*3, w_toe*3, w_shoulder*3].
            ch = pl.program_id(0)
            flare = dev_ref[0]
            dmin = dev_ref[1 + ch]
            gam = dev_ref[4 + ch]
            x_t = dev_ref[7 + ch]
            x_s = dev_ref[10 + ch]
            w_t = dev_ref[13 + ch]
            w_s = dev_ref[16 + ch]
            # exp2/log2 forms: see ops/fastmath.py (any jnp.power/exp/log1p
            # left in a kernel measures ~15% slower on v5e).
            x = fm.log10(jnp.maximum(combined + flare, np.float32(1e-6)))
            combined = dmin + gam * (
                fm.softplus(x - x_t, w_t) - fm.softplus(x - x_s, w_s)
            )
        o_ref[0, :, c0 : c0 + cw] = combined


def _mega_vmem_ok(th, w, chunk, nr, rh, rw, budget=18_100_000):
    """Scoped-VMEM estimate for a (th, chunk) mega-kernel configuration.

    The model assumes double-buffering of the grid-mapped arrays (current
    band, halo bands, pyramid rows, output) plus single-buffered constant
    band matrices and scratch. It overcounts relative to Mosaic's actual
    accounting: measured on a v5e at 45MP, (96, 256) compiles and is the
    fastest variant at an 18.0M model estimate while (96, 512) ~22.4M and
    (144, 256) ~25M hard-fail — so the default budget is calibrated to
    18.1M, just above the measured-good point. The conservative budget
    (13M, see halation_mega) reproduces the old always-safe (48, 256)
    choice; the Processor's downgrade ladder falls back to it if Mosaic's
    margin accounting flips on a given day."""
    ew = chunk + 2 * rw
    cur = th * w * 4 * 2
    halos = 2 * max(rh, 1) * w * 4 * 2
    sru = th * (w // PYR_F) * 4 * 2
    out = th * w * 4 * 2
    bands = nr * ew * chunk * 4
    colband = nr * th * (th + 2 * rh) * 4
    lerp = 3 * (chunk // PYR_F + 2) * chunk * 4
    win = (th + 2 * rh) * ew * 4
    tmp = nr * th * ew * 4
    return cur + halos + sru + out + bands + colband + lerp + win + tmp <= budget


def halation_mega(
    img: jnp.ndarray,
    u,
    v,
    small_rows_up: jnp.ndarray,
    factors: jnp.ndarray,
    tile_h: int | str = "auto",
    chunk: int | str = "auto",
    interpret: bool = False,
    develop: jnp.ndarray | None = None,
    colmerge: bool = True,
    conservative: bool = False,
) -> jnp.ndarray | None:
    """(C, H, W) exposure + (C, H, W/4) row-upsampled pyramid blur ->
    halation-combined exposure, in one pallas pass. ``u``/``v``: shared
    full-res rank lists; ``factors``: traced (C,) per-channel color factors.

    ``develop``: optional traced f32[19] H&D parameter vector
    [flare, dmin*3, gamma*3, x_toe*3, x_shoulder*3, w_toe*3, w_shoulder*3];
    when given, the kernel also develops the combined exposure to density
    in-register (valid only for identity color masking — the default
    color_masking=1.0 — where development is per-channel).

    H halos travel as (C, nh-1, rh, W) row bands gathered host-side (one
    cheap XLA slice) instead of full prev/next neighbor blocks: the block
    form read every band three times (~1.1 GB of extra HBM at 45MP) and its
    VMEM footprint capped tile_h at 48 rows, starving the MXU (M=48 of 128).
    ``chunk`` "auto" picks 256: the row-conv band matmul's zero fraction
    (support 2*rw+1 of chunk+2*rw columns) dominates the kernel's FLOPs, and
    256 measured fastest across tile sizes at 45MP (see BENCHMARKS.md).
    ``conservative``: choose tiles under the proven-safe 13M VMEM budget
    (tile 48 at 45MP) instead of the measured-fastest 18.1M one (tile 96,
    11.2 vs 14.3 ms) — the Processor's first downgrade rung when Mosaic's
    margin accounting rejects the large tile. The 18.1M default sits 0.1M
    under a measured compile at the margin, so it assumes a ladder-equipped
    caller (Processor/bench) that catches a VMEM compile failure and
    retries; direct callers without a retry path should pass
    ``conservative=True``.

    Returns None when the shape can't be served (caller falls back to the
    separate-kernel path): needs H % tile == 0 with 4 | W, W > 2*chunk, and
    every W-chunk a multiple of 4.
    """
    c, h, w = img.shape
    u = [np.asarray(r_, np.float64).ravel() for r_ in u]
    v = [np.asarray(r_, np.float64).ravel() for r_ in v]
    rh_max = max(len(r_) // 2 for r_ in u)
    rw_max = max(len(r_) // 2 for r_ in v)
    if chunk == "auto":
        chunk = 256
    if tile_h == "auto":
        budget = 13_000_000 if conservative else 18_100_000
        tile_h = next(
            (
                t
                for t in (96, 88, 80, 72, 64, 56, 48, 40, 32)
                if h % t == 0
                and h > 2 * t
                and _mega_vmem_ok(t, w, chunk, len(u), rh_max, rw_max, budget)
            ),
            next((t for t in (48, 40, 32) if h % t == 0), 48),
        )
    th = tile_h
    w4 = w // PYR_F
    last_cw = w - (len(_chunks(w, chunk)) - 1) * chunk
    if (
        h % th != 0
        or w % PYR_F != 0
        or th % SUBLANE != 0
        or w <= 2 * chunk
        or chunk % PYR_F != 0
        or last_cw % PYR_F != 0
        or rh_max > th
        or h <= 2 * th
        or small_rows_up.shape != (c, h, w4)
    ):
        return None
    nh = h // th
    ranks = tuple(
        (
            tuple(float(t) for t in kv),
            tuple(float(t) for t in kh),
            len(kh) // 2,
        )
        for kv, kh in zip(u, v)
    )
    same_last = last_cw == chunk

    const = lambda arr: pl.BlockSpec(
        (1, *arr.shape[1:]), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM
    )

    band_args, band_specs = [], []
    widths = (chunk,) if same_last else (chunk, last_cw)
    for ri in range(len(u)):
        for cw_ in widths:
            arr = _band_matrix(v[ri], cw_ + 2 * (len(v[ri]) // 2), cw_)[None]
            band_args.append(jnp.asarray(arr))
            band_specs.append(const(arr))
    if colmerge and rh_max:
        # Stack every rank's column-conv band into one (nr*th, th+2rh)
        # matrix (smaller supports zero-padded to the shared rh window).
        cbs = []
        for ri in range(len(u)):
            rv = len(u[ri]) // 2
            cb = _band_matrix(
                tuple(float(t) for t in u[ri]), th + 2 * rv, th
            ).T
            pad = rh_max - rv
            if pad:
                cb = np.pad(cb, [(0, 0), (pad, pad)])
            cbs.append(cb)
        arr = np.ascontiguousarray(np.concatenate(cbs, axis=0), np.float32)[None]
        band_args.append(jnp.asarray(arr))
        band_specs.append(const(arr))
    else:
        colmerge = False
        for ri in range(len(u)):
            cb = _band_matrix(
                tuple(float(t) for t in u[ri]), th + 2 * (len(u[ri]) // 2), th
            ).T[None]
            arr = np.ascontiguousarray(cb, np.float32)
            band_args.append(jnp.asarray(arr))
            band_specs.append(const(arr))

    # Horizontal lerp matrices (pallas_pyramid banded-chunk convention).
    uwf = _lerp_matrix(chunk, PYR_F, clamp_lo=True, clamp_hi=False)
    uwm = _lerp_matrix(chunk, PYR_F, clamp_lo=False, clamp_hi=False)
    uwl = _lerp_matrix(last_cw, PYR_F, clamp_lo=False, clamp_hi=True)
    if uwl.shape[1] < chunk:
        uwl = np.pad(uwl, [(0, 0), (0, chunk - uwl.shape[1])])
    if uwl.shape[0] < uwm.shape[0]:
        uwl = np.pad(uwl, [(0, uwm.shape[0] - uwl.shape[0]), (0, 0)])
    if uwf.shape[0] < uwm.shape[0]:
        uwf = np.pad(uwf, [(0, uwm.shape[0] - uwf.shape[0]), (0, 0)])
    const2 = lambda arr: pl.BlockSpec(
        arr.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    for m in (uwf, uwm, uwl):
        band_args.append(jnp.asarray(m, jnp.float32))
        band_specs.append(const2(m))
    band_args.append(jnp.asarray(factors, jnp.float32).reshape(c))
    band_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    if develop is not None:
        band_args.append(jnp.asarray(develop, jnp.float32).reshape(19))
        band_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    # Halo row bands: top[k] = last rh rows of block k, bot[k] = first rh
    # rows of block k+1 (one XLA slice each; j==0 / j==nh-1 read garbage via
    # the clamped index map and overwrite it with the in-kernel reflection).
    blocks = img.reshape(c, nh, th, w)
    rh = max(rh_max, 1)
    top_arr = blocks[:, : nh - 1, th - rh :, :]
    bot_arr = blocks[:, 1:, :rh, :]
    halo = lambda lo: pl.BlockSpec(
        (1, 1, rh, w),
        lambda i, j: (i, jnp.clip(j + lo, 0, nh - 2), 0, 0),
        memory_space=pltpu.VMEM,
    )

    out = pl.pallas_call(
        lambda t, cu, b, sm, *rest: _mega_kernel(
            t, cu, b, sm, *rest,
            ranks=ranks, th=th, chunk=chunk, w=w, rh_max=rh_max,
            rw_max=rw_max, nh=nh, same_last=same_last,
            develop=develop is not None, colmerge=colmerge,
        ),
        out_shape=jax.ShapeDtypeStruct((c, h, w), img.dtype),
        grid=(c, nh),
        in_specs=[
            halo(-1),
            pl.BlockSpec((1, th, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            halo(0),
            pl.BlockSpec((1, th, w4), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
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
    )(top_arr, img, bot_arr, small_rows_up, *band_args)
    return out
