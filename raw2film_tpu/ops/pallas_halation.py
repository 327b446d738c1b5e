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

from raw2film_tpu.ops.pallas_conv2 import _band_matrix, _chunks
from raw2film_tpu.ops.pallas_pyramid import _lerp_matrix

SUBLANE = 8
PYR_F = 4  # pyramid decimation factor served by the fused upsample


def _mega_kernel(
    prev_ref, cur_ref, next_ref, sm_ref, *rest,
    ranks, th, chunk, w, rh_max, rw_max, nh, same_last, develop=False,
):
    """Grid (C, nh). Blocks: ep (1, th, w) x3 neighbors; pyramid blur
    (1, th, w4) row-aligned; band/col matrices; horizontal lerp matrices;
    fac SMEM f32[C]; [dev SMEM f32[19] when develop]; out (1, th, w);
    scratch win, tmp."""
    nr = len(ranks)
    bands_per_rank = 1 if same_last else 2
    band_refs = rest[: bands_per_rank * nr]
    colband_refs = rest[bands_per_rank * nr : (bands_per_rank + 1) * nr]
    uwf_ref = rest[(bands_per_rank + 1) * nr]
    uwm_ref = rest[(bands_per_rank + 1) * nr + 1]
    uwl_ref = rest[(bands_per_rank + 1) * nr + 2]
    fac_ref = rest[(bands_per_rank + 1) * nr + 3]
    dev_ref = rest[(bands_per_rank + 1) * nr + 4] if develop else None
    o_ref, win, tmp = rest[-3], rest[-2], rest[-1]

    j = pl.program_id(1)
    pieces = _chunks(w, chunk)
    n_chunks = len(pieces)
    f = fac_ref[pl.program_id(0)]
    inv = np.float32(1.0) / (np.float32(1.0) + f)

    for ci, (c0, cw) in enumerate(pieces):
        ew_max = cw + 2 * rw_max

        def fill(dst_rows, src_ref, src_rows):
            # Columns [c0-rw_max, c0+cw+rw_max) with reflect-101 at 0 and w.
            lo = c0 - rw_max
            hi = c0 + cw + rw_max
            if lo >= 0 and hi <= w:
                win[dst_rows, 0:ew_max] = src_ref[0, src_rows, lo:hi]
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

        if rh_max:
            fill(slice(0, rh_max), prev_ref, slice(th - rh_max, th))
        fill(slice(rh_max, rh_max + th), cur_ref, slice(0, th))
        if rh_max:
            fill(
                slice(rh_max + th, rh_max + th + rh_max), next_ref, slice(0, rh_max)
            )
        if rh_max:
            # First/last band: halo rows reflect the band itself (the clamped
            # neighbor index map delivered the wrong block).
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
        for ri, (tv, thaps, rw) in enumerate(ranks):
            rv = len(tv) // 2
            ew = cw + 2 * rw
            coff = rw_max - rw
            tmp[:, 0:ew] = jnp.dot(
                colband_refs[ri][0],
                win[rh_max - rv : rh_max + th + rv, coff : coff + ew],
                preferred_element_type=jnp.float32,
            )
            band_ref = band_refs[
                bands_per_rank * ri
                + (1 if (not same_last and ci == n_chunks - 1) else 0)
            ]
            res = jnp.dot(
                tmp[:, 0:ew], band_ref[0], preferred_element_type=jnp.float32
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
            x = jnp.log(
                jnp.maximum(combined + flare, np.float32(1e-6))
            ) * np.float32(1.0 / np.log(10.0))

            def softp(u, wdt):
                t = u * (np.float32(1.0) / wdt)
                return wdt * (
                    jnp.maximum(t, np.float32(0.0))
                    + jnp.log1p(jnp.exp(-jnp.abs(t)))
                )

            combined = dmin + gam * (softp(x - x_t, w_t) - softp(x - x_s, w_s))
        o_ref[0, :, c0 : c0 + cw] = combined


def halation_mega(
    img: jnp.ndarray,
    u,
    v,
    small_rows_up: jnp.ndarray,
    factors: jnp.ndarray,
    tile_h: int | str = "auto",
    chunk: int = 512,
    interpret: bool = False,
    develop: jnp.ndarray | None = None,
) -> jnp.ndarray | None:
    """(C, H, W) exposure + (C, H, W/4) row-upsampled pyramid blur ->
    halation-combined exposure, in one pallas pass. ``u``/``v``: shared
    full-res rank lists; ``factors``: traced (C,) per-channel color factors.

    ``develop``: optional traced f32[19] H&D parameter vector
    [flare, dmin*3, gamma*3, x_toe*3, x_shoulder*3, w_toe*3, w_shoulder*3];
    when given, the kernel also develops the combined exposure to density
    in-register (valid only for identity color masking — the default
    color_masking=1.0 — where development is per-channel).

    Returns None when the shape can't be served (caller falls back to the
    separate-kernel path): needs H % tile == 0 with 4 | W, W > 2*chunk, and
    every W-chunk a multiple of 4.
    """
    c, h, w = img.shape
    u = [np.asarray(r_, np.float64).ravel() for r_ in u]
    v = [np.asarray(r_, np.float64).ravel() for r_ in v]
    rh_max = max(len(r_) // 2 for r_ in u)
    rw_max = max(len(r_) // 2 for r_ in v)
    if tile_h == "auto":
        tile_h = next((t for t in (48, 40, 32) if h % t == 0), 48)
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

    clamp = lambda lo: (lambda i, j: (i, jnp.clip(j + lo, 0, nh - 1), 0))
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

    out = pl.pallas_call(
        lambda p, cu, n, sm, *rest: _mega_kernel(
            p, cu, n, sm, *rest,
            ranks=ranks, th=th, chunk=chunk, w=w, rh_max=rh_max,
            rw_max=rw_max, nh=nh, same_last=same_last,
            develop=develop is not None,
        ),
        out_shape=jax.ShapeDtypeStruct((c, h, w), img.dtype),
        grid=(c, nh),
        in_specs=[
            pl.BlockSpec((1, th, w), clamp(-1), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w), clamp(0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w), clamp(1), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w4), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
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
    )(img, img, img, small_rows_up, *band_args)
    return out
