"""Pallas pyramid resample kernels: box downsample + bilinear upsample.

The halation/burn glow pyramids need integer-factor box downsamples and
half-pixel bilinear upsamples at 45MP. XLA's `reduce_window` and
`jax.image.resize` cost ~20 ms each at that size (measured round 2 —
~30x off the bandwidth bound), so both are re-expressed here as banded
constant matmuls on the MXU inside Mosaic-pipelined row-band blocks, the
same scheme as ops/pallas_conv2.py:

    down:  out = Dh @ x @ Dw      Dh (th/f, th), Dw (cw, cw/f) averaging bands
    up:    out = Uh @ win @ Uw    Uh (th, th/f+2), Uw lerp bands

Boundary convention matches the XLA ops they replace: box downsample crops
to multiples of f (caller's contract), bilinear upsample uses half-pixel
centers with edge clamp (jax.image.resize "bilinear").

Replaces the reference's cv2.INTER_AREA / ndimage.zoom pyramid
(reference: src/raw2film/effects.py:360-390) on the TPU hot path.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _chunks(total: int, chunk: int):
    out = []
    c0 = 0
    while c0 < total:
        out.append((c0, min(chunk, total - c0)))
        c0 += chunk
    return out


# ------------------------------------------------------------------ down


def _down_kernel(x_ref, dh_ref, dwm_ref, dwl_ref, o_ref, *, f, chunk, w_in):
    pieces = _chunks(w_in, chunk)
    for ci, (c0, cw) in enumerate(pieces):
        dw = dwm_ref if cw == chunk else dwl_ref
        t = jnp.dot(
            dh_ref[...],
            x_ref[0, :, c0 : c0 + cw],
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, c0 // f : (c0 + cw) // f] = jnp.dot(
            t, dw[..., 0 : cw // f], preferred_element_type=jnp.float32
        )


VMEM_BLOCK_BUDGET = 6 << 20  # bytes per pipelined block


def box_downsample_pallas(
    img: jnp.ndarray, f: int, chunk: int = 512, interpret: bool = False
) -> jnp.ndarray:
    """(C, H, W) -> (C, H//f, W//f) block mean, any integer f (the burn glow
    uses f ~ min(H,W)/50, i.e. >100 at 45MP).

    Same semantics as ops.conv.box_downsample (crops the remainder).
    Tiling: round-4 v5e sweeps at f=4 / 45MP measured taller output tiles
    ~0.2-0.5 ms faster than the old (8, 512) (MXU row utilization), but
    ONLY when th_out divides h2 — a remainder makes the edge-pad below
    materialize a padded copy of the full-res input (~1.3 ms, wiping out
    the win); th_out 64 hard-fails the compile. Values are identical for
    any tiling (disjoint 0/1 bands, per-output contraction unchanged).
    """
    c, h, w = img.shape
    f = int(f)
    h2, w2 = h // f, w // f
    if w2 * f >= 4096:
        chunk = max(chunk, 1024)  # wide frames: fewer, fuller MXU chunks
    chunk = f * max(1, chunk // f)
    # Input row-band block is (th_out * f, w2 * f) f32. Mosaic requires the
    # sublane dim divisible by 8, so th_out * f must be too; grow th_out to
    # the largest measured-good tile whose block fits the VMEM budget, then
    # halve while it doesn't.
    th_out = max(SUBLANE, 32 // f)
    for cand in (32, 24, 16):
        # Taller tiles only when they divide h2: a remainder means the
        # edge-pad below MATERIALIZES a padded copy of the full-res input
        # (~1.3 ms at 45MP — measured wiping out the tile win in-chain).
        if (
            cand > th_out
            and h2 % cand == 0
            and cand * f % SUBLANE == 0
            and cand * f * w2 * f * 4 <= VMEM_BLOCK_BUDGET
        ):
            th_out = cand
            break
    while (
        th_out > 1
        and th_out % 2 == 0
        and (th_out // 2) * f % SUBLANE == 0
        and th_out * f * w2 * f * 4 > VMEM_BLOCK_BUDGET
    ):
        th_out //= 2
    th = th_out * f
    hp2 = _round_up(h2, th_out)
    hp = hp2 * f
    if (
        h2 < th_out
        or w2 * f < 2 * chunk
        or th % SUBLANE != 0
        or th * w2 * f * 4 > VMEM_BLOCK_BUDGET
    ):
        from raw2film_tpu.ops import conv as convops

        return convops.box_downsample(img, f)
    x = img[:, : h2 * f, : w2 * f]
    if hp != h2 * f:
        x = jnp.pad(x, [(0, 0), (0, hp - h2 * f), (0, 0)], mode="edge")
    w_in = w2 * f

    # 0/1 summing bands (bf16-exact on the MXU for ANY f — 1/f taps round at
    # 2^-9 for f not a power of two); the 1/f^2 mean scale applies after the
    # kernel on the small output.
    dh = np.zeros((th_out, th), np.float32)
    for i in range(th_out):
        dh[i, i * f : (i + 1) * f] = 1.0
    last_cw = w_in - (len(_chunks(w_in, chunk)) - 1) * chunk

    def wmat(cw):
        m = np.zeros((cw, chunk // f), np.float32)
        for j in range(cw // f):
            m[j * f : (j + 1) * f, j] = 1.0
        return m

    dwm, dwl = wmat(chunk), wmat(last_cw)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        lambda x_ref, dh_ref, dwm_ref, dwl_ref, o_ref: _down_kernel(
            x_ref, dh_ref, dwm_ref, dwl_ref, o_ref, f=f, chunk=chunk, w_in=w_in
        ),
        out_shape=jax.ShapeDtypeStruct((c, hp2, w2), img.dtype),
        grid=(c, hp2 // th_out),
        in_specs=[
            pl.BlockSpec((1, th, w_in), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            const(dh.shape),
            const(dwm.shape),
            const(dwl.shape),
        ],
        out_specs=pl.BlockSpec(
            (1, th_out, w2), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x, jnp.asarray(dh), jnp.asarray(dwm), jnp.asarray(dwl))
    return out[:, :h2, :] * np.float32(1.0 / (f * f))


# -------------------------------------------------------------------- up


def _half_size_kernel(x_ref, ar_ref, ab_ref, brm_ref, bbm_ref, o_ref, *, chunk, w_in):
    def _bf16_trunc(x):
        bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
        return jax.lax.bitcast_convert_type(
            bits & jnp.uint32(0xFFFF0000), jnp.float32
        )

    def mm(a, b):
        # Selection matrices are 0/1 (bf16-exact); the image side goes
        # through the MXU as hi/lo halves so the decode is exact to 1e-6
        # (the MXU default would round sensor values to bf16).
        hi = _bf16_trunc(b)
        return jnp.dot(a, hi, preferred_element_type=jnp.float32) + jnp.dot(
            a, b - hi, preferred_element_type=jnp.float32
        )

    def mm_r(a, b):  # image on the left
        hi = _bf16_trunc(a)
        return jnp.dot(hi, b, preferred_element_type=jnp.float32) + jnp.dot(
            a - hi, b, preferred_element_type=jnp.float32
        )

    pieces = _chunks(w_in, chunk)
    for c0, cw in pieces:
        # Selection matmuls: stride-2 polyphase sampling without strided
        # slices (a stride on the lane dim relayouts catastrophically —
        # measured 587ms for the whole decode at 45MP).
        xs = x_ref[0, :, c0 : c0 + cw]
        tr = mm(ar_ref[...], xs)
        tb = mm(ab_ref[...], xs)
        br = brm_ref[0:cw, 0 : cw // 2]
        bb = bbm_ref[0:cw, 0 : cw // 2]
        sl = slice(c0 // 2, (c0 + cw) // 2)
        o_ref[0, :, sl] = mm_r(tr, br)
        o_ref[1, :, sl] = 0.5 * (mm_r(tr, bb) + mm_r(tb, br))
        o_ref[2, :, sl] = mm_r(tb, bb)


def half_size_decode_pallas(
    bayer: jnp.ndarray,
    ry: int,
    rx: int,
    chunk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """(H, W) Bayer mosaic -> (3, H//2, W//2): each 2x2 cell one RGB pixel,
    greens averaged (LibRaw half_size semantics). Row/column polyphase
    selection runs as 0/1 banded matmuls on the MXU."""
    h, w = bayer.shape
    h2, w2 = h // 2, w // 2
    th_out = 16
    th = th_out * 2
    hp2 = _round_up(h2, th_out)
    if h2 < th_out or w2 * 2 < 2 * chunk:
        return None  # caller falls back to the XLA formulation
    x = bayer[None, : h2 * 2, : w2 * 2]
    if hp2 != h2:
        x = jnp.pad(x, [(0, 0), (0, (hp2 - h2) * 2), (0, 0)], mode="edge")
    w_in = w2 * 2

    def sel_rows(phase):
        m = np.zeros((th_out, th), np.float32)
        m[np.arange(th_out), 2 * np.arange(th_out) + phase] = 1.0
        return m

    def sel_cols(phase, cw):
        m = np.zeros((chunk, chunk // 2), np.float32)
        m[2 * np.arange(chunk // 2) + phase, np.arange(chunk // 2)] = 1.0
        return m

    ar, ab = sel_rows(ry), sel_rows(1 - ry)
    br, bb = sel_cols(rx, chunk), sel_cols(1 - rx, chunk)
    const = lambda shape: pl.BlockSpec(
        shape, lambda j: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        lambda x_ref, a, b, c, d, o_ref: _half_size_kernel(
            x_ref, a, b, c, d, o_ref, chunk=chunk, w_in=w_in
        ),
        out_shape=jax.ShapeDtypeStruct((3, hp2, w2), bayer.dtype),
        grid=(hp2 // th_out,),
        in_specs=[
            pl.BlockSpec((1, th, w_in), lambda j: (0, j, 0), memory_space=pltpu.VMEM),
            const(ar.shape),
            const(ab.shape),
            const(br.shape),
            const(bb.shape),
        ],
        out_specs=pl.BlockSpec(
            (3, th_out, w2), lambda j: (0, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x, jnp.asarray(ar), jnp.asarray(ab), jnp.asarray(br), jnp.asarray(bb))
    return out[:, :h2, :]


def _up_rows_kernel(prev_ref, cur_ref, next_ref, uh_ref, o_ref, *, th_in):
    win_rows = jnp.concatenate(
        [
            prev_ref[0, th_in - 1 : th_in, :],
            cur_ref[0, :, :],
            next_ref[0, 0:1, :],
        ],
        axis=0,
    )
    o_ref[0, :, :] = jnp.dot(
        uh_ref[...], win_rows, preferred_element_type=jnp.float32
    )


def bilinear_upsample_rows_pallas(
    img: jnp.ndarray,
    f: int,
    oh: int | None = None,
    tile_out: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """(C, h, w) -> (C, oh, w): half-pixel bilinear upsample of the ROW axis
    only (columns untouched), cropped to ``oh`` <= h*f. Feeds kernels that
    fuse the horizontal lerp in-kernel (ops/pallas_halation.py): the
    intermediate is w/f-wide, so materializing it costs 1/f of a full
    upsample."""
    c, hs, ws = img.shape
    f = int(f)
    oh = hs * f if oh is None else oh
    th = SUBLANE * f * max(1, tile_out // (SUBLANE * f))
    th_in = th // f
    if (
        hs <= 2 * th_in
        or oh > hs * f
        or hs % th_in != 0
        or th * ws * 4 > VMEM_BLOCK_BUDGET
    ):
        return jax.image.resize(img, (c, hs * f, ws), method="bilinear")[:, :oh, :]
    nh = hs // th_in
    # One edge-replicated block top and bottom: stored block j+1 holds input
    # band j, and edge replication IS the bilinear edge clamp.
    x = jnp.pad(img, [(0, 0), (th_in, th_in), (0, 0)], mode="edge")
    uh_t = np.ascontiguousarray(
        _lerp_matrix(th, f, clamp_lo=False, clamp_hi=False).T
    )
    out = pl.pallas_call(
        lambda p, cu, n, uh, o: _up_rows_kernel(p, cu, n, uh, o, th_in=th_in),
        out_shape=jax.ShapeDtypeStruct((c, hs * f, ws), img.dtype),
        grid=(c, nh),
        in_specs=[
            pl.BlockSpec((1, th_in, ws), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th_in, ws), lambda i, j: (i, j + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th_in, ws), lambda i, j: (i, j + 2, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(uh_t.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, ws), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x, x, x, jnp.asarray(uh_t))
    return out[:, :oh, :]


def _up_kernel(
    prev_ref, cur_ref, next_ref, uh_ref, uwf_ref, uwm_ref, uwl_ref,
    o_ref, win, *, f, th_in, chunk, w_out,
):
    # Window rows: last row of prev + cur + first row of next (an output row
    # at a block boundary interpolates across it in both directions).
    win[0:1, :] = prev_ref[0, th_in - 1 : th_in, :]
    win[1 : th_in + 1, :] = cur_ref[0, :, :]
    win[th_in + 1 : th_in + 2, :] = next_ref[0, 0:1, :]
    pieces = _chunks(w_out, chunk)
    for ci, (c0, cw) in enumerate(pieces):
        cs = cw // f
        if ci == 0:
            uw, lo, n_in = uwf_ref, 0, cs + 1
        elif ci == len(pieces) - 1:
            uw, lo, n_in = uwl_ref, c0 // f - 1, cs + 1
        else:
            uw, lo, n_in = uwm_ref, c0 // f - 1, cs + 2
        t = jnp.dot(
            uh_ref[...],
            win[:, lo : lo + n_in],
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, c0 : c0 + cw] = jnp.dot(
            t, uw[0:n_in, 0:cw], preferred_element_type=jnp.float32
        )


def _lerp_matrix(n_out: int, f: int, clamp_lo: bool, clamp_hi: bool) -> np.ndarray:
    """Half-pixel bilinear band matrix (n_in, n_out). The window starts one
    input sample before the chunk unless ``clamp_lo`` (window starts AT the
    chunk; sample -1 clamps to 0); ``clamp_hi`` folds the past-the-end sample
    into the last one (right/bottom edge)."""
    n_in = n_out // f + (1 if (clamp_lo or clamp_hi) else 2)
    m = np.zeros((n_in, n_out), np.float32)
    for o in range(n_out):
        rel = (o + 0.5) / f - 0.5  # in-sample coordinate rel. to chunk start
        base = int(np.floor(rel))
        frac = rel - base
        idx = base if clamp_lo else base + 1
        if clamp_lo and base < 0:
            idx, frac = 0, 0.0  # left/top clamp
        m[idx, o] += 1.0 - frac
        if frac > 0.0:
            m[min(idx + 1, n_in - 1), o] += frac
    return m


def bilinear_upsample_pallas(
    img: jnp.ndarray,
    f: int,
    out_hw: tuple[int, int] | None = None,
    tile_out: int = 32,
    chunk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """(C, h, w) -> (C, oh, ow) half-pixel bilinear upsample by integer
    factor f (any value), cropped to ``out_hw`` (<= (h*f, w*f)). Matches
    jax.image.resize(..., method="bilinear") for the f-times shape."""
    c, hs, ws = img.shape
    f = int(f)
    chunk = f * max(1, chunk // f)
    oh, ow = out_hw if out_hw is not None else (hs * f, ws * f)
    # Mosaic sublane divisibility: output bands (th) and input bands (th/f)
    # must both be multiples of 8, so th is a multiple of 8f. Large f makes
    # that blow the VMEM budget — those cases (the burn glow) use the
    # selection-matmul formulation in ops.conv instead.
    th = SUBLANE * f * max(1, tile_out // (SUBLANE * f))
    th_in = th // f
    w_out = ws * f
    if (
        hs <= 2 * th_in
        or w_out < 3 * chunk
        or oh > hs * f
        or ow > w_out
        or th * w_out * 4 > VMEM_BLOCK_BUDGET
    ):
        return jax.image.resize(img, (c, oh, ow), method="bilinear")
    hp_in = _round_up(hs, th_in)
    # One extra edge-replicated block on top and bottom: stored block j+1
    # holds input band j, and edge replication IS the bilinear edge clamp.
    x = jnp.pad(img, [(0, 0), (th_in, hp_in - hs + th_in), (0, 0)], mode="edge")
    nh = hp_in // th_in

    uh = _lerp_matrix(th, f, clamp_lo=False, clamp_hi=False)  # (th_in+2, th)
    uwf = _lerp_matrix(chunk, f, clamp_lo=True, clamp_hi=False)
    uwm = _lerp_matrix(chunk, f, clamp_lo=False, clamp_hi=False)
    last_cw = w_out - (len(_chunks(w_out, chunk)) - 1) * chunk
    uwl = _lerp_matrix(last_cw, f, clamp_lo=False, clamp_hi=True)
    # Pad ragged matrices to fixed specs (kernel slices the live region).
    if uwl.shape[1] < chunk:
        uwl = np.pad(uwl, [(0, 0), (0, chunk - uwl.shape[1])])
    if uwl.shape[0] < uwm.shape[0]:
        uwl = np.pad(uwl, [(0, uwm.shape[0] - uwl.shape[0]), (0, 0)])
    if uwf.shape[0] < uwm.shape[0]:
        uwf = np.pad(uwf, [(0, uwm.shape[0] - uwf.shape[0]), (0, 0)])
    const = lambda shape: pl.BlockSpec(
        shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )

    def band(idx_off):
        return pl.BlockSpec(
            (1, th_in, ws),
            lambda i, j, _o=idx_off: (i, j + _o, 0),
            memory_space=pltpu.VMEM,
        )

    # uh.T is (th_in+2, th); we need Uh (th, th_in+2) on the left.
    uh_t = np.ascontiguousarray(uh.T)
    out = pl.pallas_call(
        lambda p_ref, c_ref, n_ref, uh_ref, uwf_ref, uwm_ref, uwl_ref, o_ref, win: _up_kernel(
            p_ref, c_ref, n_ref, uh_ref, uwf_ref, uwm_ref, uwl_ref, o_ref, win,
            f=f, th_in=th_in, chunk=chunk, w_out=w_out,
        ),
        out_shape=jax.ShapeDtypeStruct((c, nh * th, w_out), img.dtype),
        grid=(c, nh),
        in_specs=[
            band(0),
            band(1),
            band(2),
            const(uh_t.shape),
            const(uwf.shape),
            const(uwm.shape),
            const(uwl.shape),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w_out), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((th_in + 2, ws), img.dtype)],
        interpret=interpret,
    )(x, x, x, jnp.asarray(uh_t), jnp.asarray(uwf), jnp.asarray(uwm), jnp.asarray(uwl))
    if (nh * th, w_out) == (oh, ow):
        return out
    return out[:, :oh, :ow]
