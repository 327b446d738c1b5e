"""Print/encode tail as ONE streaming Pallas pass.

The chain's tail — print H&D development (or inversion/direct offsets), the
view matrix, shadow compensation, 10^-d linearization, display matrix +
white gain, saturation, transfer encode, and uint8 quantization — is pure
per-pixel math with three 3x3 channel mixes. The planes formulation leaves
it to XLA, which schedules it as several fused loops (~4-5 ms at 45MP);
the arithmetic is bandwidth-bound, so its floor is one read of the density
image + one uint8 write (~0.9 ms at 45MP on v5e).

This kernel performs the whole tail in a single pass over (3, tile_h, W)
blocks: all three channels of a row-band are resident in VMEM, so the 3x3
mixes are register-level mul-adds, and the uint8 image is the only thing
written back. All continuously-varying film parameters arrive in one SMEM
f32 vector (traced — slider changes never recompile); the branch structure
(print mode, shadow comp, saturation, gamma choice, quantization) is
static, mirroring RenderConfig.

Replaces the reference's lut_3d.wgsl + copy_to_int.wgsl passes (reference:
src/raw2film/gpu_processor.py:1843-1877) — but in closed form, not a LUT.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raw2film_tpu.ops import fastmath as fm

# SMEM parameter-vector layout (f32[60]):
#   [0:9]   A            print density->log-exposure matrix, row-major
#   [9:12]  log_e0       per-channel print exposure anchor
#   [12:15] prt d_min    \
#   [15:18] prt gamma     |
#   [18:21] prt x_toe     |  print H&D curve (film/chain.py PrintParams)
#   [21:24] prt x_sh      |
#   [24:27] prt w_toe     |
#   [27:30] prt w_sh     /
#   [30:33] d_offset     inversion/direct density offset
#   [33:42] V            view matrix, row-major
#   [42]    shadow_comp  [43] shadow_ref
#   [44:47] vd_offset
#   [47:56] to_display   row-major
#   [56:59] white_gain
#   [59]    sat
#   [60]    highlight_burn strength (used only with the burn epilogue)
PVEC_LEN = 61


def pack_print_vec(bundle: dict) -> jnp.ndarray:
    """Flatten the tail's bundle entries into the kernel's SMEM layout."""

    def flat(key, n):
        return jnp.reshape(bundle[key], (n,)).astype(jnp.float32)

    curve = bundle["prt_curve"]
    return jnp.concatenate(
        [
            flat("a", 9),
            flat("log_e0", 3),
        ]
        + [jnp.reshape(c, (3,)).astype(jnp.float32) for c in curve]
        + [
            flat("d_offset", 3),
            flat("v", 9),
            jnp.reshape(bundle["shadow_comp"], (1,)).astype(jnp.float32),
            jnp.reshape(bundle["shadow_ref"], (1,)).astype(jnp.float32),
            flat("vd_offset", 3),
            flat("to_display", 9),
            flat("white_gain", 3),
            jnp.reshape(bundle["sat"], (1,)).astype(jnp.float32),
            jnp.reshape(bundle["highlight_burn"], (1,)).astype(jnp.float32),
        ]
    )


# All transcendentals in exp2/log2 form: any jnp.power left in the kernel
# costs ~15% (benchmarks/tail_variants.py — 8.90 -> 7.74 ms at 45MP only
# when every pow/exp/log1p is rewritten; partial rewrites measure flat).
_softp = fm.softplus


def _kernel(
    d_ref, p_ref, *rest, mode, shadow, sat_neutral, gamma, quantize, burn
):
    if burn:
        small_ref, row_ref, col_ref, o_ref = rest
    else:
        (o_ref,) = rest
    P = lambda i: p_ref[i]
    dp = (d_ref[0], d_ref[1], d_ref[2])

    if burn:
        # Burn epilogue: bilinear-upsample the low-res blurred glow for this
        # row band on the MXU (rowmat_tile @ small @ colmat) and subtract —
        # the full-res glow never exists outside VMEM (ops/burn.py staged
        # path reference: down_up_blur + maximum).
        t = jnp.dot(
            row_ref[...], small_ref[...], preferred_element_type=jnp.float32
        )
        up = jnp.dot(t, col_ref[...], preferred_element_type=jnp.float32)
        hb = P(60)
        dp = tuple(
            jnp.maximum(q - hb * up, np.float32(0.0)) for q in dp
        )

    if mode == "print":
        d_pp = []
        for c in range(3):
            log_e = P(9 + c) - (
                P(3 * c) * dp[0] + P(3 * c + 1) * dp[1] + P(3 * c + 2) * dp[2]
            )
            d_pp.append(
                P(12 + c)
                + P(15 + c)
                * (
                    _softp(log_e - P(18 + c), P(24 + c))
                    - _softp(log_e - P(21 + c), P(27 + c))
                )
            )
    else:
        d_pp = [dp[c] - P(30 + c) for c in range(3)]

    vd = [
        P(33 + 3 * c) * d_pp[0]
        + P(33 + 3 * c + 1) * d_pp[1]
        + P(33 + 3 * c + 2) * d_pp[2]
        for c in range(3)
    ]
    if shadow:
        vd = [
            q - P(42) * _softp(q - P(43), np.float32(0.35)) for q in vd
        ]
    lin = [fm.pow10(-(vd[c] + P(44 + c))) for c in range(3)]
    rgb = [
        (
            P(47 + 3 * c) * lin[0]
            + P(47 + 3 * c + 1) * lin[1]
            + P(47 + 3 * c + 2) * lin[2]
        )
        * P(56 + c)
        for c in range(3)
    ]
    if not sat_neutral:
        luma = (
            np.float32(0.2126) * rgb[0]
            + np.float32(0.7152) * rgb[1]
            + np.float32(0.0722) * rgb[2]
        )
        rgb = [luma + P(59) * (q - luma) for q in rgb]
    for c in range(3):
        q = fm.encode(rgb[c], gamma)
        if quantize:
            # Mosaic has no f32->u8 cast; round through i32 (exact for 0..255).
            q = jnp.round(q * np.float32(255.0)).astype(jnp.int32).astype(
                jnp.uint8
            )
        o_ref[c] = q


def print_encode_pallas(
    d: jnp.ndarray,
    pvec: jnp.ndarray,
    mode: str,
    shadow: bool,
    sat_neutral: bool,
    gamma: str,
    quantize: bool = True,
    tile_h: int | str = "auto",
    interpret: bool = False,
    burn: tuple | None = None,
    vmem_budget: int = 12_500_000,
) -> jnp.ndarray | None:
    """(3, H, W) density -> encoded (3, H, W) uint8 (or float when
    ``quantize`` is False) in one Pallas pass. Returns None when the shape
    can't be served (caller falls back to the XLA planes tail): uint8 output
    blocks need a 32-row sublane tile, float a 8-row one.

    ``burn``: optional (small, rowmat, colmat) from ops.burn.burn_smallmap —
    runs the highlight-burn upsample + subtract as a kernel prologue
    (strength = pvec[60]).
    """
    c, h, w = d.shape
    if c != 3 or w < 256:
        return None
    ths = (32, 64) if quantize else (32, 48, 40, 64, 16, 8)
    if tile_h == "auto":
        th = next((t for t in ths if h % t == 0), None)
    else:
        th = tile_h if h % tile_h == 0 else None
    if th is None:
        return None
    burn_bytes = 0
    if burn is not None:
        small, rowmat, colmat = burn
        hs, ws = small.shape[-2:]
        if rowmat.shape != (h, hs) or colmat.shape != (ws, w):
            return None
        burn_bytes = (hs * ws + 2 * th * hs + ws * w + th * w) * 4
    # VMEM budget (double-buffered in + out): keep >=3MB headroom.
    if (
        (3 * th * w * 4) * 2
        + (3 * th * w * (1 if quantize else 4)) * 2
        + burn_bytes
        > vmem_budget
    ):
        return None
    out_dtype = jnp.uint8 if quantize else d.dtype
    burn_args, burn_specs = (), []
    if burn is not None:
        small, rowmat, colmat = burn
        burn_args = (
            jnp.reshape(small, (hs, ws)).astype(jnp.float32),
            rowmat,
            colmat,
        )
        burn_specs = [
            pl.BlockSpec((hs, ws), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, hs), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ws, w), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ]
    return pl.pallas_call(
        lambda dr, pr, *rest: _kernel(
            dr,
            pr,
            *rest,
            mode=mode,
            shadow=shadow,
            sat_neutral=sat_neutral,
            gamma=gamma,
            quantize=quantize,
            burn=burn is not None,
        ),
        out_shape=jax.ShapeDtypeStruct((3, h, w), out_dtype),
        grid=(h // th,),
        in_specs=[
            pl.BlockSpec((3, th, w), lambda j: (0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *burn_specs,
        ],
        out_specs=pl.BlockSpec(
            (3, th, w), lambda j: (0, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(d, jnp.reshape(pvec, (PVEC_LEN,)).astype(jnp.float32), *burn_args)
