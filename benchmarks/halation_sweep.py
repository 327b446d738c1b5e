"""On-chip sweep of halation mega-kernel tiling knobs at 45MP.

The row-conv banded matmul at chunk=512 is ~95% zero-FLOPs (support 27 of
ew 538); smaller chunks trade fill overhead for fewer zero MACs. Variants
run back-to-back in one process (axon tunnel timing protocol: compile,
warm, FIFO batch).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raw2film_tpu.ops import halation as hal_ops
from raw2film_tpu.ops import pallas_halation, pallas_pyramid

H, W = 5472, 8208
SCALE = 228.0
ITERS = 6


def timed(run, *args):
    out = run(*args)
    float(jax.device_get(jnp.sum(out[:, ::512, ::512])))  # compile
    float(jax.device_get(jnp.sum(run(*args)[:, ::512, ::512])))  # warm
    t0 = time.perf_counter()
    float(jax.device_get(jnp.sum(run(*args)[:, ::512, ::512])))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [run(*args) for _ in range(ITERS)]
    float(jax.device_get(jnp.sum(outs[-1][:, ::512, ::512])))
    t_many = time.perf_counter() - t0
    return max((t_many - t_one) / (ITERS - 1), 1e-6)


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(
        np.clip(
            np.abs(rng.normal(0.35, 0.2, (1, W))).astype(np.float32)
            * np.abs(rng.normal(1.0, 0.3, (H, 1))).astype(np.float32),
            0.0,
            1.0,
        )
    )
    img = jnp.stack([img, img * 0.8, img * 0.6])
    factors = jnp.asarray([0.3, 0.09, 0.0], jnp.float32)
    dev = jnp.asarray(np.linspace(0.1, 1.4, 19), jnp.float32)

    size = SCALE / 4.0
    us, vs, by_factor = hal_ops._full_res_ranks(size)
    assert list(by_factor) == [4]

    @jax.jit
    def small_up(img):
        sb = hal_ops._pyramid_small_blur(img, 4, by_factor[4])
        return pallas_pyramid.bilinear_upsample_rows_pallas(sb, 4, oh=H)

    sru = jax.block_until_ready(small_up(img))

    ref = None
    variants = [
        (48, 512, False),  # old configuration (halo side-inputs now)
        (48, 512, True),
        (48, 256, True),
        (48, 128, True),
        (72, 256, True),
        (72, 128, True),
        (72, 256, False),
    ]
    if len(sys.argv) > 1:  # e.g. "48:256:1,72:256:1" to trim tunnel time
        variants = [
            (int(t), int(c), bool(int(m)))
            for t, c, m in (s.split(":") for s in sys.argv[1].split(","))
        ]
    for tile_h, chunk, merge in variants:
        from functools import partial

        @partial(jax.jit, static_argnames=("tile_h", "chunk", "merge"))
        def f(img, sru, tile_h=tile_h, chunk=chunk, merge=merge):
            return pallas_halation.halation_mega(
                img, list(us), list(vs), sru, factors,
                tile_h=tile_h, chunk=chunk, develop=dev, colmerge=merge,
            )

        def run(img, sru, f=f):
            return f(img, sru)

        try:
            t = timed(run, img, sru)
        except Exception as e:
            print(f"th={tile_h} chunk={chunk:5d} merge={int(merge)} FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        out = np.asarray(jax.device_get(run(img, sru)))
        if ref is None:
            ref = out
            err = 0.0
        else:
            err = float(np.max(np.abs(out - ref)))
        print(f"th={tile_h} chunk={chunk:5d} merge={int(merge)} {t*1e3:7.2f} ms   maxdiff={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
