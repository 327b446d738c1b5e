"""On-chip sweep of the MTF+grain mega-kernel tiling knobs at 45MP.

Same protocol as halation_sweep.py: variants back-to-back in one process.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _build
from raw2film_tpu.ops import mtf as mtf_ops
from raw2film_tpu.ops import pallas_conv2

H, W = 5472, 8208
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
    img = jnp.asarray(rng.uniform(0.0, 2.5, (3, H, W)).astype(np.float32))
    bundle, cfg = _build(H, W)
    k = mtf_ops.mtf_kernel(cfg.mtf_key, cfg.scale, 0.0, 1.0)
    u3, v3 = mtf_ops._svd_stack(k, tol=2e-3, max_rank=4)
    seed = jnp.asarray([1234], jnp.uint32)
    prm = jnp.asarray([0.004, 0.15, 0.3, 2.5, 0.0, 0.25], jnp.float32)
    sigma_px = 1.2

    ref = None
    variants = [
        (32, 512, False),  # shipped configuration (halo side-inputs now)
        (32, 512, True),
        (48, 512, True),
        (48, 256, True),
        (72, 256, True),
        (72, 128, True),
        (96, 256, True),
    ]
    if len(sys.argv) > 1:  # e.g. "32:512:1,48:512:1" to trim tunnel time
        variants = [
            (int(t), int(c), bool(int(m)))
            for t, c, m in (s.split(":") for s in sys.argv[1].split(","))
        ]
    for tile_h, chunk, merge in variants:
        from functools import partial

        @partial(jax.jit, static_argnames=("tile_h", "chunk", "merge"))
        def f(img, tile_h=tile_h, chunk=chunk, merge=merge):
            return pallas_conv2.fused_sep_rank_mxu(
                img, u3, v3, precision="dc", tile_h=tile_h, chunk=chunk,
                grain=(seed, prm, sigma_px), colmerge=merge,
            )

        def run(img, f=f):
            return f(img)

        try:
            t = timed(run, img)
        except Exception as e:
            print(f"th={tile_h} chunk={chunk:5d} merge={int(merge)} FAIL {type(e).__name__}: {str(e)[:100]}", flush=True)
            continue
        out = np.asarray(jax.device_get(run(img)))
        if ref is None:
            ref = out
            err = 0.0
        else:
            err = float(np.max(np.abs(out - ref)))
        print(f"th={tile_h} chunk={chunk:5d} merge={int(merge)} {t*1e3:7.2f} ms   maxdiff={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
