"""On-chip sweep of the fused demosaic kernel's tiling knobs at 45MP.

Same protocol as mtf_sweep.py: variants back-to-back in one process.
The kernel moves 0.72 GB/frame; at the round-3 tile 32 it measured ~5 ms
(144 GB/s effective) — far under the v5e's HBM bandwidth, so tile/chunk
headroom is worth a look now that the halo refactor freed VMEM.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raw2film_tpu.ops import pallas_demosaic

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
    mosaic = jnp.asarray(rng.uniform(0.0, 1.0, (H, W)).astype(np.float32))
    mat = jnp.asarray(np.eye(3, dtype=np.float32) * 1.1)

    variants = [(32, 1024), (32, 2048), (40, 1024), (48, 1024), (48, 512), (56, 1024), (64, 1024)]
    if len(sys.argv) > 1:
        variants = [
            (int(t), int(c)) for t, c in (s.split(":") for s in sys.argv[1].split(","))
        ]
    ref = None
    for tile_h, chunk in variants:
        from functools import partial

        @partial(jax.jit, static_argnames=("tile_h", "chunk"))
        def f(m, tile_h=tile_h, chunk=chunk):
            return pallas_demosaic.demosaic_mhc_pallas(
                m, 0, 0, tile_h=tile_h, chunk=chunk, mat=mat
            )

        def run(m, f=f):
            return f(m)

        try:
            t = timed(run, mosaic)
        except Exception as e:
            print(
                f"th={tile_h} chunk={chunk:5d} FAIL {type(e).__name__}: {str(e)[:100]}",
                flush=True,
            )
            continue
        out = np.asarray(jax.device_get(run(mosaic)))
        if ref is None:
            ref = out
            err = 0.0
        else:
            err = float(np.max(np.abs(out - ref)))
        print(f"th={tile_h} chunk={chunk:5d} {t*1e3:7.2f} ms   maxdiff={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
