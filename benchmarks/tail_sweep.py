"""On-chip sweep of the print/encode tail kernel's tile height at 45MP.

Protocol of mtf_sweep.py: all variants back-to-back in one process, FIFO
timing (the axon tunnel acks dispatch without waiting). The kernel's VMEM
budget currently forces tile 32 at W=8208 (64 would need ~15.8M); this
sweep times candidate tiles with the budget lifted to find whether the
(likely transcendental-bound) kernel gains anything from taller tiles.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raw2film_tpu.film import chain as fchain
from raw2film_tpu.film.loader import load_film_stocks
from raw2film_tpu.ops import pallas_print as pp
from raw2film_tpu.pipeline import render as R

H, W = 5472, 8208
ITERS = 6


def timed(run, *args):
    float(jax.device_get(jnp.sum(run(*args)[:, ::512, ::512].astype(jnp.float32))))
    float(jax.device_get(jnp.sum(run(*args)[:, ::512, ::512].astype(jnp.float32))))
    t0 = time.perf_counter()
    float(jax.device_get(jnp.sum(run(*args)[:, ::512, ::512].astype(jnp.float32))))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [run(*args) for _ in range(ITERS)]
    float(jax.device_get(jnp.sum(outs[-1][:, ::512, ::512].astype(jnp.float32))))
    t_many = time.perf_counter() - t0
    return max((t_many - t_one) / (ITERS - 1), 1e-6)


def main():
    stocks = load_film_stocks()
    neg, prt = stocks["Kodak Portra 400"], stocks["Fuji Crystal Archive Maxima"]
    np_ = fchain.build_negative_params(neg)
    ppar = fchain.build_print_params(neg, prt, neg_params=np_)
    op = fchain.build_output_params(neg, prt, ppar, np_)
    bundle = R.make_film_bundle(np_, ppar, op)
    pvec = pp.pack_print_vec(bundle)

    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.uniform(0.0, 3.0, (3, H, W)).astype(np.float32))

    tiles = [32, 64, 96, 16]
    if len(sys.argv) > 1:
        tiles = [int(s) for s in sys.argv[1].split(",")]

    ref = None
    for th in tiles:
        @partial(jax.jit, static_argnames=("th",))
        def f(d, pvec, th=th):
            out = pp.print_encode_pallas(
                d, pvec, "print", False, True, "sRGB", tile_h=th,
                vmem_budget=10**9,
            )
            return out

        try:
            out = f(d, pvec)
            if out is None:
                print(f"tile {th:3d}: declined")
                continue
            dt = timed(f, d, pvec)
        except Exception as e:
            print(f"tile {th:3d}: compile-fail ({type(e).__name__})")
            continue
        s = float(jax.device_get(jnp.sum(f(d, pvec)[:, ::512, ::512].astype(jnp.float32))))
        if ref is None:
            ref = s
        tag = "" if abs(s - ref) < 1e-3 else f"  MISMATCH sum {s} vs {ref}"
        print(f"tile {th:3d}: {dt * 1e3:6.2f} ms  ({H * W / 1e6 / dt:5.0f} MP/s){tag}", flush=True)


if __name__ == "__main__":
    main()
