"""On-chip marginal cost of each chain stage at 45MP.

Times the mosaic-onward chain with stages toggled off and reports the
marginal differences, plus an isolated demosaic timing. FIFO timing
protocol as bench.py (the axon tunnel acks dispatch without waiting).
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
from raw2film_tpu.data import REC709_TO_XYZ
from raw2film_tpu.pipeline import render as R

H, W = 5472, 8208
ITERS = 6


def timed(run, *args):
    keys = [jax.random.PRNGKey(i) for i in range(ITERS)]
    float(jax.device_get(run(*args, keys[-1])))  # compile
    float(jax.device_get(run(*args, keys[0])))  # warm
    t0 = time.perf_counter()
    float(jax.device_get(run(*args, keys[0])))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [run(*args, k) for k in keys]
    float(jax.device_get(outs[-1]))
    t_many = time.perf_counter() - t0
    return max((t_many - t_one) / (ITERS - 1), 1e-6)


def main():
    rng = np.random.default_rng(0)
    row = np.abs(rng.normal(0.35, 0.2, (1, W))).astype(np.float32)
    col = np.abs(rng.normal(1.0, 0.3, (H, 1))).astype(np.float32)
    mosaic = jnp.asarray(np.clip(row * col, 0.0, 1.0))
    cam = jnp.asarray(REC709_TO_XYZ, jnp.float32)

    variants = {
        "full": dict(),
        "-burn": dict(burn=0.0),
        "-grain": dict(grain=0),
        "-mtf": dict(sharpness=False),
        "-halation": dict(halation=False),
        "bare": dict(burn=0.0, grain=0, sharpness=False, halation=False),
    }
    times = {}
    for name, kw in variants.items():
        bundle, cfg = _build(H, W, **kw)

        @jax.jit
        def run(mosaic, bundle, key, cfg=cfg):
            out = R.render_chain_from_mosaic(mosaic, cam, bundle, cfg, key)
            return jnp.sum(out[:, ::512, ::512].astype(jnp.float32))

        try:
            times[name] = timed(run, mosaic, bundle)
        except Exception as e:  # Mosaic scoped-VMEM accounting varies at the
            # margin (see BENCHMARKS.md); report and keep going.
            print(f"{name:10s} compile-fail ({type(e).__name__})", flush=True)
            continue
        print(f"{name:10s} {times[name] * 1e3:7.2f} ms", flush=True)

    from raw2film_tpu.ops import demosaic as dm

    @jax.jit
    def run_dm(mosaic, key):
        out = dm.demosaic_mhc(mosaic, "RGGB")
        return jnp.sum(out[:, ::512, ::512]) + jnp.float32(0) * key[0]

    t_dm = timed(run_dm, mosaic)
    print(f"{'demosaic*':10s} {t_dm * 1e3:7.2f} ms  (isolated)", flush=True)

    full = times.get("full")
    print("\nmarginal costs (full - variant):")
    for name in ("-burn", "-grain", "-mtf", "-halation"):
        if full is not None and name in times:
            print(f"  {name[1:]:9s} {(full - times[name]) * 1e3:7.2f} ms")
    if "bare" in times:
        print(f"  bare chain {times['bare'] * 1e3:7.2f} ms (incl demosaic)")


if __name__ == "__main__":
    main()
