"""On-chip validation + timing for the pallas print/encode tail kernel.

Compares the fused tail (print_encode_pallas, burn fused) against the
staged XLA path (burn() + _print_tail) at 45MP: u8 agreement and the
bench.py FIFO timing protocol back-to-back in one session.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _build
from raw2film_tpu.data import REC709_TO_XYZ
from raw2film_tpu.pipeline import render as R

H, W = 5472, 8208
ITERS = 6


def timed(run, mosaic, bundle, keys):
    float(jax.device_get(run(mosaic, bundle, keys[-1])))  # compile
    for k in keys[:2]:
        float(jax.device_get(run(mosaic, bundle, k)))  # warm
    t0 = time.perf_counter()
    float(jax.device_get(run(mosaic, bundle, keys[0])))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [run(mosaic, bundle, k) for k in keys[:ITERS]]
    float(jax.device_get(outs[-1]))
    t_many = time.perf_counter() - t0
    return max((t_many - t_one) / (ITERS - 1), 1e-6)


def main():
    bundle, cfg = _build(H, W)
    rng = np.random.default_rng(0)
    row = np.abs(rng.normal(0.35, 0.2, (1, W))).astype(np.float32)
    col = np.abs(rng.normal(1.0, 0.3, (H, 1))).astype(np.float32)
    mosaic = jnp.asarray(np.clip(row * col, 0.0, 1.0))
    cam = jnp.asarray(REC709_TO_XYZ, jnp.float32)

    def make_run(tail_on):
        import raw2film_tpu.ops.pallas_print as pp

        real = pp.print_encode_pallas

        def chain(mosaic, bundle, key):
            if not tail_on:
                pp.print_encode_pallas = lambda *a, **k: None
            try:
                out = R.render_chain_from_mosaic(mosaic, cam, bundle, cfg, key)
            finally:
                pp.print_encode_pallas = real
            return out

        @jax.jit
        def run(mosaic, bundle, key):
            return jnp.sum(
                chain(mosaic, bundle, key)[:, ::512, ::512].astype(jnp.float32)
            )

        return run, chain

    run_new, chain_new = make_run(True)
    run_old, chain_old = make_run(False)

    # Correctness: same key, diff computed ON DEVICE (a full u8 frame takes
    # minutes to ship through the tunnel; three scalars are instant).
    @jax.jit
    def compare(mosaic, bundle, key):
        a = chain_new(mosaic, bundle, key).astype(jnp.int32)
        b = chain_old(mosaic, bundle, key).astype(jnp.int32)
        diff = jnp.abs(a - b)
        return (
            jnp.max(diff),
            jnp.mean((diff > 0).astype(jnp.float32)),
            jnp.mean((diff > 1).astype(jnp.float32)),
        )

    mx, f0, f1 = (float(jax.device_get(x)) for x in compare(mosaic, bundle, jax.random.PRNGKey(7)))
    print(f"u8 max diff {mx:.0f}  frac!=0 {f0:.2e}  frac>1 {f1:.2e}")

    keys = [jax.random.PRNGKey(i) for i in range(ITERS + 1)]
    dt_new = timed(run_new, mosaic, bundle, keys)
    dt_old = timed(run_old, mosaic, bundle, keys)
    dt_new2 = timed(run_new, mosaic, bundle, keys)
    mp = H * W / 1e6
    print(
        f"staged tail: {dt_old * 1e3:.1f} ms  fused tail: {dt_new * 1e3:.1f}/"
        f"{dt_new2 * 1e3:.1f} ms  ({mp / dt_new:.0f} MP/s)"
    )


if __name__ == "__main__":
    main()
