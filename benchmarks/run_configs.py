"""Benchmark suite: the five BASELINE.json configs, one JSON line each.

Run on real TPU:  python benchmarks/run_configs.py [config_index ...]

Timing protocol matches bench.py: the axon tunnel acks dispatches without
waiting, so we enqueue N renders FIFO and force only the last, subtracting
the single-dispatch round trip.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _timed(jfn, args, iters=6):
    import jax
    import jax.numpy as jnp

    def force(o):
        return float(jax.device_get(jnp.sum(o[..., ::256, ::256].astype(jnp.float32))))

    force(jfn(*args))
    t0 = time.perf_counter()
    force(jfn(*args))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [jfn(*args) for _ in range(iters)]
    force(outs[-1])
    t_many = time.perf_counter() - t0
    return max((t_many - t_one) / (iters - 1), 1e-6)


def _setup(h, w, **kw):
    sys.path.insert(0, ".")
    from __graft_entry__ import _build

    return _build(h, w, **kw)


def _input(h, w, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    row = np.abs(rng.normal(0.25, 0.2, (3, 1, w))).astype(np.float32)
    col = np.abs(rng.normal(1.0, 0.3, (1, h, 1))).astype(np.float32)
    return jnp.asarray(row * col)


def config_0():
    """Single DNG -> demosaic + default negative -> sRGB (smoke path)."""
    import jax
    import jax.numpy as jnp

    from raw2film_tpu.ops.demosaic import demosaic_mhc
    from raw2film_tpu.pipeline.render import render_chain

    h, w = 4000, 6000  # 24MP mosaic
    bundle, cfg = _setup(h, w, grain=0, halation=False, sharpness=False, burn=0.0)
    mosaic = jnp.asarray(np.abs(np.random.default_rng(0).normal(0.2, 0.15, (h, w))).astype(np.float32))

    @jax.jit
    def run(mosaic, bundle, key):
        xyz = demosaic_mhc(mosaic, "RGGB")
        return render_chain(xyz, bundle, cfg, key)

    dt = _timed(run, (mosaic, bundle, jax.random.PRNGKey(0)))
    return {"config": 0, "name": "demosaic + negative chain, 24MP", "ms": round(dt * 1e3, 1), "MP/s": round(h * w / 1e6 / dt, 1)}


def config_1():
    """Full negative+print chain with density curves @ 24MP."""
    import jax

    from raw2film_tpu.pipeline.render import render_chain

    h, w = 4000, 6000
    bundle, cfg = _setup(h, w, grain=0, halation=False, sharpness=False, burn=0.0)
    x = _input(h, w)

    @jax.jit
    def run(x, bundle, key):
        return render_chain(x, bundle, cfg, key)

    dt = _timed(run, (x, bundle, jax.random.PRNGKey(0)))
    return {"config": 1, "name": "negative+print chain, 24MP", "ms": round(dt * 1e3, 1), "MP/s": round(h * w / 1e6 / dt, 1)}


def config_2():
    """Grain + MTF micro-contrast @ 45MP."""
    import jax

    from raw2film_tpu.pipeline.render import render_chain

    h, w = 5472, 8208
    bundle, cfg = _setup(h, w, grain=2, halation=False, sharpness=True, burn=0.0)
    x = _input(h, w)

    @jax.jit
    def run(x, bundle, key):
        return render_chain(x, bundle, cfg, key)

    dt = _timed(run, (x, bundle, jax.random.PRNGKey(0)))
    return {"config": 2, "name": "grain + MTF @ 45MP", "ms": round(dt * 1e3, 1), "MP/s": round(h * w / 1e6 / dt, 1)}


def config_3():
    """Halation fused into the full chain @ 45MP."""
    import jax

    from raw2film_tpu.pipeline.render import render_chain

    h, w = 5472, 8208
    bundle, cfg = _setup(h, w, grain=2, halation=True, sharpness=True, burn=0.3)
    x = _input(h, w)

    @jax.jit
    def run(x, bundle, key):
        return render_chain(x, bundle, cfg, key)

    dt = _timed(run, (x, bundle, jax.random.PRNGKey(0)))
    return {"config": 3, "name": "FULL chain (halation+MTF+grain+burn) @ 45MP", "ms": round(dt * 1e3, 1), "MP/s": round(h * w / 1e6 / dt, 1)}


def config_4():
    """Batch export: vmapped full pipeline, 8x 6MP (stand-in for 100x45MP
    on the single bench chip) + simplified-preview downscale path."""
    import jax
    import jax.numpy as jnp

    from raw2film_tpu.pipeline.render import render_chain
    from raw2film_tpu.parallel.mesh import batch_render_fn

    h, w = 2048, 3072
    b = 8
    bundle, cfg = _setup(h, w, grain=2, halation=True, sharpness=True, burn=0.3)
    x = jnp.stack([_input(h, w, seed=i) for i in range(b)])
    keys = jax.random.split(jax.random.PRNGKey(0), b)
    run = jax.jit(batch_render_fn(cfg))
    dt = _timed(run, (x, bundle, keys))
    return {"config": 4, "name": f"vmapped batch x{b} @ 6MP full chain", "ms": round(dt * 1e3, 1), "MP/s": round(b * h * w / 1e6 / dt, 1)}


ALL = [config_0, config_1, config_2, config_3, config_4]


def main():
    picks = [int(a) for a in sys.argv[1:]] or list(range(len(ALL)))
    for i in picks:
        try:
            print(json.dumps(ALL[i]()), flush=True)
        except Exception as e:  # keep going; report the failure
            print(json.dumps({"config": i, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
