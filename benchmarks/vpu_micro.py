"""VPU microbenchmarks: what do exp/log/pow actually cost on this chip?

Times elementwise ops over a 45MP-sized plane (f32), back-to-back in one
process (axon FIFO protocol). Informs the print-tail transcendental budget:
the tail spends ~9-12 exp/log-class ops per pixel (6 softplus exps, 3
pow10s, 3 encode pows).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 5472, 8208
ITERS = 8


def timed(f, x):
    r = f(x)
    float(jax.device_get(jnp.sum(r[::512, ::512])))
    float(jax.device_get(jnp.sum(f(x)[::512, ::512])))
    t0 = time.perf_counter()
    float(jax.device_get(jnp.sum(f(x)[::512, ::512])))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [f(x) for _ in range(ITERS)]
    float(jax.device_get(jnp.sum(outs[-1][::512, ::512])))
    t_many = time.perf_counter() - t0
    return max((t_many - t_one) / (ITERS - 1), 1e-6)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.01, 2.0, (H, W)).astype(np.float32))

    cases = {
        "copy (x+1)": lambda x: x + 1.0,
        "4 fma": lambda x: ((x * 1.1 + 0.2) * 0.9 + 0.1) * (x * 0.5 + 0.3),
        "exp": jnp.exp,
        "exp2": jnp.exp2,
        "log": jnp.log,
        "log1p": jnp.log1p,
        "pow10(-x) via power": lambda x: jnp.power(10.0, -x),
        "pow10(-x) via exp2": lambda x: jnp.exp2(x * np.float32(-3.321928094887362)),
        "x**(1/2.4) via power": lambda x: jnp.power(x, np.float32(1 / 2.4)),
        "x**(1/2.4) via exp2/log2": lambda x: jnp.exp2(
            jnp.log2(jnp.maximum(x, 1e-12)) * np.float32(1 / 2.4)
        ),
        "softplus (exp+log1p)": lambda x: jnp.maximum(x, 0.0)
        + jnp.log1p(jnp.exp(-jnp.abs(x))),
        "rsqrt": jax.lax.rsqrt,
        "sqrt": jnp.sqrt,
        "tanh": jnp.tanh,
        "deg7 poly (7 fma)": lambda x: (
            ((((((x * 0.1 + 0.2) * x + 0.3) * x + 0.4) * x + 0.5) * x + 0.6) * x + 0.7)
            * x
            + 0.8
        ),
    }
    base = None
    for name, f in cases.items():
        g = jax.jit(f)
        t = timed(g, x)
        if base is None:
            base = t
        print(f"{name:28s} {t*1e3:7.3f} ms   ({t/base:5.2f}x copy)", flush=True)


if __name__ == "__main__":
    main()
