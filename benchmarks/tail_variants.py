"""On-chip A/B of print-tail kernel transcendental formulations at 45MP.

The tail kernel measured ~7 ms isolated (bandwidth floor ~0.9 ms) — it is
VPU/transcendental-bound: per pixel/channel the print path spends 2
softplus (exp+log1p each), one 10^-x, and one encode pow. This harness
times local kernel variants that reformulate those ops, back-to-back in
one process (FIFO protocol), and reports u8 agreement vs the shipped
kernel so a winning variant can be promoted with fidelity evidence.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raw2film_tpu.film import chain as fchain
from raw2film_tpu.film.loader import load_film_stocks
from raw2film_tpu.ops import pallas_print as pp
from raw2film_tpu.pipeline import render as R

H, W = 5472, 8208
ITERS = 6
LOG2_10 = np.float32(np.log2(10.0))
LOG2_E = np.float32(np.log2(np.e))
LN2 = np.float32(np.log(2.0))


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


# ------------------------------------------------------------ variants

def softp_ref(u, w):
    t = u * (np.float32(1.0) / w)
    return w * (jnp.maximum(t, np.float32(0.0)) + jnp.log1p(jnp.exp(-jnp.abs(t))))


def softp_exp2(u, w):
    # log1p(exp(-|t|)) = ln2 * log2(1 + exp2(-|t| * log2e))
    t = u * (np.float32(1.0) / w)
    return w * (
        jnp.maximum(t, np.float32(0.0))
        + LN2 * jnp.log2(np.float32(1.0) + jnp.exp2(-jnp.abs(t) * LOG2_E))
    )


def pow10_ref(x):
    return jnp.power(np.float32(10.0), x)


def pow10_exp2(x):
    return jnp.exp2(x * LOG2_10)


def enc_ref(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(
        x <= 0.0031308,
        np.float32(12.92) * x,
        np.float32(1.055) * jnp.power(x, np.float32(1.0 / 2.4)) - np.float32(0.055),
    )


def enc_exp2(x):
    x = jnp.clip(x, 0.0, 1.0)
    p = jnp.exp2(jnp.log2(jnp.maximum(x, np.float32(1e-12))) * np.float32(1.0 / 2.4))
    return jnp.where(
        x <= 0.0031308,
        np.float32(12.92) * x,
        np.float32(1.055) * p - np.float32(0.055),
    )


def make_kernel(softp, pow10, enc):
    def _kernel(d_ref, p_ref, o_ref):
        P = lambda i: p_ref[i]
        dp = (d_ref[0], d_ref[1], d_ref[2])
        d_pp = []
        for c in range(3):
            log_e = P(9 + c) - (
                P(3 * c) * dp[0] + P(3 * c + 1) * dp[1] + P(3 * c + 2) * dp[2]
            )
            d_pp.append(
                P(12 + c)
                + P(15 + c)
                * (softp(log_e - P(18 + c), P(24 + c)) - softp(log_e - P(21 + c), P(27 + c)))
            )
        vd = [
            P(33 + 3 * c) * d_pp[0]
            + P(33 + 3 * c + 1) * d_pp[1]
            + P(33 + 3 * c + 2) * d_pp[2]
            for c in range(3)
        ]
        lin = [pow10(-(vd[c] + P(44 + c))) for c in range(3)]
        rgb = [
            (
                P(47 + 3 * c) * lin[0]
                + P(47 + 3 * c + 1) * lin[1]
                + P(47 + 3 * c + 2) * lin[2]
            )
            * P(56 + c)
            for c in range(3)
        ]
        for c in range(3):
            q = enc(rgb[c])
            o_ref[c] = jnp.round(q * np.float32(255.0)).astype(jnp.int32).astype(jnp.uint8)

    return _kernel


def call_variant(d, pvec, kernel, th=32):
    h, w = d.shape[1:]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, h, w), jnp.uint8),
        grid=(h // th,),
        in_specs=[
            pl.BlockSpec((3, th, w), lambda j: (0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((3, th, w), lambda j: (0, j, 0), memory_space=pltpu.VMEM),
    )(d, jnp.reshape(pvec, (pp.PVEC_LEN,)).astype(jnp.float32))


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

    variants = {
        "ref (shipped forms)": make_kernel(softp_ref, pow10_ref, enc_ref),
        "pow10->exp2": make_kernel(softp_ref, pow10_exp2, enc_ref),
        "enc->exp2log2": make_kernel(softp_ref, pow10_ref, enc_exp2),
        "softp->exp2log2": make_kernel(softp_exp2, pow10_ref, enc_ref),
        "all exp2": make_kernel(softp_exp2, pow10_exp2, enc_exp2),
    }
    base_out = None
    for name, kern in variants.items():
        for th in (32,) if name != "all exp2" else (32, 48, 16):
            f = jax.jit(partial(call_variant, kernel=kern, th=th))
            try:
                out = f(d, pvec)
                dt = timed(f, d, pvec)
            except Exception as e:
                print(f"{name:22s} th={th:2d}: fail ({type(e).__name__})")
                continue
            if base_out is None:
                base_out = out
                mx = 0.0
            else:
                mx = float(jax.device_get(jnp.max(jnp.abs(
                    out.astype(jnp.int32) - base_out.astype(jnp.int32)))))
            print(
                f"{name:22s} th={th:2d}: {dt * 1e3:6.2f} ms  "
                f"({H * W / 1e6 / dt:5.0f} MP/s)  maxdiff {mx:.0f}",
                flush=True,
            )


if __name__ == "__main__":
    main()


def main2():
    """Repeat A/B of the two winners and their combination, interleaved."""
    stocks = load_film_stocks()
    neg, prt = stocks["Kodak Portra 400"], stocks["Fuji Crystal Archive Maxima"]
    np_ = fchain.build_negative_params(neg)
    ppar = fchain.build_print_params(neg, prt, neg_params=np_)
    op = fchain.build_output_params(neg, prt, ppar, np_)
    bundle = R.make_film_bundle(np_, ppar, op)
    pvec = pp.pack_print_vec(bundle)
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.uniform(0.0, 3.0, (3, H, W)).astype(np.float32))
    variants = {
        "ref": make_kernel(softp_ref, pow10_ref, enc_ref),
        "pow10": make_kernel(softp_ref, pow10_exp2, enc_ref),
        "softp": make_kernel(softp_exp2, pow10_ref, enc_ref),
        "pow10+softp": make_kernel(softp_exp2, pow10_exp2, enc_ref),
    }
    fs = {n: jax.jit(partial(call_variant, kernel=k, th=32)) for n, k in variants.items()}
    for rep in range(3):
        line = []
        for name, f in fs.items():
            dt = timed(f, d, pvec)
            line.append(f"{name} {dt*1e3:5.2f}")
        print(f"rep{rep}: " + "  ".join(line), flush=True)


if __name__ == "__main__":
    pass
