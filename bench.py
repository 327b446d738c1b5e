"""Headline benchmark: 45MP RAW through the full negative->print chain.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.json north star): 45MP through negative+print+grain+
halation(+MTF+burn) in <100 ms on one v5e chip => 450 MP/s. vs_baseline is
measured MP/s over 450.

Timing protocol (round-5, outlier-proof): the axon TPU tunnel acknowledges
dispatch without waiting, so `block_until_ready` is unreliable — each pass
enqueues ITERS renders FIFO and forces only the last, with
(t_many - t_one)/(ITERS - 1) cancelling the fixed dispatch+fetch round trip.
We run >=4 independent passes, drop any pass bearing the stall signature
(per-iter time > 3x the warm single call, or dt collapsing below 25% of the
per-iter time because t_one itself was poisoned), and report the BEST pass
as the headline with median/max alongside. One transient can no longer
become the number of record (round 4's 19x-wrong driver capture).
"""

from __future__ import annotations

import json
import time

import numpy as np


BASELINE_MP_S = 450.0
H, W = 5472, 8208  # 44.9 MP, 3:2, conv/tile friendly
ITERS = 6


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build
    from raw2film_tpu.data import REC709_TO_XYZ
    from raw2film_tpu.pipeline.render import render_chain_from_mosaic

    bundle, cfg = _build(H, W)

    rng = np.random.default_rng(0)
    # Synthetic CFA mosaic (band pattern instead of full random to keep
    # host-side setup fast). The chain starts AT the mosaic — fused
    # demosaic + camera matrix + full film chain in one jit (the camera
    # matrix folds into the chain's input transform) — matching
    # BASELINE.json's "demosaic-onward on device" metric definition.
    row = np.abs(rng.normal(0.35, 0.2, (1, W))).astype(np.float32)
    col = np.abs(rng.normal(1.0, 0.3, (H, 1))).astype(np.float32)
    mosaic = jnp.asarray(np.clip(row * col, 0.0, 1.0))
    cam_to_xyz = jnp.asarray(REC709_TO_XYZ, jnp.float32)

    keys = [jax.random.PRNGKey(i) for i in range(ITERS + 1)]
    # Compile + warm-up. Safety net: Mosaic's scoped-VMEM accounting varies
    # run to run at the margin (observed: a kernel that compiled at ~15.9M
    # for dozens of runs flipped to a 19.06M hard OOM after an unrelated
    # upstream change). Walk the downgrade ladder — fused -> conservative
    # tiles -> fusion off -> pure-XLA formulations (always compiles, no
    # scoped-VMEM kernels) — so the benchmark always reports. Each rung is
    # a DISTINCT program: rungs whose cfg equals the one that just failed
    # are skipped instead of re-paying the same failing compile.
    import dataclasses
    import sys

    def rungs(cfg):
        yield cfg, None  # fully fused, measured-fastest tiles
        try:
            c1 = dataclasses.replace(cfg, conservative_tiles=True)
            yield c1, "conservative kernel tiles"
        except TypeError:  # older RenderConfig without the field
            c1 = cfg
        c2 = dataclasses.replace(c1, fusion=False)
        if c2 != c1:
            yield c2, "separate kernels (fusion off)"
        yield c2, "XLA formulations"

    def make_run(cfg_try, use_xla):
        def chain(mosaic, bundle, key):
            if use_xla:
                from raw2film_tpu.ops import conv as convops

                with convops.force_xla():
                    out = render_chain_from_mosaic(
                        mosaic, cam_to_xyz, bundle, cfg_try, key
                    )
            else:
                out = render_chain_from_mosaic(
                    mosaic, cam_to_xyz, bundle, cfg_try, key
                )
            return jnp.sum(out[:, ::512, ::512].astype(jnp.float32))

        return jax.jit(chain)

    for cfg_try, label in rungs(cfg):
        use_xla = label == "XLA formulations"
        run = make_run(cfg_try, use_xla)
        try:
            float(jax.device_get(run(mosaic, bundle, keys[-1])))
            break
        except Exception as e:
            if use_xla:  # last rung: nothing left to fall back to
                raise
            print(
                f"warning: compile failed ({type(e).__name__}); "
                "falling back to the next ladder rung",
                file=sys.stderr,
            )

    # The device executes dispatches FIFO; enqueue renders and force only the
    # last result. (t_many - t_one) / (ITERS - 1) cancels the fixed
    # dispatch+fetch round trip of the tunnel.
    #
    # Outlier defense (round-5 protocol): one pass has zero protection
    # against a transient tunnel/chip stall landing inside its ITERS-call
    # window — round 4's driver capture published 525.5 ms for a chain two
    # independent reruns measured at 20-22 ms. So: run >=PASSES independent
    # passes, take the BEST as the headline (min is the right estimator for
    # a fixed workload plus non-negative noise), report min/median/max, and
    # re-measure any pass bearing the anomaly signature (per-iter time > 3x
    # the warm single-call time means a stall poisoned the window, not that
    # the chain got slower).
    def one_pass(pass_idx):
        t0 = time.perf_counter()
        float(jax.device_get(run(mosaic, bundle, keys[0])))
        t_one = time.perf_counter() - t0

        t0 = time.perf_counter()
        outs = [run(mosaic, bundle, k) for k in keys[:ITERS]]
        float(jax.device_get(outs[-1]))
        t_many = time.perf_counter() - t0
        dt = max((t_many - t_one) / (ITERS - 1), 1e-6)
        return dt, t_one, t_many

    PASSES = 4
    MAX_PASSES = 10
    dts = []
    all_dts = []  # every measured pass, anomalous included (fallback pool)
    anomalies = 0
    attempts = 0
    while len(dts) < PASSES and attempts < MAX_PASSES:
        dt, t_one, t_many = one_pass(attempts)
        attempts += 1
        # Fallback pool entry: when dt is implausibly SMALL (poisoned t_one
        # deflates the subtraction), substitute the per-iter time — an
        # overestimate of the frame cost, never an understatement.
        _pi = t_many / ITERS
        all_dts.append(dt if dt >= 0.25 * _pi else _pi)
        # Anomaly signature (r4): a stall inside the enqueue window makes the
        # apparent per-iter time explode relative to the warm single call.
        # t_one itself can also be the poisoned sample (making dt ~0 or even
        # negative before the max() clamp) — catch both and re-measure.
        per_iter = t_many / ITERS
        if t_one > 0 and (per_iter > 3.0 * t_one or dt < 0.25 * per_iter):
            anomalies += 1
            print(
                f"warning: pass {attempts} anomalous "
                f"(t_one={t_one * 1e3:.1f}ms, per_iter={per_iter * 1e3:.1f}ms); "
                "re-measuring",
                file=sys.stderr,
            )
            continue
        dts.append(dt)
    if not dts:
        # Every pass anomalous: report the least-bad data we have — the
        # MINIMUM over all attempts (min is the right estimator under
        # non-negative noise), not whichever pass happened to come last.
        dts = [min(all_dts)]

    dts.sort()
    dt = dts[0]
    med = dts[len(dts) // 2] if len(dts) % 2 else 0.5 * (dts[len(dts) // 2 - 1] + dts[len(dts) // 2])

    mp = H * W / 1e6
    mp_s = mp / dt
    print(
        json.dumps(
            {
                "metric": "45MP mosaic->print chain (demosaic+halation+MTF+grain+burn), single chip",
                "value": round(mp_s, 1),
                "unit": "MP/s",
                "vs_baseline": round(mp_s / BASELINE_MP_S, 3),
                "detail": {
                    "ms_per_frame": round(dt * 1e3, 1),
                    "ms_median": round(med * 1e3, 1),
                    "ms_max": round(dts[-1] * 1e3, 1),
                    "passes": len(dts),
                    "anomalous_passes": anomalies,
                    "megapixels": round(mp, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
