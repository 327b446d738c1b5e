"""Host RAW-decode throughput microbenchmark (MP/s per format).

The export pipeline's decode-bound regime (BASELINE.json config 5, 100x45MP
Fuji files) is gated by these native bitstream kernels, so their scalar
throughput is a first-class number. The reference pays the same cost inside
LibRaw (reference: src/raw2film/raw_conversion.py:36-48).

Fixtures are built once by the in-tree spec encoders (tests/raw_fixtures.py)
and cached under ~/.raw2film_tpu/bench_cache; timing is best-of-R wall
seconds around `read_raw` (full container parse + bitstream decode + remap).

Usage: python benchmarks/decode_bench.py [--mp 26] [--repeats 3]
                                         [--formats raf,raf-xtrans,nef,dng7,cr3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

CACHE = os.path.expanduser("~/.raw2film_tpu/bench_cache")


def _mosaic(h: int, w: int) -> np.ndarray:
    """Natural-image-like statistics: smooth gradients + texture so the
    residual coders see realistic (small, occasionally large) diffs."""
    rng = np.random.default_rng(11)
    yy = np.linspace(0.0, 1.0, h)[:, None]
    xx = np.linspace(0.0, 1.0, w)[None, :]
    base = 0.3 + 0.4 * yy * xx + 0.15 * np.sin(7 * yy) * np.cos(5 * xx)
    tex = rng.normal(0.0, 0.02, (h, w))
    m = np.clip(base + tex, 0.0, 1.0)
    return (m * 15000).astype(np.uint16)


def _dims(mp: float) -> tuple[int, int]:
    # height % 6 == 0 and width % 768 == 0 keep every encoder happy
    # (Fuji strips, NEF pairs, CRX tiles).
    w = 768 * max(2, int(round((mp * 1e6 * 4 / 3) ** 0.5 / 768)))
    h = 6 * max(2, int(round(mp * 1e6 / w / 6)))
    return h, w


def _build(fmt: str, h: int, w: int, path: str) -> None:
    import raw_fixtures as fx

    m = _mosaic(h, w)
    if fmt == "raf":
        fx.write_raf(path, m, compressed=True, bits=14, block_size=768)
    elif fmt == "raf-xtrans":
        fx.write_raf(
            path, m, xtrans="GBGGRGRGRBGBGBGGBGBRGRGGGBGGRGRGRBGB"[:36],
            compressed=True, bits=14, block_size=768,
        )
    elif fmt == "nef":
        fx.write_nef_compressed(path, m, bits=14)
    elif fmt == "dng7":
        fx.write_dng_tiled(path, m, tile_w=256, tile_h=256)
    elif fmt == "cr3":
        fx.write_cr3_raw(path, m, nbits=14, levels=3)
    else:
        raise SystemExit(f"unknown format {fmt}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mp", type=float, default=26.0)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--formats", default="raf,nef,dng7,cr3")
    args = ap.parse_args()

    from raw2film_tpu.io.dng import read_raw

    h, w = _dims(args.mp)
    mp = h * w / 1e6
    os.makedirs(CACHE, exist_ok=True)
    for fmt in args.formats.split(","):
        ext = {"raf": "raf", "raf-xtrans": "raf", "nef": "nef",
               "dng7": "dng", "cr3": "cr3"}[fmt]
        path = os.path.join(CACHE, f"decbench_{fmt}_{h}x{w}.{ext}")
        if not os.path.exists(path):
            t0 = time.perf_counter()
            _build(fmt, h, w, path)
            print(f"# built {path} in {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr, flush=True)
        read_raw(path)  # warm (page cache, lazy native build)
        best = min(
            (lambda t0: (read_raw(path), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(args.repeats)
        )
        print(json.dumps({
            "format": fmt, "mp": round(mp, 1),
            "decode_s": round(best, 3),
            "mps": round(mp / best, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
