"""End-to-end batch-export benchmark: RAW files on disk -> JPEGs with EXIF.

Measures what the reference times for its users — the full wall-clock of a
batch export (reference: src/raw2film/gui.py:2342-2352 wraps the worker
loop of gui_objects.py:42-115 in one elapsed-time readout), through the
REAL production path: BatchRunner's host decode pool, device render
(Processor.process, full 45MP chain), and JPEG+EXIF encode.

Usage:
  python benchmarks/export_e2e.py [--frames 100] [--workers 1,4,8]
                                  [--format dng|raf] [--keep]

Synthetic sources (cached under ~/.raw2film_tpu/bench_cache, built once):
  dng — 45MP uncompressed-strip DNG (~90MB): decode is a memory-bound
        container read + remap; exercises the DEVICE/ENCODE-BOUND regime.
  raf — 45MP Fuji-lossless-compressed RAF: the bitstream decode measures
        ~17 MP/s/core on this container; exercises the DECODE-BOUND regime
        (BASELINE.json config 5's hard case).
The N input frames are symlinks to the cached file — decode cost is per
read, not per inode, and disk stays flat.

Reported per worker count: wall-clock, frames/min, per-stage totals
(decode / render / export), the bottleneck stage, and overlap efficiency
(= bottleneck stage total / wall; 1.0 means the pipeline fully hides every
other stage behind the bottleneck).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

H, W = 5472, 8208  # 44.9MP
CACHE = os.path.expanduser("~/.raw2film_tpu/bench_cache")


def _mosaic() -> np.ndarray:
    rng = np.random.default_rng(7)
    row = np.abs(rng.normal(0.35, 0.2, (1, W)))
    col = np.abs(rng.normal(1.0, 0.3, (H, 1)))
    m = np.clip(row * col, 0.0, 1.0)
    return (m * 15000).astype(np.uint16)


def _build_dng(path: str) -> None:
    """45MP uncompressed-strip RGGB DNG via the in-tree TIFF builder."""
    from raw_fixtures import _Ifd, _serialize

    from raw2film_tpu.data import XYZ_TO_REC709

    m = _mosaic()
    ifd = _Ifd()
    ifd.add(254, 4, [0])
    ifd.add(256, 4, [W])
    ifd.add(257, 4, [H])
    ifd.add(258, 3, [16])
    ifd.add(259, 3, [1])  # uncompressed
    ifd.add(262, 3, [32803])
    ifd.add(271, 2, "raw2film-tpu")
    ifd.add(272, 2, "bench45")
    ifd.add(277, 3, [1])
    ifd.add(273, 4, ("blobs", [0]))
    ifd.add(278, 4, [H])
    ifd.add(279, 4, [m.nbytes])
    ifd.add(33421, 3, [2, 2])
    ifd.add(33422, 1, [0, 1, 1, 2])  # RGGB
    ifd.add(50706, 1, [1, 4, 0, 0])
    ifd.add(50714, 3, [0])
    ifd.add(50717, 3, [65535])
    cm = np.asarray(XYZ_TO_REC709, np.float64).ravel()
    ifd.add(50721, 10, [(int(round(x * 10000)), 10000) for x in cm])
    blob = _serialize([ifd], [m.astype("<u2").tobytes()])
    with open(path, "wb") as f:
        f.write(blob)


def _build_raf(path: str) -> None:
    """45MP Fuji-lossless RAF via the in-tree encoder (~4-5 min, cached)."""
    from raw_fixtures import write_raf

    print("building 45MP Fuji-lossless RAF (one-time, ~5 min)...", flush=True)
    write_raf(path, _mosaic(), compressed=True, bits=14)


def _source(fmt: str) -> str:
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"bench45.{fmt}")
    if not os.path.exists(path):
        t0 = time.perf_counter()
        (_build_dng if fmt == "dng" else _build_raf)(path)
        print(f"built {path} in {time.perf_counter() - t0:.1f}s", flush=True)
    return path


def run_once(src: str, n_frames: int, workers: int, out_dir: str) -> dict:
    from raw2film_tpu.io.dng import read_raw
    from raw2film_tpu.io.export import save_image
    from raw2film_tpu.pipeline.batch import BatchRunner, export_path
    from raw2film_tpu.pipeline.processor import Processor
    from raw2film_tpu.utils import trace

    # N symlinked inputs (distinct basenames -> distinct export paths).
    in_dir = os.path.join(out_dir, "in")
    os.makedirs(in_dir, exist_ok=True)
    files = []
    for i in range(n_frames):
        p = os.path.join(in_dir, f"frame{i:04d}{os.path.splitext(src)[1]}")
        if not os.path.exists(p):
            os.symlink(src, p)
        files.append(p)

    proc = Processor()
    decode_total = [0.0]

    def decode(src_, **params):
        t0 = time.perf_counter()
        raw = read_raw(str(src_))
        decode_total[0] += time.perf_counter() - t0  # summed across workers
        return (str(src_), raw)

    def process(payload, **params):
        src_, raw = payload
        return proc.process(
            raw, "Kodak Portra 400",
            print_film="Fuji Crystal Archive Maxima",
            highlight_burn=0.3, half_size=False, max_scale=None,
        )

    def export(image, src_):
        dst = export_path(src_, os.path.join(out_dir, "out"))
        save_image(image, dst, metadata=getattr(proc, "last_metadata", {}) or {})
        return dst

    # Warm the device program on one frame OUTSIDE the timed window
    # (compile is a one-time cost a 100-frame batch amortizes anyway, and
    # the protocol should measure the pipeline, not XLA's cache state).
    process(decode(files[0]))
    decode_total[0] = 0.0
    trace.reset_stats()

    runner = BatchRunner(process, export, decode_fn=decode, workers=workers)
    t0 = time.perf_counter()
    results = runner.run([(f, {}) for f in files])
    wall = time.perf_counter() - t0
    ok = sum(1 for r in results if r.ok)
    assert ok == n_frames, [r.error for r in results if not r.ok][:3]

    stats = trace.stage_stats() if hasattr(trace, "stage_stats") else {}
    render_total = sum(trace._LOG.get("batch.render", []))
    export_total = sum(trace._LOG.get("batch.export", []))
    stages = {
        "decode": decode_total[0],
        "render": render_total,
        "export": export_total,
    }
    bottleneck = max(stages, key=stages.get)
    return {
        "workers": workers,
        "frames": n_frames,
        "wall_s": round(wall, 2),
        "frames_per_min": round(n_frames / wall * 60.0, 2),
        "stage_totals_s": {k: round(v, 2) for k, v in stages.items()},
        "bottleneck": bottleneck,
        "overlap_efficiency": round(stages[bottleneck] / wall, 3),
        "ok": ok,
        "_stats": stats,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--workers", default="1,4,8")
    ap.add_argument("--format", default="dng", choices=("dng", "raf"))
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    src = _source(args.format)
    size_mb = os.path.getsize(src) / 1e6
    print(f"source: {src} ({size_mb:.0f} MB, {H}x{W})", flush=True)

    out_dir = tempfile.mkdtemp(prefix="r2f_export_e2e_")
    try:
        for wstr in args.workers.split(","):
            r = run_once(src, args.frames, int(wstr), out_dir)
            r.pop("_stats", None)
            print(json.dumps(r), flush=True)
            shutil.rmtree(os.path.join(out_dir, "out"), ignore_errors=True)
    finally:
        if not args.keep:
            shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
