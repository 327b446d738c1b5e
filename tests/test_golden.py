"""Golden-image regression suite (SURVEY §4's golden-test plan).

The oracle-relative tests compare the device chain against the host oracle —
but a simultaneous drift of oracle + device (e.g. a science recalibration in
film/chain.py) passes them silently. These tests pin the rendered LOOK
itself: five small uint8 renders across stock/mode combos are checked into
tests/golden/ and any science change that shifts the output by more than one
8-bit code fails CI.

Regenerating (after an INTENTIONAL look change, with the diff reviewed):

    R2F_REGEN_GOLDEN=1 python -m pytest tests/test_golden.py -q

and commit the changed .npy files together with the science change.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from raw2film_tpu.pipeline.processor import Processor

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
REGEN = os.environ.get("R2F_REGEN_GOLDEN", "") == "1"

# The five chain modes from the component map: color print, color inversion,
# positive direct, BW inversion, BW silver-gelatin paper. Full effects on
# (halation + MTF + seeded grain + highlight burn) so the spatial stages are
# pinned too, not just the color science.
CASES = {
    "print": dict(
        negative_film="Kodak Portra 400",
        print_film="Fuji Crystal Archive Maxima",
    ),
    "inversion": dict(
        negative_film="Kodak Portra 400", print_film=None, inversion=True
    ),
    "direct": dict(negative_film="Kodak Ektachrome E100", print_film=None),
    "bw": dict(negative_film="Kodak Tri-X 400", print_film=None, inversion=True),
    "bw_paper": dict(
        negative_film="Kodak Tri-X 400", print_film="Ilford Multigrade IV RC"
    ),
}

COMMON = dict(
    grain=2,
    halation=True,
    sharpness=True,
    highlight_burn=0.3,
    half_size=False,
    max_scale=None,
    seed=42,
)


def _scene(h: int = 64, w: int = 96) -> np.ndarray:
    """Deterministic XYZ test scene: luminance ramp x hue sweep plus a few
    saturated / near-black / near-white patches (the regions where look
    drift shows first)."""
    from raw2film_tpu.data import REC709_TO_XYZ

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    r = 0.03 + 0.75 * xx / w
    g = 0.03 + 0.6 * yy / h
    b = 0.55 - 0.45 * xx / w
    rgb = np.stack([r, g, b])
    patches = [
        (slice(4, 12), slice(4, 16), (0.8, 0.05, 0.05)),
        (slice(4, 12), slice(20, 32), (0.05, 0.7, 0.08)),
        (slice(4, 12), slice(36, 48), (0.06, 0.08, 0.8)),
        (slice(52, 60), slice(4, 16), (0.004, 0.004, 0.004)),
        (slice(52, 60), slice(20, 32), (0.95, 0.92, 0.9)),
        (slice(52, 60), slice(36, 48), (0.18, 0.18, 0.18)),
    ]
    for sy, sx, color in patches:
        for c in range(3):
            rgb[c, sy, sx] = color[c]
    xyz = np.einsum("ij,jhw->ihw", REC709_TO_XYZ, rgb)
    return np.clip(xyz, 0.0, None).astype(np.float32)


@pytest.fixture(scope="module")
def proc():
    return Processor()


def test_golden_raf_end_to_end(proc, tmp_path):
    """Sixth golden: a full FILE-to-print render from a deterministic
    compressed X-Trans RAF — pins the container parse, native strip decode,
    masked demosaic and auto-exposure alongside the chain (the five XYZ
    goldens start after decode)."""
    from raw_fixtures import write_raf

    from raw2film_tpu.io.raf import XTRANS_CANONICAL

    h, w = 66, 96
    yy, xx = np.mgrid[0:h, 0:w]
    rng = np.random.default_rng(7)
    m = np.clip(
        1400 + 9000 * (xx / w) * (0.4 + 0.6 * yy / h) + rng.integers(0, 120, (h, w)),
        0,
        16383,
    ).astype(np.uint16)
    p = str(tmp_path / "g.raf")
    write_raf(p, m, xtrans=XTRANS_CANONICAL, compressed=True, block_size=96)
    out = proc.process(
        p,
        negative_film="Kodak Portra 400",
        print_film="Fuji Crystal Archive Maxima",
        **COMMON,
    )
    path = os.path.join(GOLDEN_DIR, "raf_xtrans.npy")
    if REGEN:
        np.save(path, out)
        pytest.skip(f"regenerated {path}")
    assert os.path.exists(path), (
        f"golden {path} missing — generate with R2F_REGEN_GOLDEN=1"
    )
    want = np.load(path)
    assert out.shape == want.shape and out.dtype == np.uint8
    diff = np.abs(out.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1, f"raf golden drift max {diff.max()} codes"


def test_golden_cr3_end_to_end(proc, tmp_path):
    """Seventh golden: a full FILE-to-print render from a deterministic
    CR3 (2-level CRX wavelet payload) — pins the ISO-BMFF track walk, the
    native Rice/run decode, the 5/3 reconstruction, subplane assembly and
    Bayer demosaic alongside the chain."""
    from raw_fixtures import write_cr3_raw

    h, w = 64, 96
    yy, xx = np.mgrid[0:h, 0:w]
    rng = np.random.default_rng(11)
    m = np.clip(
        900 + 11000 * (yy / h) * (0.3 + 0.7 * xx / w) + rng.integers(0, 200, (h, w)),
        0,
        16383,
    ).astype(np.uint16)
    p = str(tmp_path / "g.cr3")
    write_cr3_raw(p, m, levels=2)
    out = proc.process(
        p,
        negative_film="Kodak Portra 400",
        print_film="Fuji Crystal Archive Maxima",
        **COMMON,
    )
    path = os.path.join(GOLDEN_DIR, "cr3_crx.npy")
    if REGEN:
        np.save(path, out)
        pytest.skip(f"regenerated {path}")
    assert os.path.exists(path), (
        f"golden {path} missing — generate with R2F_REGEN_GOLDEN=1"
    )
    want = np.load(path)
    assert out.shape == want.shape and out.dtype == np.uint8
    diff = np.abs(out.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1, f"cr3 golden drift max {diff.max()} codes"


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden_render(name, proc):
    path = os.path.join(GOLDEN_DIR, f"{name}.npy")
    out = proc.process(_scene(), **CASES[name], **COMMON)
    assert out.dtype == np.uint8 and out.shape == (64, 96, 3)
    if REGEN:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, out)
        pytest.skip(f"regenerated {path}")
    assert os.path.exists(path), (
        f"golden {path} missing — generate with R2F_REGEN_GOLDEN=1"
    )
    want = np.load(path)
    diff = np.abs(out.astype(np.int32) - want.astype(np.int32))
    # <=1 code absorbs cross-version XLA:CPU reduction-order noise; any
    # science change moves far more than one code.
    assert diff.max() <= 1, (
        f"{name}: golden drift max {diff.max()} codes at "
        f"{np.unravel_index(diff.argmax(), diff.shape)} "
        f"({(diff > 1).sum()} pixels over)"
    )
