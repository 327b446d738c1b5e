"""Malformed-input robustness: every supported container, truncated at
arbitrary points or with corrupted bytes, must fail with the documented
clean error types (ValueError / NotImplementedError) or decode — never an
internal IndexError/KeyError/struct.error, and never crash the process
(the batch runner isolates per-file failures on exactly these types)."""

from __future__ import annotations

import numpy as np
import pytest

from raw2film_tpu.io.dng import read_raw, write_dng
from raw_fixtures import (
    arw2_walk_mosaic,
    rw2_walk_mosaic,
    write_arw2,
    write_cr2,
    write_nef_compressed,
    write_orf_compressed,
    write_pef_compressed,
    write_raf,
    write_rw2,
)


def _writers(tmp_path):
    m12 = np.random.default_rng(0).integers(0, 4096, (24, 32)).astype(np.uint16)
    out = []
    p = str(tmp_path / "a.dng")
    write_dng(p, m12, white_level=4095)
    out.append(p)
    p = str(tmp_path / "b.dng")
    write_dng(p, m12, white_level=4095, compression=7)
    out.append(p)
    p = str(tmp_path / "c.nef")
    write_nef_compressed(p, m12, bits=12)
    out.append(p)
    p = str(tmp_path / "d.rw2")
    write_rw2(p, rw2_walk_mosaic(20, 28))
    out.append(p)
    p = str(tmp_path / "e.raf")
    write_raf(p, m12)
    out.append(p)
    p = str(tmp_path / "f.arw")
    write_arw2(p, arw2_walk_mosaic(16, 32))
    out.append(p)
    p = str(tmp_path / "g.pef")
    write_pef_compressed(p, m12)
    out.append(p)
    p = str(tmp_path / "h.orf")
    write_orf_compressed(p, m12)
    out.append(p)
    p = str(tmp_path / "i.cr2")
    write_cr2(p, m12)
    out.append(p)
    p = str(tmp_path / "j.raf")  # lossless-compressed payload
    write_raf(p, m12, compressed=True, bits=12, block_size=36)
    out.append(p)
    p = str(tmp_path / "k.rw2")  # v7 straight-streamed packets
    write_rw2(p, np.random.default_rng(2).integers(0, 16384, (18, 36)).astype(np.uint16), raw_format=7, bits=14)
    out.append(p)
    p = str(tmp_path / "l.rw2")  # v6 differential block code
    walk = 0x1800 + np.cumsum(
        np.random.default_rng(3).integers(-120, 121, (12, 33)), axis=1
    )
    walk = 0x400 + np.abs((walk - 0x400) % (2 * 0x2C00) - 0x2C00)
    write_rw2(p, walk.astype(np.uint16), raw_format=6, bits=14)
    out.append(p)
    p = str(tmp_path / "m.crw")  # Canon CIFF compressed payload
    from raw_fixtures import write_crw_raw

    write_crw_raw(p, m12[:24, :32] % 4096)
    out.append(p)
    p = str(tmp_path / "n.cr3")  # Canon CRX payload (2-level wavelet)
    from raw_fixtures import write_cr3_raw

    write_cr3_raw(p, m12[:24, :32], nbits=12, levels=2)
    out.append(p)
    p = str(tmp_path / "o.cr3")  # lossy CRAW (quantized HF subbands)
    write_cr3_raw(p, m12[:24, :32], nbits=12, levels=3, qparam=6)
    out.append(p)
    p = str(tmp_path / "p.nef")  # lossy NEF (0x44 0x20 split trees + curve)
    from raw_fixtures import write_nef_lossy

    write_nef_lossy(p, m12[:24, :32], bits=12, split_row=12)
    out.append(p)
    return out


def test_truncations_fail_cleanly(tmp_path):
    for src in _writers(tmp_path):
        data = open(src, "rb").read()
        for frac in (0.02, 0.1, 0.3, 0.6, 0.9):
            cut = max(4, int(len(data) * frac))
            p = str(tmp_path / "t.bin")
            with open(p, "wb") as f:
                f.write(data[:cut])
            try:
                read_raw(p)
            except (ValueError, NotImplementedError):
                pass  # the documented contract


def test_byte_corruption_fails_cleanly(tmp_path):
    rng = np.random.default_rng(1)
    for src in _writers(tmp_path):
        data = bytearray(open(src, "rb").read())
        for _ in range(6):
            corrupted = bytearray(data)
            for _ in range(8):
                pos = int(rng.integers(0, len(corrupted)))
                corrupted[pos] = int(rng.integers(0, 256))
            p = str(tmp_path / "c.bin")
            with open(p, "wb") as f:
                f.write(corrupted)
            try:
                read_raw(p)
            except (ValueError, NotImplementedError):
                pass


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_codec_stress_round_trips(tmp_path, seed):
    """Property-style stress: every lossless codec round-trips bit-exactly
    across random data, seeds, and shape classes (odd dims, tall/wide)."""
    rng = np.random.default_rng(seed)
    from raw_fixtures import (
        write_dng_tiled,
        write_orf_compressed,
        write_pef_compressed,
    )

    shapes = [(17, 23), (8, 128), (128, 8), (31, 47)]
    for h, w in shapes:
        m12 = rng.integers(0, 4096, (h, w)).astype(np.uint16)
        p = str(tmp_path / "s.pef")
        write_pef_compressed(p, m12)
        np.testing.assert_array_equal(read_raw(p).data.astype(np.uint16), m12)
        p = str(tmp_path / "s.orf")
        write_orf_compressed(p, m12)
        np.testing.assert_array_equal(read_raw(p).data.astype(np.uint16), m12)

    m16 = rng.integers(0, 65536, (44, 76)).astype(np.uint16)
    p = str(tmp_path / "s.dng")
    write_dng_tiled(p, m16, tile_w=32, tile_h=16)
    np.testing.assert_array_equal(read_raw(p).data.astype(np.uint16), m16)

    m14 = rng.integers(0, 16384, (26, 38)).astype(np.uint16)
    write_nef_compressed(str(tmp_path / "s.nef"), m14, bits=14)
    np.testing.assert_array_equal(
        read_raw(str(tmp_path / "s.nef")).data.astype(np.uint16), m14
    )

    m = rw2_walk_mosaic(22, 14 * 5, seed=seed)
    write_rw2(str(tmp_path / "s.rw2"), m)
    np.testing.assert_array_equal(
        read_raw(str(tmp_path / "s.rw2")).data.astype(np.uint16), m
    )

    a = arw2_walk_mosaic(18, 32, seed=seed)
    write_arw2(str(tmp_path / "s.arw"), a)
    np.testing.assert_array_equal(
        read_raw(str(tmp_path / "s.arw")).data.astype(np.uint16),
        (a.astype(np.int64) * 8).astype(np.uint16),
    )

    from raw_fixtures import write_raf

    from raw2film_tpu.io.raf import XTRANS_CANONICAL

    for h, w, pat, bits in [
        (12, 44, None, 12),  # bayer, width not a strip multiple
        (30, 132, XTRANS_CANONICAL, 14),  # xtrans, ragged last strip
        (18, 96, XTRANS_CANONICAL, 16),
    ]:
        mf = rng.integers(0, 1 << bits, (h, w)).astype(np.uint16)
        p = str(tmp_path / "s.raf")
        write_raf(p, mf, xtrans=pat, compressed=True, bits=bits, block_size=48)
        np.testing.assert_array_equal(read_raw(p).data.astype(np.uint16), mf)

    from raw_fixtures import write_crw_raw

    # CRW: uniform-random 12-bit (every run-0 symbol), a short tail band
    # (h % 8 != 0 with (h%8)*w % 64 == 0), and 10-bit impulses over a
    # constant field (long zero runs + max-ssss diffs — exercises the
    # 0xFF skip-one fallback for (run, ssss) pairs absent from the table).
    for table, (h, w) in [(0, (32, 40)), (1, (20, 32)), (2, (16, 48))]:
        mc = rng.integers(0, 4096, (h, w)).astype(np.uint16)
        p = str(tmp_path / "s.crw")
        truth = write_crw_raw(p, mc, table=table)
        np.testing.assert_array_equal(read_raw(p).data.astype(np.uint16), truth)
    imp = np.full((24, 64), 512, np.uint16)
    pos = rng.integers(0, imp.size, 40)
    imp.flat[pos] = rng.integers(0, 1024, 40)
    p = str(tmp_path / "imp.crw")
    truth = write_crw_raw(p, imp, table=seed % 3, lowbits=False)
    np.testing.assert_array_equal(read_raw(p).data.astype(np.uint16), truth)


def test_empty_and_garbage(tmp_path):
    p = str(tmp_path / "x.raw")
    for blob in (b"", b"\0" * 64, b"garbage not a tiff at all padding"):
        with open(p, "wb") as f:
            f.write(blob)
        with pytest.raises((ValueError, NotImplementedError)):
            read_raw(p)
