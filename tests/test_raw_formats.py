"""Vendor RAW dialect parsing: NEF / ARW / PEF / ORF / CR2 synthetic fixtures.

Mirrors the reference's 13-format LibRaw ingest surface
(reference: src/raw2film/data.py:87-102, raw_conversion.py:36-48) for the
TIFF-dialect subset this parser owns natively.
"""

import numpy as np
import pytest

from raw2film_tpu.io.dng import read_raw
from raw2film_tpu.native import have_native

from raw_fixtures import write_arw, write_cr2, write_nef, write_orf, write_pef

RNG = np.random.default_rng(21)


def _mosaic(h=40, w=64, bits=14):
    return RNG.integers(0, (1 << bits) - 1, (h, w)).astype(np.uint16)


class TestNEF:
    @pytest.mark.parametrize("bits", [12, 14])
    def test_packed_round_trip(self, tmp_path, bits):
        m = _mosaic(bits=bits)
        p = str(tmp_path / "x.nef")
        write_nef(p, m, bits=bits)
        raw = read_raw(p)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), m)
        assert raw.cfa_pattern == "RGGB"
        assert raw.white_level == (1 << bits) - 1
        assert raw.black_level == 0.0
        assert raw.metadata["EXIF:Make"].startswith("NIKON")
        assert raw.metadata["EXIF:ISO"] == 400


class TestARW:
    def test_sony_pedestal_default(self, tmp_path):
        m = _mosaic(bits=14)
        p = str(tmp_path / "x.arw")
        write_arw(p, m)
        raw = read_raw(p)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), m)
        assert raw.black_level == 512.0  # Sony default pedestal
        assert raw.cfa_pattern == "RGGB"


class TestPEF:
    def test_chained_raw_ifd(self, tmp_path):
        m = _mosaic(bits=12)
        p = str(tmp_path / "x.pef")
        write_pef(p, m)
        raw = read_raw(p)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), m)
        assert raw.metadata["EXIF:Make"] == "PENTAX"


class TestORF:
    def test_olympus_magic(self, tmp_path):
        m = _mosaic(bits=12)
        p = str(tmp_path / "x.orf")
        write_orf(p, m)
        raw = read_raw(p)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), m)


@pytest.mark.skipif(not have_native(), reason="needs native LJPEG codec")
class TestCR2:
    def test_sliced_ljpeg_with_sensor_crop(self, tmp_path):
        h, w = 48, 96
        m = _mosaic(h, w, bits=14)
        pedestal = 512
        m[:, :24] = pedestal  # masked optical-black columns
        p = str(tmp_path / "x.cr2")
        write_cr2(p, m, borders=(24, 4, w - 1, h - 1))
        raw = read_raw(p)
        assert raw.black_level == float(pedestal)
        assert raw.white_level == (1 << 14) - 1  # from SOF3 precision
        np.testing.assert_array_equal(
            raw.data.astype(np.uint16), m[4:, 24:]
        )

    def test_unsliced(self, tmp_path):
        m = _mosaic(40, 50, bits=12)  # odd-ish width -> no slicing
        p = str(tmp_path / "y.cr2")
        write_cr2(p, m)
        raw = read_raw(p)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), m)


class TestUnsupported:
    def test_raf_clear_error(self, tmp_path):
        p = str(tmp_path / "x.raf")
        with open(p, "wb") as f:
            f.write(b"FUJIFILMCCD-RAW " + b"\0" * 64)
        with pytest.raises(NotImplementedError, match="RAF"):
            read_raw(p)

    def test_cr3_clear_error(self, tmp_path):
        p = str(tmp_path / "x.cr3")
        with open(p, "wb") as f:
            f.write(b"\x00\x00\x00\x18ftypcrx " + b"\0" * 64)
        with pytest.raises(NotImplementedError, match="CR3"):
            read_raw(p)

    def test_vendor_compressed_clear_error(self, tmp_path):
        from raw_fixtures import _Ifd, _serialize

        ifd0 = _Ifd()
        ifd0.add(256, 4, [8])
        ifd0.add(257, 4, [8])
        ifd0.add(259, 3, [34713])  # Nikon-compressed
        ifd0.add(262, 3, [32803])
        ifd0.add(273, 4, ("blob", 0))
        ifd0.add(279, 4, [16])
        p = str(tmp_path / "c.nef")
        with open(p, "wb") as f:
            f.write(_serialize([ifd0], [b"\0" * 16]))
        with pytest.raises(NotImplementedError, match="Nikon-compressed"):
            read_raw(p)
