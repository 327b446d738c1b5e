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
    def test_raf_header_only_clear_error(self, tmp_path):
        p = str(tmp_path / "x.raf")
        with open(p, "wb") as f:
            f.write(b"FUJIFILMCCD-RAW " + b"\0" * 96)
        with pytest.raises(NotImplementedError, match="RAF"):
            read_raw(p)

    def test_raf_unknown_payload_clear_error(self, tmp_path):
        """A payload that matches neither the dump sizes nor the lossless-
        compression header gets a clear error, not garbage."""
        from raw_fixtures import write_raf

        m = _mosaic(24, 36, bits=14)
        p = str(tmp_path / "c.raf")
        write_raf(p, m, style="bare")
        data = bytearray(open(p, "rb").read())
        truncated = data[: len(data) - 24 * 36 * 2 + 100]
        with open(p, "wb") as f:
            f.write(truncated)
        with pytest.raises(NotImplementedError, match="convert to DNG"):
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
        ifd0.add(259, 3, [34712])  # JPEG-2000-class: genuinely unsupported
        ifd0.add(262, 3, [32803])
        ifd0.add(273, 4, ("blob", 0))
        ifd0.add(279, 4, [16])
        p = str(tmp_path / "c.raw")
        with open(p, "wb") as f:
            f.write(_serialize([ifd0], [b"\0" * 16]))
        with pytest.raises(NotImplementedError, match="34712"):
            read_raw(p)

    def test_nikon_compressed_without_makernote_clear_error(self, tmp_path):
        from raw_fixtures import _Ifd, _serialize

        ifd0 = _Ifd()
        ifd0.add(256, 4, [8])
        ifd0.add(257, 4, [8])
        ifd0.add(259, 3, [34713])  # Nikon-compressed, but no MakerNote
        ifd0.add(262, 3, [32803])
        ifd0.add(273, 4, ("blob", 0))
        ifd0.add(279, 4, [16])
        p = str(tmp_path / "c.nef")
        with open(p, "wb") as f:
            f.write(_serialize([ifd0], [b"\0" * 16]))
        with pytest.raises(NotImplementedError, match="MakerNote"):
            read_raw(p)


class TestPanasonicRW2:
    """RW2: magic-85 TIFF dialect + the v4 compressed bitstream
    (r2f_decode_rw2_v4), verified by spec-based synthetic encoder round
    trips (tests/raw_fixtures.py::rw2_v4_compress). Matches the reference's
    LibRaw ingest surface (src/raw2film/raw_conversion.py:36-48)."""

    def test_v4_round_trip_exact(self, tmp_path):
        from raw_fixtures import rw2_walk_mosaic, write_rw2

        m = rw2_walk_mosaic(20, 14 * 10)
        p = str(tmp_path / "a.rw2")
        write_rw2(p, m)
        raw = read_raw(p)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), m)
        assert raw.cfa_pattern == "RGGB"
        # Per-channel blacks collapse to mean + the 15 pedestal.
        assert raw.black_level == 143.0
        assert raw.white_level == 4095.0

    def test_v4_multi_section(self, tmp_path):
        """> 14336 pixels spans two 0x4000-byte sections."""
        from raw_fixtures import rw2_walk_mosaic, write_rw2

        m = rw2_walk_mosaic(40, 14 * 40, seed=3)
        p = str(tmp_path / "b.rw2")
        write_rw2(p, m)
        raw = read_raw(p)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), m)

    def test_border_crop_even_phase(self, tmp_path):
        from raw_fixtures import rw2_walk_mosaic, write_rw2

        m = rw2_walk_mosaic(24, 14 * 12, seed=1)
        p = str(tmp_path / "c.rw2")
        write_rw2(p, m, borders=(2, 4, 22, 164))
        raw = read_raw(p)
        np.testing.assert_array_equal(
            raw.data.astype(np.uint16), m[2:22, 4:164]
        )

    @pytest.mark.parametrize("bits", [12, 14])
    def test_v5_round_trip(self, tmp_path, bits):
        """v5 (RawFormat 5): LSB-first 16-byte bit packets in the rotated
        sections — bit-exact round trip at both depths."""
        from raw_fixtures import write_rw2

        rng = np.random.default_rng(8)
        m = rng.integers(0, 1 << bits, (20, 56)).astype(np.uint16)
        p = str(tmp_path / f"v5_{bits}.rw2")
        write_rw2(p, m, raw_format=5, bits=bits)
        raw = read_raw(p)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), m)
        assert raw.white_level == float((1 << bits) - 1)

    def test_v5_multi_section(self, tmp_path):
        from raw_fixtures import write_rw2

        rng = np.random.default_rng(9)
        m = rng.integers(0, 1 << 14, (60, 560)).astype(np.uint16)  # >1 section
        p = str(tmp_path / "v5big.rw2")
        write_rw2(p, m, raw_format=5, bits=14)
        np.testing.assert_array_equal(read_raw(p).data.astype(np.uint16), m)

    @pytest.mark.parametrize("bits", [12, 14])
    def test_v7_round_trip(self, tmp_path, bits):
        """v7 (RawFormat 7, current S/G bodies): the v5 packets streamed
        straight, no section rotation — bit-exact at both depths."""
        from raw_fixtures import write_rw2

        per = 10 if bits == 12 else 9
        rng = np.random.default_rng(11)
        m = rng.integers(0, 1 << bits, (20, per * 6)).astype(np.uint16)
        p = str(tmp_path / f"v7_{bits}.rw2")
        write_rw2(p, m, raw_format=7, bits=bits)
        raw = read_raw(p)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), m)
        assert raw.white_level == float((1 << bits) - 1)

    @staticmethod
    def _v6_walk(h, w, seed=0):
        """Random walk inside the v6 base-0 regime: 14-bit values well
        above pixel_base (0x200) with same-parity deltas < 0x200."""
        rng = np.random.default_rng(seed)
        m = 0x1800 + np.cumsum(rng.integers(-120, 121, (h, w)), axis=1)
        lo, hi = 0x400, 0x3000
        m = lo + np.abs((m - lo) % (2 * (hi - lo)) - (hi - lo))
        return m.astype(np.uint16)

    def test_v6_round_trip_exact(self, tmp_path):
        """v6 (RawFormat 6, full-frame S bodies): 11-pixel differential
        block code — base-0 blocks round-trip bit-exactly, and the
        in-stream pedestal means the tag black applies without +15."""
        from raw_fixtures import write_rw2

        m = self._v6_walk(20, 11 * 8, seed=21)
        p = str(tmp_path / "v6.rw2")
        write_rw2(p, m, raw_format=6, bits=14)
        raw = read_raw(p)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), m)
        assert raw.white_level == float((1 << 14) - 1)
        assert raw.black_level == 128.0  # no +15 pedestal re-add for v6

    def test_v6_quantized_base_bounded_error(self, tmp_path):
        """base=2 blocks quantize deltas by 4: seeds stay exact, every
        other pixel lands within the quantization step, and the error
        does not accumulate along the row (the coder tracks the decoded
        value, not the target)."""
        from raw_fixtures import rw2_v6_encode

        from raw2film_tpu.io.rw2 import decode_rw2_v6

        m = self._v6_walk(8, 11 * 30, seed=22).astype(np.int64) + 0x1000
        payload = rw2_v6_encode(m, base=2)
        out = decode_rw2_v6(payload, m.shape[1], m.shape[0], 14).astype(np.int64)
        # Seeds (first sample of each parity per 11-block) are exact.
        seeds = np.zeros(m.shape[1], bool)
        seeds[0::11] = seeds[1::11] = True
        np.testing.assert_array_equal(out[:, seeds], m[:, seeds])
        err = np.abs(out - m)
        assert err.max() < 4

    def test_v6_field_layout_matches_libraw_byte_expressions(self):
        """Anti-circularity pin: the 128-bit MSB-first field extraction
        must reproduce the literal per-byte expressions of LibRaw's
        pana_cs6_page_decoder::read_page (the independently recorded
        form of the layout)."""
        from raw2film_tpu.io.rw2 import _v6_extract_fields

        rng = np.random.default_rng(23)
        blocks = rng.integers(0, 256, (64, 16)).astype(np.uint8)
        got = _v6_extract_fields(blocks)
        b = blocks.astype(np.uint32)
        expect = np.stack(
            [
                (b[:, 15] << 6) | (b[:, 14] >> 2),
                (((b[:, 14] & 0x3) << 12) | (b[:, 13] << 4) | (b[:, 12] >> 4))
                & 0x3FFF,
                (b[:, 12] >> 2) & 0x3,
                ((b[:, 12] & 0x3) << 8) | b[:, 11],
                ((b[:, 10] << 2) | (b[:, 9] >> 6)) & 0x3FF,
                ((b[:, 9] & 0x3F) << 4) | (b[:, 8] >> 4),
                (b[:, 8] >> 2) & 0x3,
                ((b[:, 8] & 0x3) << 8) | b[:, 7],
                ((b[:, 6] << 2) | (b[:, 5] >> 6)) & 0x3FF,
                ((b[:, 5] << 4) | (b[:, 4] >> 4)) & 0x3FF,
                (b[:, 4] >> 2) & 0x3,
                ((b[:, 4] & 0x3) << 8) | b[:, 3],
                ((b[:, 2] << 4) | (b[:, 1] >> 4)) & 0x3FF,
                ((b[:, 1] & 0xF) << 6) | (b[:, 0] >> 2),
            ],
            axis=1,
        )
        np.testing.assert_array_equal(got.astype(np.uint32), expect)

    def test_v6_ambiguous_width_clear_error(self, tmp_path):
        from raw2film_tpu.io.rw2 import decode_rw2_v6

        with pytest.raises(NotImplementedError, match="multiple of 11"):
            decode_rw2_v6(b"\0" * 1024, 50, 4, 14)
        with pytest.raises(NotImplementedError, match="14-bit"):
            decode_rw2_v6(b"\0" * 1024, 44, 4, 12)

    def test_exif_subifd_flows(self, tmp_path):
        """RW2's standard ExifIFD (exposure/aperture/lens) must reach the
        metadata dict alongside the Panasonic-private tags."""
        from raw_fixtures import rw2_walk_mosaic, write_rw2

        m = rw2_walk_mosaic(20, 28)
        p = str(tmp_path / "ex.rw2")
        write_rw2(
            p,
            m,
            exif={
                "ExposureTime": (1, 60),
                "FNumber": (28, 10),
                "FocalLength": (250, 10),
                "LensModel": "LUMIX G 25/F1.7",
            },
        )
        md = read_raw(p).metadata
        assert abs(md["EXIF:ExposureTime"] - 1 / 60) < 1e-9
        assert abs(md["EXIF:FNumber"] - 2.8) < 1e-9
        assert abs(md["EXIF:FocalLength"] - 25.0) < 1e-9
        assert md["EXIF:LensModel"] == "LUMIX G 25/F1.7"
        assert md["EXIF:ISO"] == 200  # private tag 0x0017 still wins

    def test_v7_ambiguous_width_clear_error(self, tmp_path):
        """Widths that don't divide into whole packets would make row
        alignment a guess — clear error instead."""
        from raw_fixtures import write_rw2

        m = np.zeros((12, 50), np.uint16)  # 50 % 9 != 0
        p = str(tmp_path / "v7odd.rw2")
        write_rw2(p, m, raw_format=7, bits=14)
        with pytest.raises(NotImplementedError, match="multiple of 9"):
            read_raw(p)

    def test_uncompressed_16bit(self, tmp_path):
        from raw_fixtures import write_rw2

        m = _mosaic(16, 28, bits=12)
        p = str(tmp_path / "d.rw2")
        write_rw2(p, m, raw_format=2)
        raw = read_raw(p)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), m)
        assert raw.metadata["EXIF:Make"] == "Panasonic"

    def test_cfa_variants(self, tmp_path):
        from raw_fixtures import write_rw2

        m = _mosaic(16, 28, bits=12)
        for code, pat in ((2, "GRBG"), (3, "GBRG"), (4, "BGGR")):
            p = str(tmp_path / f"e{code}.rw2")
            write_rw2(p, m, raw_format=2, cfa=code)
            assert read_raw(p).cfa_pattern == pat

    def test_full_pipeline_from_rw2(self, tmp_path):
        """An RW2 renders through the Processor end to end."""
        from raw_fixtures import rw2_walk_mosaic, write_rw2

        from raw2film_tpu.pipeline.processor import Processor

        m = rw2_walk_mosaic(28, 14 * 3, seed=9)
        p = str(tmp_path / "f.rw2")
        write_rw2(p, m)
        out = Processor().process(
            p, "Kodak Portra 400", grain=0, half_size=False, max_scale=None
        )
        assert out.dtype == np.uint8 and out.shape[2] == 3
        assert out.std() > 1.0  # actual image content


class TestTiledDNG:
    """Tiled lossless-JPEG DNGs (the camera/Adobe layout): tiles decode in
    PARALLEL through the GIL-releasing native decoder and reassemble
    exactly, including ragged edge tiles."""

    def test_round_trip_exact(self, tmp_path):
        from raw_fixtures import write_dng_tiled

        rng = np.random.default_rng(12)
        m = rng.integers(0, 65535, (80, 150)).astype(np.uint16)  # ragged edges
        p = str(tmp_path / "t.dng")
        write_dng_tiled(p, m, tile_w=64, tile_h=32)
        raw = read_raw(p)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), m)
        assert raw.cfa_pattern == "RGGB"

    def test_single_tile(self, tmp_path):
        from raw_fixtures import write_dng_tiled

        m = _mosaic(32, 64, bits=14)
        p = str(tmp_path / "s.dng")
        write_dng_tiled(p, m, tile_w=64, tile_h=32)
        np.testing.assert_array_equal(read_raw(p).data.astype(np.uint16), m)


class TestCR3Container:
    """CR3 raw payloads (CRX) stay unsupported, but the ISO-BMFF container
    serves browsing: PRVW/THMB preview JPEGs + CMT1 EXIF metadata."""

    def _jpeg(self):
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (32, 24), (200, 120, 40)).save(buf, format="JPEG")
        return buf.getvalue()

    def test_preview_and_metadata(self, tmp_path):
        from raw_fixtures import write_cr3

        from raw2film_tpu.io import cr3

        p = str(tmp_path / "a.cr3")
        write_cr3(p, self._jpeg(), model="Canon EOS R6")
        buf = open(p, "rb").read()
        assert cr3.is_cr3(buf)
        jpg = cr3.extract_preview(buf)
        assert jpg is not None and jpg[:2] == b"\xff\xd8"
        meta = cr3.extract_metadata(buf)
        assert meta["EXIF:Model"] == "Canon EOS R6"
        assert meta["EXIF:ISO"] == 800

    def test_thumbnail_from_cr3(self, tmp_path):
        from raw_fixtures import write_cr3

        from raw2film_tpu.io.thumbnail import extract_thumb

        p = str(tmp_path / "b.cr3")
        write_cr3(p, self._jpeg())
        thumb = extract_thumb(p)
        assert thumb.ndim == 3 and thumb.shape[2] == 3
        # The preview's dominant color comes through.
        assert thumb[..., 0].mean() > thumb[..., 2].mean()

    def test_no_raw_track_clear_error_mentions_browsing(self, tmp_path):
        """A CR3 without a CRAW track (the browse-only fixture) must raise
        a clear error that points at the still-working browsing surfaces —
        CRX payload decode itself is covered by TestCRXDecode."""
        from raw_fixtures import write_cr3

        p = str(tmp_path / "c.cr3")
        write_cr3(p, self._jpeg())
        with pytest.raises(NotImplementedError, match="browsing"):
            read_raw(p)


class TestOlympusCompressed:
    """Olympus-compressed ORF: carry-filter + w/n/nw gradient-predictor
    bitstream (fixed canonical Huffman for the magnitude), verified by
    spec-based encoder round trips. Detected by the 65536 tag or — as on
    real bodies — by an undersized Compression=1 strip."""

    def test_round_trip_exact_random(self, tmp_path):
        from raw_fixtures import write_orf_compressed

        m = _mosaic(24, 36, bits=12)
        p = str(tmp_path / "a.orf")
        write_orf_compressed(p, m)
        raw = read_raw(p)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), m)
        assert raw.cfa_pattern == "RGGB"

    def test_round_trip_smooth_carry_filter(self, tmp_path):
        """Smooth data drives the adaptive-nbits carry filter through its
        small-delta regime (carry[2] saturation path)."""
        from raw_fixtures import write_orf_compressed

        yy, xx = np.mgrid[0:40, 0:56]
        m = (2000 + 500 * np.sin(xx / 6) + 300 * np.cos(yy / 5)).astype(
            np.uint16
        )
        p = str(tmp_path / "s.orf")
        write_orf_compressed(p, m)
        np.testing.assert_array_equal(read_raw(p).data.astype(np.uint16), m)

    def test_compression1_size_detection(self, tmp_path):
        """Real Olympus bodies leave Compression=1 on compressed payloads;
        the undersized strip triggers the compressed decode."""
        from raw_fixtures import _Ifd, _serialize, orf_compress

        yy, xx = np.mgrid[0:16, 0:24]
        m = (1000 + 40 * xx + 25 * yy).astype(np.uint16)  # smooth: compresses
        payload = orf_compress(m)
        assert len(payload) < 16 * 24 * 3 // 2  # below 12-bit packing
        ifd0 = _Ifd()
        ifd0.add(256, 4, [24])
        ifd0.add(257, 4, [16])
        ifd0.add(258, 3, [12])
        ifd0.add(259, 3, [1])
        ifd0.add(262, 3, [32803])
        ifd0.add(271, 2, "OLYMPUS CORPORATION")
        ifd0.add(273, 4, ("blob", 0))
        ifd0.add(279, 4, [len(payload)])
        ifd0.add(33421, 3, [2, 2])
        ifd0.add(33422, 1, [0, 1, 1, 2])
        import struct as _struct

        blob = bytearray(_serialize([ifd0], [payload]))
        _struct.pack_into("<H", blob, 2, 0x4F52)
        p = str(tmp_path / "c1.orf")
        with open(p, "wb") as f:
            f.write(blob)
        np.testing.assert_array_equal(read_raw(p).data.astype(np.uint16), m)

    def test_full_pipeline_from_orf(self, tmp_path):
        from raw_fixtures import write_orf_compressed

        from raw2film_tpu.pipeline.processor import Processor

        m = (_mosaic(24, 36, bits=12) // 2 + 256).astype(np.uint16)
        p = str(tmp_path / "p.orf")
        write_orf_compressed(p, m)
        out = Processor().process(
            p, "Kodak Portra 400", grain=0, half_size=False, max_scale=None
        )
        assert out.dtype == np.uint8 and out.shape[2] == 3


class TestPentaxCompressed:
    """Pentax-Huffman PEF (Compression 65535): in-file Huffman table from
    MakerNote 0x0220 + NEF-style predictors, verified by spec-based
    encoder round trips."""

    def test_round_trip_exact(self, tmp_path):
        from raw_fixtures import write_pef_compressed

        m = _mosaic(24, 36, bits=12)
        p = str(tmp_path / "a.pef")
        write_pef_compressed(p, m)
        raw = read_raw(p)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), m)
        assert raw.cfa_pattern == "RGGB"
        assert raw.white_level == 4095.0

    def test_gradient_and_flat(self, tmp_path):
        from raw_fixtures import write_pef_compressed

        yy, xx = np.mgrid[0:20, 0:32]
        m = ((xx * 100 + yy * 7) % 4096).astype(np.uint16)
        m[10:14] = 2000
        p = str(tmp_path / "g.pef")
        write_pef_compressed(p, m)
        raw = read_raw(p)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), m)

    def test_missing_makernote_clear_error(self, tmp_path):
        from raw_fixtures import _Ifd, _serialize, pef_compress

        m = _mosaic(8, 8, bits=12)
        payload, _ = pef_compress(m)
        ifd0 = _Ifd()
        ifd0.add(256, 4, [8])
        ifd0.add(257, 4, [8])
        ifd0.add(259, 3, [65535])
        ifd0.add(262, 3, [32803])
        ifd0.add(273, 4, ("blob", 0))
        ifd0.add(279, 4, [len(payload)])
        p = str(tmp_path / "m.pef")
        with open(p, "wb") as f:
            f.write(_serialize([ifd0], [payload]))
        with pytest.raises(NotImplementedError, match="MakerNote"):
            read_raw(p)

    def test_full_pipeline_from_pef(self, tmp_path):
        from raw_fixtures import write_pef_compressed

        from raw2film_tpu.pipeline.processor import Processor

        m = (_mosaic(24, 36, bits=12) // 2 + 512).astype(np.uint16)
        p = str(tmp_path / "p.pef")
        write_pef_compressed(p, m)
        out = Processor().process(
            p, "Kodak Portra 400", grain=0, half_size=False, max_scale=None
        )
        assert out.dtype == np.uint8 and out.shape[2] == 3


class TestSonyARW2:
    """Sony cRAW (Compression 32767): 16-byte blocks of 16 same-phase
    pixels (11-bit max/min + 7-bit shifted deltas), verified by spec-based
    synthetic encoder round trips. The decompanding curve defaults to the
    linear no-tone-tag expansion (the SR2 tone curve lives in Sony's
    encrypted maker region — documented limitation in io/dng.py)."""

    def test_round_trip_exact(self, tmp_path):
        from raw_fixtures import arw2_walk_mosaic, write_arw2

        m = arw2_walk_mosaic(20, 64)
        p = str(tmp_path / "a.arw")
        write_arw2(p, m)
        raw = read_raw(p)
        # Default curve: pix -> pix * 8 (14-bit linear).
        want = (m.astype(np.int64) * 8).astype(np.uint16)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), want)
        assert raw.cfa_pattern == "RGGB"
        assert raw.black_level == 512.0  # Sony pedestal default
        assert raw.white_level == 16383.0

    def test_block_extremes_and_flat(self, tmp_path):
        """imax/imin escape values are exact even when deltas quantize;
        flat blocks hit the imax==imin tie path."""
        from raw_fixtures import write_arw2

        m = np.full((4, 64), 1000, np.uint16)
        m[1, :] = 37  # flat rows at two levels
        m[2, 0] = 0x7FF  # one extreme per block phase
        m[2, 33] = 0
        p = str(tmp_path / "b.arw")
        write_arw2(p, m)
        raw = read_raw(p)
        got = raw.data.astype(np.uint16)
        np.testing.assert_array_equal(got[0], 8000)
        np.testing.assert_array_equal(got[1], 37 * 8)
        assert got[2, 0] == 0x7FF * 8 and got[2, 33] == 0

    def test_quantized_blocks_bounded_error(self):
        """Blocks spanning > 127 codes quantize like the camera encoder:
        reconstruction error bounded by the shift step."""
        from raw_fixtures import arw2_compress

        from raw2film_tpu.native import decode_arw2

        rng = np.random.default_rng(4)
        m = rng.integers(0, 0x800, (8, 64)).astype(np.uint16)  # wild spans
        got = decode_arw2(arw2_compress(m), 64, 8)
        err = np.abs(got.astype(np.int64) // 8 - m.astype(np.int64))
        assert err.max() <= 15  # sh <= 4 -> step 16, floor error < 16

    def test_sr2_tone_curve_decrypt(self, tmp_path):
        """The encrypted SR2 region round-trips: sony_decrypt pad stream,
        MakerNote 0x7200/01/21 discovery, SR2SubIFD 0x7010 knots, and the
        slope-doubling curve expansion all verified end to end."""
        from raw_fixtures import arw2_walk_mosaic, write_arw2

        from raw2film_tpu.io.sr2 import build_sony_curve

        m = arw2_walk_mosaic(16, 64, seed=2)
        knots = [800, 1600, 2400, 3200]
        p = str(tmp_path / "sr2.arw")
        write_arw2(p, m, sr2_curve_knots=knots)
        raw = read_raw(p)
        curve = build_sony_curve(knots)
        want = (curve[(m.astype(np.int64) << 1) & 0xFFF] >> 2).astype(np.uint16)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), want)
        assert raw.metadata.get("EXIF:SonyToneCurve") == "sr2"
        assert raw.white_level == float(int(curve[4094]) >> 2)

    def test_sr2_garbage_falls_back_linear(self, tmp_path):
        """A corrupted SR2 region (wrong key -> garbage IFD) must fall back
        to the linear expansion, never fail the decode."""
        from raw_fixtures import arw2_walk_mosaic, write_arw2

        m = arw2_walk_mosaic(12, 64, seed=3)
        p = str(tmp_path / "bad.arw")
        write_arw2(p, m, sr2_curve_knots=[800, 1600, 2400, 3200])
        import struct

        blob = bytearray(open(p, "rb").read())
        pos = blob.find(b"SONY DSC")
        # Corrupt the stored key (tag 0x7221 entry value).
        kpos = blob.find(struct.pack("<HHI", 0x7221, 4, 1), pos)
        assert kpos > 0
        blob[kpos + 8 : kpos + 12] = b"\xde\xad\xbe\xef"
        with open(p, "wb") as f:
            f.write(blob)
        raw = read_raw(p)
        want = (m.astype(np.int64) * 8).astype(np.uint16)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), want)
        assert "EXIF:SonyToneCurve" not in raw.metadata

    def test_sony_decrypt_involution(self):
        from raw2film_tpu.io.sr2 import sony_decrypt

        data = bytes(range(256)) * 3
        assert sony_decrypt(sony_decrypt(data, 0x5EED), 0x5EED) == data
        assert sony_decrypt(data, 1) != sony_decrypt(data, 2)

    def test_full_pipeline_from_arw2(self, tmp_path):
        from raw_fixtures import arw2_walk_mosaic, write_arw2

        from raw2film_tpu.pipeline.processor import Processor

        m = arw2_walk_mosaic(32, 64, seed=7)
        p = str(tmp_path / "c.arw")
        write_arw2(p, m)
        out = Processor().process(
            p, "Kodak Portra 400", grain=0, half_size=False, max_scale=None
        )
        assert out.dtype == np.uint8 and out.shape[2] == 3


class TestFujiRAF:
    """RAF container (offset table + CFA-header records + embedded Fuji
    TIFF), Bayer and X-Trans, both container generations. Matches the
    reference's LibRaw ingest surface (src/raw2film/raw_conversion.py:36-48)."""

    def test_bayer_tiff_style(self, tmp_path):
        from raw_fixtures import write_raf

        m = _mosaic(24, 36, bits=14)
        p = str(tmp_path / "a.raf")
        write_raf(p, m, model="GFX 100")
        raw = read_raw(p)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), m)
        assert raw.cfa_pattern == "RGGB"
        assert raw.black_level == 1022.0
        assert raw.metadata["EXIF:Model"] == "GFX 100"

    def test_xtrans_both_styles(self, tmp_path):
        from raw_fixtures import write_raf

        from raw2film_tpu.io.raf import XTRANS_CANONICAL

        m = _mosaic(24, 36, bits=14)
        for style in ("tiff", "bare"):
            p = str(tmp_path / f"x_{style}.raf")
            write_raf(p, m, xtrans=XTRANS_CANONICAL, style=style)
            raw = read_raw(p)
            np.testing.assert_array_equal(raw.data.astype(np.uint16), m)
            assert raw.cfa_pattern == XTRANS_CANONICAL

    def test_exif_from_embedded_preview_jpeg(self, tmp_path):
        """RAF carries the shot EXIF only inside its preview JPEG's APP1
        segment — ISO/FocalLength/LensModel must flow into metadata (they
        feed auto exposure and lens-profile matching)."""
        from raw_fixtures import exif_jpeg, write_raf

        m = _mosaic(24, 36, bits=14)
        p = str(tmp_path / "e.raf")
        write_raf(
            p,
            m,
            model="X-T5",
            preview_jpeg=exif_jpeg(
                iso=1600, focal=56.0, fnumber=1.2, lens="XF56mmF1.2 R"
            ),
        )
        raw = read_raw(p)
        md = raw.metadata
        assert md["EXIF:ISO"] == 1600
        assert abs(md["EXIF:FocalLength"] - 56.0) < 1e-6
        assert abs(md["EXIF:FNumber"] - 1.2) < 1e-6
        assert md["EXIF:LensModel"] == "XF56mmF1.2 R"
        assert md["EXIF:Model"] == "X-T5"

    def test_xtrans_masked_demosaic_accuracy(self):
        """On a smooth per-channel gradient scene the masked interpolation
        must reconstruct each plane closely (it holds exact values at
        native sites and blends neighbors elsewhere)."""
        from raw2film_tpu.io.raf import XTRANS_CANONICAL
        from raw2film_tpu.ops.demosaic import demosaic_masked

        h, w = 36, 48
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        planes = np.stack(
            [
                0.2 + 0.5 * xx / w,
                0.3 + 0.4 * yy / h,
                0.6 - 0.4 * xx / w,
            ]
        )
        code = {"R": 0, "G": 1, "B": 2}
        grid = np.array([code[c] for c in XTRANS_CANONICAL]).reshape(6, 6)
        full = np.tile(grid, (h // 6, w // 6))
        mosaic = np.take_along_axis(
            planes, full[None], axis=0
        )[0].astype(np.float32)
        import jax.numpy as jnp

        rgb = np.asarray(
            demosaic_masked(jnp.asarray(mosaic), XTRANS_CANONICAL, 6, 6)
        )
        assert np.isfinite(rgb).all()
        interior = np.s_[:, 4:-4, 4:-4]
        err = np.abs(rgb - planes)[interior]
        # Color-difference interpolation reconstructs smooth gradients to
        # ~2e-3 (direct channel interpolation managed ~2e-2).
        assert err.max() < 0.005, err.max()
        # Native sites are exact.
        for c in range(3):
            sel = full == c
            np.testing.assert_allclose(
                rgb[c][sel], mosaic[sel], rtol=0, atol=1e-6
            )

    def test_full_pipeline_from_xtrans_raf(self, tmp_path):
        from raw_fixtures import write_raf

        from raw2film_tpu.io.raf import XTRANS_CANONICAL
        from raw2film_tpu.pipeline.processor import Processor

        m = (_mosaic(36, 48, bits=14) // 2 + 2048).astype(np.uint16)
        p = str(tmp_path / "p.raf")
        write_raf(p, m, xtrans=XTRANS_CANONICAL)
        out = Processor().process(
            p, "Kodak Portra 400", grain=0, half_size=False, max_scale=None
        )
        assert out.dtype == np.uint8 and out.shape[2] == 3


class TestFujiCompressed:
    """Fuji lossless-compressed RAF (the default on modern X/GFX bodies):
    spec-based synthetic encoder (tests/raw_fixtures.py::fuji_compress)
    round-tripped through the threaded native strip decoder — the same
    methodology as the NEF/RW2/ORF/PEF codecs. The schedule is
    reconstructed from the format's public structure and cross-checked
    geometrically (interpolated cells == CFA-unused cells); real-file
    verification is pending, and a mismatch aborts cleanly (see
    native/r2f_native.cc). Matches the reference's LibRaw ingest surface
    (src/raw2film/raw_conversion.py:36-48)."""

    @pytest.mark.parametrize("bits", [12, 14, 16])
    def test_bayer_round_trip_exact(self, tmp_path, bits):
        from raw_fixtures import write_raf

        m = _mosaic(24, 96, bits=bits)
        p = str(tmp_path / "b.raf")
        write_raf(p, m, compressed=True, bits=bits, block_size=48)
        raw = read_raw(p)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), m)
        assert raw.cfa_pattern == "RGGB"
        assert raw.white_level == float((1 << bits) - 1)

    def test_xtrans_round_trip_exact_multistrip(self, tmp_path):
        from raw_fixtures import write_raf

        from raw2film_tpu.io.raf import XTRANS_CANONICAL

        m = _mosaic(36, 240, bits=14)  # 240 = 5 strips of 48
        p = str(tmp_path / "x.raf")
        write_raf(
            p, m, xtrans=XTRANS_CANONICAL, compressed=True, block_size=48
        )
        raw = read_raw(p)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), m)
        assert raw.cfa_pattern == XTRANS_CANONICAL

    def test_xtrans_width_not_multiple_of_six(self, tmp_path):
        """rounded_width > width: the padded tail columns decode but are
        cropped from the output."""
        from raw_fixtures import write_raf

        from raw2film_tpu.io.raf import XTRANS_CANONICAL

        m = _mosaic(24, 56, bits=14)  # rounded to 60
        p = str(tmp_path / "pad.raf")
        write_raf(
            p, m, xtrans=XTRANS_CANONICAL, compressed=True, block_size=60
        )
        raw = read_raw(p)
        assert raw.data.shape == (24, 56)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), m)

    def test_smooth_and_flat_scenes(self, tmp_path):
        """Smooth gradients exercise the small-residual regime (short
        codes, gradient-context adaptation); flat fields the zero-residual
        fast path."""
        from raw_fixtures import write_raf

        from raw2film_tpu.io.raf import XTRANS_CANONICAL

        h, w = 24, 96
        yy, xx = np.mgrid[0:h, 0:w]
        smooth = (2000 + 40 * xx + 25 * yy).astype(np.uint16)
        flat = np.full((h, w), 8191, np.uint16)
        for name, m in [("smooth", smooth), ("flat", flat)]:
            p = str(tmp_path / f"{name}.raf")
            write_raf(
                p, m, xtrans=XTRANS_CANONICAL, compressed=True, block_size=96
            )
            raw = read_raw(p)
            np.testing.assert_array_equal(raw.data.astype(np.uint16), m)

    def test_extremes_round_trip(self, tmp_path):
        """Alternating min/max values drive the raw-escape path (unary run
        past the threshold) and the modular wraparound."""
        from raw_fixtures import write_raf

        m = np.zeros((12, 48), np.uint16)
        m[::2, ::2] = 16383
        m[1::2, 1::2] = 16383
        p = str(tmp_path / "e.raf")
        write_raf(p, m, compressed=True, block_size=48)
        raw = read_raw(p)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), m)

    def test_concurrent_decodes_are_independent(self, tmp_path):
        """The BatchRunner decode pool calls the native decoder from
        several worker threads at once (the ctypes call releases the GIL
        and the decoder threads internally) — concurrent results must
        match serial ones bit-exactly."""
        from concurrent.futures import ThreadPoolExecutor

        from raw_fixtures import write_raf

        from raw2film_tpu.io.raf import XTRANS_CANONICAL

        rng = np.random.default_rng(13)
        paths, wants = [], []
        for k in range(4):
            m = rng.integers(0, 1 << 14, (24, 96)).astype(np.uint16)
            p = str(tmp_path / f"c{k}.raf")
            write_raf(p, m, xtrans=XTRANS_CANONICAL, compressed=True, block_size=48)
            paths.append(p)
            wants.append(m)
        with ThreadPoolExecutor(4) as ex:
            got = list(ex.map(lambda p: read_raw(p).data.astype(np.uint16), paths))
        for g, w in zip(got, wants):
            np.testing.assert_array_equal(g, w)

    def test_corrupt_stream_aborts_cleanly(self, tmp_path):
        """Bit corruption must hit the code-range/consumption guards and
        raise, never return garbage silently."""
        from raw_fixtures import write_raf

        from raw2film_tpu.io.raf import XTRANS_CANONICAL

        m = _mosaic(24, 96, bits=14)
        p = str(tmp_path / "c.raf")
        write_raf(
            p, m, xtrans=XTRANS_CANONICAL, compressed=True, block_size=96
        )
        data = bytearray(open(p, "rb").read())
        # Stomp the middle of the strip data with 0xFF (long unary runs
        # and out-of-range escapes).
        data[-200:-100] = b"\xff" * 100
        with open(p, "wb") as f:
            f.write(data)
        with pytest.raises((NotImplementedError, ValueError)):
            read_raw(p)

    def test_full_pipeline_from_compressed_xtrans(self, tmp_path):
        from raw_fixtures import write_raf

        from raw2film_tpu.io.raf import XTRANS_CANONICAL
        from raw2film_tpu.pipeline.processor import Processor

        m = (_mosaic(36, 96, bits=14) // 2 + 2048).astype(np.uint16)
        p = str(tmp_path / "p.raf")
        write_raf(
            p, m, xtrans=XTRANS_CANONICAL, compressed=True, block_size=96
        )
        out = Processor().process(
            p, "Kodak Portra 400", grain=0, half_size=False, max_scale=None
        )
        assert out.dtype == np.uint8 and out.shape[2] == 3


class TestCRWContainer:
    """CRW (CIFF) browsing: thumbnail + identification from the heap;
    payload decode is covered by TestCRWDecode. Matches the reference's
    LibRaw ingest surface (src/raw2film/raw_conversion.py:36-48,
    extension list data.py:87-102)."""

    def _jpeg(self):
        from PIL import Image
        import io as _io

        im = Image.new("RGB", (32, 24), (180, 90, 40))
        b = _io.BytesIO()
        im.save(b, "JPEG")
        return b.getvalue()

    def test_browse_and_clear_error_without_payload(self, tmp_path):
        from raw_fixtures import write_crw

        from raw2film_tpu.io import crw

        p = str(tmp_path / "d60.crw")
        write_crw(p, self._jpeg(), model="Canon EOS D60")
        buf = open(p, "rb").read()
        assert crw.is_crw(buf)
        jpg = crw.extract_preview(buf)
        assert jpg and jpg[:2] == b"\xff\xd8"
        meta = crw.extract_metadata(buf)
        assert meta["EXIF:Make"] == "Canon"
        assert meta["EXIF:Model"] == "Canon EOS D60"
        assert meta["EXIF:DateTimeOriginal"].startswith("2002:")
        # Browse-only fixture has no SensorInfo/payload: clean ValueError,
        # not a deep parser crash.
        with pytest.raises(ValueError, match="SensorInfo"):
            read_raw(p)

    def test_thumbnail_from_crw(self, tmp_path):
        from raw_fixtures import write_crw

        from raw2film_tpu.io.thumbnail import extract_thumb

        p = str(tmp_path / "t.crw")
        write_crw(p, self._jpeg())
        th = extract_thumb(p)
        assert th.ndim == 3 and th.shape[2] == 3 and th.shape[0] <= 256

    def test_truncated_heap_safe(self, tmp_path):
        from raw_fixtures import write_crw

        from raw2film_tpu.io import crw

        p = str(tmp_path / "x.crw")
        write_crw(p, self._jpeg())
        buf = open(p, "rb").read()
        for cut in (10, 20, 40, len(buf) - 3):
            assert crw.extract_metadata(buf[:cut]) is not None  # no crash
            crw.extract_preview(buf[:cut])


class TestCRWDecode:
    """Canon CRW compressed-raw decode: spec-based synthetic encoder
    (tests/raw_fixtures.py::write_crw_raw pins the codec structure — the
    64-pixel Huffman diff blocks, DC carry, per-row 512 bases, 0xFF byte
    stuffing, 2-bit low-bits plane) round-trips bit-exactly through the
    native decoder. Parity target: the reference ingests CRW via LibRaw
    (src/raw2film/raw_conversion.py:36-48)."""

    def _mosaic(self, h, w, bits, seed=0):
        rng = np.random.default_rng(seed)
        # Smooth ramp + noise: realistic diff statistics (short runs,
        # mixed symbol sizes) without saturating the ssss range.
        ramp = (
            np.linspace(200, (1 << bits) - 300, w)[None, :]
            + np.linspace(0, 80, h)[:, None]
        )
        noise = rng.normal(0, 25, (h, w))
        return np.clip(ramp + noise, 0, (1 << bits) - 1).astype(np.uint16)

    @pytest.mark.parametrize("table", [0, 1, 2])
    def test_lowbits_roundtrip_all_tables(self, tmp_path, table):
        from raw_fixtures import write_crw_raw

        p = str(tmp_path / f"t{table}.crw")
        truth = write_crw_raw(p, self._mosaic(128, 128, 12, seed=table), table=table)
        raw = read_raw(p)
        assert raw.cfa_pattern == "RGGB"
        assert raw.white_level == 4095.0
        np.testing.assert_array_equal(raw.data.astype(np.uint16), truth)

    def test_10bit_no_lowbits_roundtrip(self, tmp_path):
        from raw_fixtures import write_crw_raw

        p = str(tmp_path / "g1.crw")
        truth = write_crw_raw(
            p, self._mosaic(256, 256, 10, seed=7), table=1, lowbits=False
        )
        raw = read_raw(p)
        assert raw.white_level == 1023.0
        np.testing.assert_array_equal(raw.data.astype(np.uint16), truth)

    def test_active_area_crop_and_masked_black(self, tmp_path):
        from raw_fixtures import write_crw_raw

        h, w = 64, 160
        mosaic = self._mosaic(h, w, 12, seed=3)
        mosaic[:, :8] = 130  # optically black columns
        p = str(tmp_path / "crop.crw")
        truth = write_crw_raw(p, mosaic, borders=(8, 2, w - 1, h - 3))
        raw = read_raw(p)
        assert raw.data.shape == (h - 4, w - 8)
        np.testing.assert_array_equal(
            raw.data.astype(np.uint16), truth[2 : h - 2, 8:w]
        )
        assert raw.black_level == 130.0
        assert raw.metadata["EXIF:SensorLeftBorder"] == 8

    def test_corrupt_stream_clear_error(self, tmp_path):
        from raw_fixtures import write_crw_raw

        p = str(tmp_path / "bad.crw")
        write_crw_raw(p, self._mosaic(128, 128, 12), table=0)
        buf = bytearray(open(p, "rb").read())
        # Clobber the Huffman stream (past the low-bits plane) with noise
        # that decodes to overflowing values under any table.
        off = 540 + 128 * 128 // 4
        rng = np.random.default_rng(11)
        buf[off : off + 2000] = rng.integers(0, 255, 2000, np.uint8).tobytes()
        p2 = str(tmp_path / "bad2.crw")
        open(p2, "wb").write(bytes(buf))
        with pytest.raises((NotImplementedError, ValueError)):
            read_raw(p2)

    def test_crw_to_print_smoke(self, tmp_path):
        from raw_fixtures import write_crw_raw

        from raw2film_tpu.pipeline.processor import Processor

        p = str(tmp_path / "shot.crw")
        write_crw_raw(p, self._mosaic(96, 128, 12, seed=5))
        out = Processor().process(
            p, "Kodak Portra 400", grain=0, half_size=False, max_scale=None
        )
        assert out.dtype == np.uint8 and out.shape[2] == 3


class TestCRXDecode:
    """Canon CR3 (CRX) raw decode: spec-based synthetic encoder
    (tests/raw_fixtures.py::write_cr3_raw pins the implemented architecture
    — CRAW track + CMP1 codec box, tile/plane/subband mdat records, four
    CFA subplanes, optional LeGall 5/3 levels, adaptive Golomb-Rice with
    the zero-run mode) round-trips bit-exactly through the native decoder.
    Parity target: the reference ingests CR3 via LibRaw
    (src/raw2film/raw_conversion.py:36-48; data.py:92). Bit-level
    constants are r2f's reconstruction from format knowledge: real-camera
    compatibility is unverified (documented in io/crx.py) and guarded by
    clean-abort checks the corrupt-stream tests exercise."""

    def _mosaic(self, h, w, bits=14, seed=0):
        rng = np.random.default_rng(seed)
        ramp = (
            np.linspace(600, (1 << bits) - 900, w)[None, :]
            + np.linspace(0, 400, h)[:, None]
        )
        noise = rng.normal(0, 60, (h, w))
        m = np.clip(ramp + noise, 0, (1 << bits) - 1).astype(np.uint16)
        m[: h // 5] = 1 << (bits - 3)  # flat region: exercises HF zero runs
        return m

    @pytest.mark.parametrize("levels", [0, 1, 3])
    def test_round_trip_exact(self, tmp_path, levels):
        from raw_fixtures import write_cr3_raw

        p = str(tmp_path / f"l{levels}.cr3")
        truth = self._mosaic(96, 144, seed=levels)
        write_cr3_raw(p, truth, levels=levels)
        raw = read_raw(p)
        assert raw.cfa_pattern == "RGGB"
        assert raw.white_level == 16383.0
        np.testing.assert_array_equal(raw.data, truth)
        assert raw.metadata.get("EXIF:Model") == "Canon EOS R3"

    @pytest.mark.parametrize("bits", [12, 14, 16])
    def test_bit_depths(self, tmp_path, bits):
        from raw_fixtures import write_cr3_raw

        p = str(tmp_path / f"b{bits}.cr3")
        truth = self._mosaic(64, 96, bits=bits, seed=bits)
        write_cr3_raw(p, truth, nbits=bits, levels=2)
        raw = read_raw(p)
        assert raw.white_level == float((1 << bits) - 1)
        np.testing.assert_array_equal(raw.data, truth)

    def test_extremes_and_plane_dims_not_multiple_of_levels(self, tmp_path):
        """All-black / all-white frames (maximum run lengths + wavelet
        overshoot at the bias edges) and subplane dims that don't divide
        by 2^levels (odd band splits at every level)."""
        from raw_fixtures import write_cr3_raw

        for val, name in ((0, "black"), (16383, "white")):
            p = str(tmp_path / f"{name}.cr3")
            truth = np.full((62, 90), val, np.uint16)
            write_cr3_raw(p, truth, levels=3)
            np.testing.assert_array_equal(read_raw(p).data, truth)

    def test_cfa_layouts(self, tmp_path):
        from raw_fixtures import write_cr3_raw

        p = str(tmp_path / "gbrg.cr3")
        truth = self._mosaic(64, 96, seed=9)
        write_cr3_raw(p, truth, levels=1, cfa_layout=2)
        raw = read_raw(p)
        assert raw.cfa_pattern == "GBRG"
        np.testing.assert_array_equal(raw.data, truth)

    @pytest.mark.parametrize(
        "grid,levels", [((2, 1), 2), ((3, 1), 1), ((2, 2), 3), ((1, 2), 0)]
    )
    def test_multi_tile_round_trip(self, tmp_path, grid, levels):
        """Tiled frames (one 0xFF01 record run per tile, raster order —
        the layout high-MP bodies use, incl. uneven edge tiles from a
        3-column split) reassemble bit-exactly."""
        from raw_fixtures import write_cr3_raw

        cols, rows = grid
        p = str(tmp_path / f"t{cols}x{rows}.cr3")
        truth = self._mosaic(96, 132, seed=cols * 10 + rows)
        write_cr3_raw(p, truth, levels=levels, tile_cols=cols, tile_rows=rows)
        raw = read_raw(p)
        np.testing.assert_array_equal(raw.data, truth)

    def test_parallel_band_decode_identical(self, tmp_path, monkeypatch):
        """Band decodes fan out over a thread pool on multi-core hosts
        (every band's byte span is known before any entropy decode); the
        pooled result must be bit-identical to the sequential path. Forced
        via R2F_DECODE_THREADS since CI runs on one core."""
        from raw_fixtures import write_cr3_raw

        truth = self._mosaic(96, 132, seed=3)
        p1 = str(tmp_path / "seq.cr3")
        p2 = str(tmp_path / "par.cr3")
        write_cr3_raw(p1, truth, levels=2, tile_cols=2)
        write_cr3_raw(p2, truth, levels=2, tile_cols=2)
        monkeypatch.setenv("R2F_DECODE_THREADS", "1")
        seq = read_raw(p1).data
        monkeypatch.setenv("R2F_DECODE_THREADS", "4")
        par = read_raw(p2).data
        np.testing.assert_array_equal(seq, par)
        np.testing.assert_array_equal(par, truth)

    def test_multi_tile_lossy(self, tmp_path):
        from raw2film_tpu.io.crx import _Q_DEN, q_num

        from raw_fixtures import write_cr3_raw

        truth = self._mosaic(96, 144, seed=77)
        p = str(tmp_path / "tq.cr3")
        write_cr3_raw(p, truth, levels=2, qparam=6, tile_cols=2)
        err = read_raw(p).data.astype(np.int64) - truth.astype(np.int64)
        step = q_num(6) / _Q_DEN
        assert np.abs(err).max() <= 8 * step

    def test_tile_order_mismatch_clear_error(self, tmp_path):
        """Round-5 review regression: reassembly assumes raster order; a
        record run whose 0xFF01 headers declare a different order must abort
        (it would otherwise place tiles at the wrong coordinates and return
        a silently scrambled mosaic)."""
        from raw_fixtures import write_cr3_raw

        import struct as _s

        p = str(tmp_path / "to.cr3")
        write_cr3_raw(p, self._mosaic(96, 132, seed=9), levels=1, tile_cols=2)
        buf = bytearray(open(p, "rb").read())
        # The two 0xFF01 records carry indices 0 and 1; swap them.
        pos = bytes(buf).find(b"\xff\x01\x00\x0c")
        assert pos > 0
        pos2 = bytes(buf).find(b"\xff\x01\x00\x0c", pos + 4)
        assert pos2 > 0
        _s.pack_into(">H", buf, pos + 8, 1)
        _s.pack_into(">H", buf, pos2 + 8, 0)
        open(p, "wb").write(bytes(buf))
        with pytest.raises(NotImplementedError, match="tile"):
            read_raw(p)

    def test_tile_count_mismatch_clear_error(self, tmp_path):
        """CMP1 declaring a tile grid the record run doesn't carry must
        abort cleanly (the pre-round-5 single-tile reader's failure mode,
        now an explicit guard)."""
        from raw_fixtures import write_cr3_raw

        import struct as _s

        p = str(tmp_path / "tm.cr3")
        write_cr3_raw(p, self._mosaic(64, 96), levels=1)
        buf = bytearray(open(p, "rb").read())
        i = bytes(buf).find(b"CMP1") + 4
        _s.pack_into(">I", buf, i + 16, 48)  # tile_width 96 -> 48 (2 tiles)
        open(p, "wb").write(bytes(buf))
        with pytest.raises(NotImplementedError, match="tile"):
            read_raw(p)

    @pytest.mark.parametrize("qp", list(range(1, 14)))
    def test_lossy_every_octave_step(self, tmp_path, qp):
        """Every quantizer step across two octaves (the 2^(1/6) ladder,
        qp%6 selecting the numerator and qp//6 the shift) decodes with
        error bounded by the step through 5/3 synthesis."""
        from raw2film_tpu.io.crx import _Q_DEN, q_num

        from raw_fixtures import write_cr3_raw

        truth = self._mosaic(64, 96, seed=100 + qp)
        p = str(tmp_path / f"q{qp}.cr3")
        write_cr3_raw(p, truth, levels=2, qparam=qp)
        err = read_raw(p).data.astype(np.int64) - truth.astype(np.int64)
        step = q_num(qp) / _Q_DEN
        assert np.abs(err).max() <= 8 * step, (qp, np.abs(err).max(), step)
        assert np.abs(err).mean() <= step

    @pytest.mark.parametrize("kind", ["spikes", "columns", "checker", "ramp_jump"])
    def test_k_adaptation_boundaries(self, tmp_path, kind):
        """Adversarial Rice-parameter adaptation sequences: maximum-contrast
        patterns force k to swing across its full range (spikes to full
        scale inside flat runs, alternating min/max columns, per-pixel
        checker, a mid-frame DC jump). All must round-trip exactly."""
        from raw_fixtures import write_cr3_raw

        h, w, top = 64, 96, 16383
        rng = np.random.default_rng(hash(kind) % 2**32)
        if kind == "spikes":
            truth = np.full((h, w), 128, np.uint16)
            iy = rng.integers(0, h, 60)
            ix = rng.integers(0, w, 60)
            truth[iy, ix] = top
        elif kind == "columns":
            truth = np.zeros((h, w), np.uint16)
            truth[:, 1::2] = top
        elif kind == "checker":
            yy, xx = np.mgrid[0:h, 0:w]
            truth = np.where((yy + xx) % 2 == 0, 0, top).astype(np.uint16)
        else:  # ramp_jump
            truth = np.tile(
                np.linspace(0, 900, w).astype(np.uint16), (h, 1)
            )
            truth[h // 2 :] += top - 1200
        for levels in (0, 2):
            p = str(tmp_path / f"{kind}_{levels}.cr3")
            write_cr3_raw(p, truth, levels=levels)
            np.testing.assert_array_equal(read_raw(p).data, truth)

    def test_nonbaseline_enc_type_clear_error(self, tmp_path):
        from raw_fixtures import write_cr3_raw

        p = str(tmp_path / "enc1.cr3")
        write_cr3_raw(p, self._mosaic(64, 96), levels=3, enc_type=1)
        with pytest.raises(NotImplementedError, match="encType"):
            read_raw(p)

    @pytest.mark.parametrize("qp", [1, 6, 12])
    def test_lossy_round_trip_bounded(self, tmp_path, qp):
        """Quantized (lossy CRAW) subbands: decode error is bounded by the
        quantizer step (num(qp)/40 per HF coefficient, amplified by at most
        the 5/3 synthesis gain per level), the stream is smaller than the
        lossless encode, and the LL band keeps the DC exact (flat regions
        reconstruct exactly)."""
        from raw2film_tpu.io.crx import _Q_DEN, q_num

        from raw_fixtures import write_cr3_raw

        truth = self._mosaic(96, 144, seed=40 + qp)
        p0 = str(tmp_path / "lossless.cr3")
        write_cr3_raw(p0, truth, levels=3, qparam=0)
        p = str(tmp_path / f"q{qp}.cr3")
        write_cr3_raw(p, truth, levels=3, qparam=qp)

        raw = read_raw(p)
        err = raw.data.astype(np.int64) - truth.astype(np.int64)
        # Per-coefficient quantization error <= step/2; three levels of 5/3
        # synthesis (gain <= 1.5 per axis pair) bound the pixel error well
        # under 8 steps — observed max is ~2 steps.
        step = q_num(qp) / _Q_DEN
        assert np.abs(err).max() <= 8 * step
        assert np.abs(err).mean() <= step
        assert (
            (tmp_path / f"q{qp}.cr3").stat().st_size
            < (tmp_path / "lossless.cr3").stat().st_size
        )

    def test_lossy_quantized_ll_clear_error(self, tmp_path):
        """A qparam on the DPCM-coded LL record (no published analog —
        CRAW quantizes the detail bands) must abort clearly."""
        from raw_fixtures import write_cr3_raw

        p = str(tmp_path / "llq.cr3")
        write_cr3_raw(p, self._mosaic(64, 96), levels=2, qparam=3)
        buf = bytearray(open(p, "rb").read())
        # Record run starts at the mdat payload: FF01 (12 B), then per
        # plane FF02 (12 B) + FF03 LL first. Patch plane 0's LL qparam.
        mdat = bytes(buf).find(b"mdat") + 4
        assert buf[mdat + 24 : mdat + 26] == b"\xff\x03"
        buf[mdat + 24 + 10] = 3
        open(p, "wb").write(bytes(buf))
        with pytest.raises(NotImplementedError, match="LL"):
            read_raw(p)

    def test_lossy_quantized_level0_clear_error(self, tmp_path):
        """qparam on a level-0 (DPCM plane) stream must abort clearly."""
        from raw_fixtures import write_cr3_raw

        p = str(tmp_path / "l0q.cr3")
        write_cr3_raw(p, self._mosaic(64, 96), levels=0)
        buf = bytearray(open(p, "rb").read())
        mdat = bytes(buf).find(b"mdat") + 4
        # FF01, then plane 0's FF02 + its single FF03 band record.
        assert buf[mdat + 24 : mdat + 26] == b"\xff\x03"
        buf[mdat + 24 + 10] = 5
        open(p, "wb").write(bytes(buf))
        with pytest.raises(NotImplementedError, match="level-0"):
            read_raw(p)

    def test_lossy_to_print_smoke(self, tmp_path):
        from raw_fixtures import write_cr3_raw

        from raw2film_tpu.pipeline.processor import Processor

        p = str(tmp_path / "craw.cr3")
        write_cr3_raw(p, self._mosaic(96, 128, seed=5), levels=3, qparam=6)
        out = Processor().process(
            p, "Kodak Portra 400", grain=0, half_size=False, max_scale=None
        )
        assert out.dtype == np.uint8 and out.shape[2] == 3

    def test_odd_dims_clear_error(self, tmp_path):
        from raw_fixtures import crx_sample, write_cr3_raw  # noqa: F401

        # Encoder refuses odd dims; hand-build via an even encode then a
        # patched CMP1 to claim odd width.
        p = str(tmp_path / "odd.cr3")
        write_cr3_raw(p, self._mosaic(64, 96))
        buf = bytearray(open(p, "rb").read())
        i = bytes(buf).find(b"CMP1") + 4
        import struct as _s

        _s.pack_into(">I", buf, i + 8, 95)  # f_width -> odd
        open(p, "wb").write(bytes(buf))
        with pytest.raises((NotImplementedError, ValueError)):
            read_raw(p)

    def test_corrupt_stream_clear_error(self, tmp_path):
        """Noise in the entropy payload must abort (consumed-bytes
        cross-check / range guard / unary cap), never return garbage
        silently."""
        from raw_fixtures import write_cr3_raw

        p = str(tmp_path / "ok.cr3")
        write_cr3_raw(p, self._mosaic(96, 144), levels=2)
        buf = bytearray(open(p, "rb").read())
        mdat = bytes(buf).find(b"mdat") + 4
        rng = np.random.default_rng(13)
        n_errors = 0
        for trial in range(6):
            clob = bytearray(buf)
            off = mdat + 200 + trial * 97
            clob[off : off + 64] = rng.integers(0, 255, 64, np.uint8).tobytes()
            p2 = str(tmp_path / f"bad{trial}.cr3")
            open(p2, "wb").write(bytes(clob))
            try:
                out = read_raw(p2)
                # A decode that survives must at least differ nowhere
                # dangerous: accept only if it still round-trips the
                # untouched planes' dims.
                assert out.data.shape == (96, 144)
            except (NotImplementedError, ValueError):
                n_errors += 1
        assert n_errors >= 4  # the guards catch the vast majority

    def test_truncated_sample_clear_error(self, tmp_path):
        from raw_fixtures import write_cr3_raw

        p = str(tmp_path / "t.cr3")
        write_cr3_raw(p, self._mosaic(96, 144), levels=1)
        buf = open(p, "rb").read()
        open(p, "wb").write(buf[: len(buf) - len(buf) // 4])
        with pytest.raises((NotImplementedError, ValueError)):
            read_raw(p)

    def test_cr3_to_print_smoke(self, tmp_path):
        from raw_fixtures import write_cr3_raw

        from raw2film_tpu.pipeline.processor import Processor

        p = str(tmp_path / "shot.cr3")
        write_cr3_raw(p, self._mosaic(96, 128, seed=5), levels=0)
        out = Processor().process(
            p, "Kodak Portra 400", grain=0, half_size=False, max_scale=None
        )
        assert out.dtype == np.uint8 and out.shape[2] == 3


class TestNikonCompressed:
    """Lossless Nikon-compressed NEF (Compression 34713): spec-based
    synthetic encoder (tests/raw_fixtures.py::nef_compress_lossless) round-
    tripped through the native decoder — the same honest methodology as the
    packed-NEF and LJPEG fixtures. Matches the reference's LibRaw ingest
    surface (src/raw2film/raw_conversion.py:36-48)."""

    @pytest.mark.parametrize("bits", [12, 14])
    def test_round_trip_exact(self, tmp_path, bits):
        from raw_fixtures import write_nef_compressed

        m = _mosaic(40, 60, bits=bits)
        p = str(tmp_path / "z.nef")
        write_nef_compressed(p, m, bits=bits)
        raw = read_raw(p)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), m)
        assert raw.cfa_pattern == "RGGB"
        assert raw.white_level == float((1 << bits) - 1)

    def test_big_endian_container_round_trip(self, tmp_path):
        """Real Nikon bodies write MM (big-endian) TIFFs — the whole IFD
        walk, tag decode, and MakerNote discovery must work there too."""
        from raw_fixtures import write_nef_compressed

        m = _mosaic(32, 48, bits=14)
        p = str(tmp_path / "mm.nef")
        write_nef_compressed(p, m, bits=14, endian=">")
        assert open(p, "rb").read(2) == b"MM"
        raw = read_raw(p)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), m)
        assert raw.metadata["EXIF:Make"] == "NIKON CORPORATION"
        assert raw.metadata["EXIF:ISO"] == 400

    def test_gradient_and_flat_regions(self, tmp_path):
        """Exercise long zero-diff runs (flat) and large diffs (edges)."""
        from raw_fixtures import write_nef_compressed

        yy, xx = np.mgrid[0:32, 0:48]
        m = np.zeros((32, 48), np.uint16)
        m[:16] = (xx[:16] * 300) % 16384  # steep gradient rows
        m[16:24] = 8191  # flat block
        m[24:] = ((yy[24:] * 7919 + xx[24:] * 104729) % 16384).astype(np.uint16)
        p = str(tmp_path / "g.nef")
        write_nef_compressed(p, m, bits=14)
        raw = read_raw(p)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), m)

    def test_bitstream_is_actually_compressed_structure(self, tmp_path):
        """The file stores a Huffman bitstream, not packed samples: a flat
        image compresses far below the packed size."""
        from raw_fixtures import write_nef_compressed

        m = np.full((64, 96), 5000, np.uint16)
        p = str(tmp_path / "f.nef")
        write_nef_compressed(p, m, bits=14)
        import os

        assert os.path.getsize(p) < 64 * 96 * 14 // 8 // 2
        raw = read_raw(p)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), m)

    def test_makernote_blob_parse(self):
        """Version/vpred/curve parsing of the 0x0096 blob."""
        import struct

        from raw2film_tpu.io.nef import parse_linearization

        blob = bytes([0x46, 0x30]) + struct.pack("<4H", 100, 200, 300, 400)
        blob += struct.pack("<H", 1)
        curve, vpred, split, kind = parse_linearization(blob, "<", 14)
        assert kind == "lossless" and split == 0
        assert list(vpred) == [100, 200, 300, 400]
        assert curve[0] == 0 and curve[16383] == 16383 and len(curve) == 16384

    def test_lossy_curve_expansion(self):
        """Version 0x44 0x20: sampled curve expands by linear interp and the
        split row reads from offset 562."""
        import struct

        from raw2film_tpu.io.nef import parse_linearization

        csize = 17
        samples = [i * 256 for i in range(csize)]
        blob = bytearray([0x44, 0x20])
        blob += struct.pack("<4H", 0, 0, 0, 0)
        blob += struct.pack("<H", csize)
        blob += struct.pack(f"<{csize}H", *samples)
        blob += b"\0" * (562 - len(blob))
        blob += struct.pack("<H", 7)  # split row
        curve, vpred, split, kind = parse_linearization(bytes(blob), "<", 12)
        assert kind == "lossy_split" and split == 7
        step = 4096 // (csize - 1)
        assert curve[step] == 256 and curve[step // 2] == 128


class TestNikonLossy:
    """Lossy NEF (version 0x44) conformance: the native decoder pinned
    against an independent Python model of the dcraw ``nikon_load_raw``
    semantics on adversarial random streams drawn from the real lossy code
    tables (tests/raw_fixtures.py::nef_lossy_stream), plus a container-level
    round trip through a greedy spec encoder. This is the same synthetic-
    conformance methodology the CRX suite uses; real-camera lossy files
    remain unverifiable in this environment. Reference ingest surface:
    src/raw2film/raw_conversion.py:36-48."""

    @pytest.mark.parametrize(
        "bits,version,split_frac,d100,seed",
        [
            (12, (0x44, 0x10), 0.0, False, 1),   # type-1 lossy, 12-bit
            (14, (0x44, 0x10), 0.0, False, 2),   # type-1 lossy, 14-bit
            (12, (0x44, 0x20), 0.4, False, 3),   # split trees, 12-bit
            (14, (0x44, 0x20), 0.4, False, 4),   # split trees, 14-bit
            (14, (0x44, 0x20), 0.0, False, 5),   # split version, split==0
            (14, (0x44, 0x40), 0.5, False, 6),   # quarter-range curve
            (12, (0x49, 0x58), 0.0, True, 7),    # D100-era 2110-byte filler
        ],
    )
    def test_stream_conformance(self, bits, version, split_frac, d100, seed):
        """Native decode == Python model on random symbol streams covering
        every tree symbol, both extra-bit extremes, the split-row tree
        switch, unclamped predictor accumulation, and the curve clamp."""
        from raw_fixtures import nef_lossy_stream

        from raw2film_tpu.io.nef import decode_nef_compressed

        h, w = 24, 36
        stream, blob, expected = nef_lossy_stream(
            bits, w, h, version=version, split_row=int(h * split_frac),
            seed=seed, d100_filler=d100,
        )
        got = decode_nef_compressed(stream, blob, "<", w, h, bits)
        np.testing.assert_array_equal(got, expected)

    @pytest.mark.parametrize("seed", [1, 2])
    def test_stream_conformance_stress(self, seed):
        """Larger frames + distinct vpred seeds per parametrization."""
        from raw_fixtures import nef_lossy_stream

        from raw2film_tpu.io.nef import decode_nef_compressed

        h, w = 60, 90
        stream, blob, expected = nef_lossy_stream(
            14, w, h, version=(0x44, 0x20), split_row=h // 3, seed=100 + seed
        )
        got = decode_nef_compressed(stream, blob, "<", w, h, bits=14)
        np.testing.assert_array_equal(got, expected)

    def test_container_round_trip_bounded(self, tmp_path):
        """Full .nef container with a 0x44 0x20 payload: decode through
        read_raw matches the encoder's expected output exactly, and sits
        within the residual-quantization bound of the source (pre-split
        rows exact; post-split rows on the 2^shl grids, worst step 32)."""
        from raw_fixtures import write_nef_lossy

        rng = np.random.default_rng(0)
        yy, xx = np.mgrid[0:40, 0:56]
        m = (
            4096
            + 700 * np.sin(yy / 3.0)
            + 900 * np.cos(xx / 5.0)
            + rng.normal(0, 300, (40, 56))
        )
        m = np.clip(m, 0, 16383).astype(np.uint16)
        p = str(tmp_path / "lossy.nef")
        expected = write_nef_lossy(p, m, bits=14, split_row=20)
        raw = read_raw(p)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), expected)
        err = np.abs(expected.astype(np.int64) - m.astype(np.int64))
        assert err[:20].max() == 0  # pre-split: plain ssss, exact
        assert err.max() <= 32  # post-split: half of the worst 2^shl grid


class TestSr2Conformance:
    """SR2 decrypt/curve widening: the reconstructed keystream pinned
    against an independent pure-int model (distinct code structure from the
    vectorized io/sr2.py implementation), plus guard-edge cases for the
    curve builder and MakerNote discovery. Methodology mirrors the CRX and
    lossy-NEF synthetic conformance suites; real Sony files remain
    unverifiable here (fallback is the linear expansion either way)."""

    @staticmethod
    def _keystream_model(key: int, nwords: int) -> list[int]:
        """Independent re-derivation: plain-int LCG seed, shift-register
        expansion, rolling XOR update."""
        pad = [0] * 128
        k = key & 0xFFFFFFFF
        for i in range(4):
            k = (k * 48828125 + 1) & 0xFFFFFFFF
            pad[i] = k
        pad[3] = (pad[3] << 1 | (pad[0] ^ pad[2]) >> 31) & 0xFFFFFFFF
        for i in range(4, 127):
            pad[i] = (
                (pad[i - 4] ^ pad[i - 2]) << 1
                | (pad[i - 3] ^ pad[i - 1]) >> 31
            ) & 0xFFFFFFFF
        out = []
        idx = 127
        for _ in range(nwords):
            pad[idx & 127] = pad[(idx + 1) & 127] ^ pad[(idx + 65) & 127]
            out.append(pad[idx & 127])
            idx += 1
        return out

    @pytest.mark.parametrize("key", [0, 1, 0xFFFFFFFF, 0x5EED, 0x7FFFFFFF])
    def test_keystream_matches_independent_model(self, key):
        """Decrypting zeros exposes the keystream; 300 words exercises two
        wraps of the 128-word rolling window."""
        from raw2film_tpu.io.sr2 import sony_decrypt

        nwords = 300
        got = np.frombuffer(
            sony_decrypt(bytes(4 * nwords), key), ">u4"
        ).tolist()
        assert got == self._keystream_model(key, nwords)

    def test_decrypt_preserves_unaligned_tail(self):
        from raw2film_tpu.io.sr2 import sony_decrypt

        data = bytes(range(13))  # 3 whole words + 1 tail byte
        out = sony_decrypt(data, 9)
        assert len(out) == 13 and out[-1] == data[-1]
        assert sony_decrypt(out, 9) == data

    def test_curve_edges(self):
        from raw2film_tpu.io.sr2 import build_sony_curve

        # Degenerate knots: every segment after 0 rides slope 16.
        c = build_sony_curve([0, 0, 0, 0])
        assert c[0] == 0 and c[1] == 16 and int(c[4095]) == 4095 * 16
        # Empty tail segment: k4 == 4095 leaves slope-16 region empty.
        c = build_sony_curve([1000, 2000, 3000, 4095])
        assert int(c[4095]) == int(c[4094]) + 8
        # The worst case (all-zero knots) is exactly the u16 ceiling: the
        # overflow guard in build_sony_curve is unreachable for masked
        # 12-bit knots, by construction.
        assert int(build_sony_curve([0, 0, 0, 0]).max()) == 4095 * 16 <= 0xFFFF

    @pytest.mark.parametrize("prefix", [b"SONY CAM \x00\x00\x00", b"SONY DSC \x00\x00\x00"])
    def test_makernote_prefix_variants(self, prefix):
        import struct as _s

        from raw2film_tpu.io.sr2 import _makernote_inline_u32

        mn = bytearray(prefix[:12])
        mn += _s.pack("<H", 2)
        mn += _s.pack("<HHI", 0x7200, 4, 1) + _s.pack("<I", 1234)
        mn += _s.pack("<HHI", 0x7221, 4, 1) + _s.pack("<I", 0xBEEF)
        tags = _makernote_inline_u32(bytes(mn), {0x7200, 0x7221})
        assert tags == {0x7200: 1234, 0x7221: 0xBEEF}

    def test_makernote_unknown_prefix_rejected(self):
        from raw2film_tpu.io.sr2 import _makernote_inline_u32

        assert _makernote_inline_u32(b"NIKON XX" + bytes(64), {0x7200}) == {}
