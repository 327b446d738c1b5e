"""I/O: DNG round-trip, cube LUTs, ICC, raw decode, thumbnails."""

import numpy as np
import pytest

from raw2film_tpu.data import REC709_TO_XYZ, XYZ_TO_REC709
from raw2film_tpu.film.loader import load_film_stocks
from raw2film_tpu.io.cube import export_film_lut, read_cube, write_cube
from raw2film_tpu.io.dng import read_dng, write_dng
from raw2film_tpu.io.raw import calc_exposure, decode_raw, raw_to_linear

STOCKS = load_film_stocks()
RNG = np.random.default_rng(2)


def _mosaic_from_rgb(rgb_hwc, pattern="RGGB"):
    h, w = rgb_hwc.shape[:2]
    out = np.zeros((h, w), np.float32)
    ry, rx = {"RGGB": (0, 0), "BGGR": (1, 1), "GRBG": (0, 1), "GBRG": (1, 0)}[pattern]
    out[ry::2, rx::2] = rgb_hwc[ry::2, rx::2, 0]
    out[1 - ry :: 2, 1 - rx :: 2] = rgb_hwc[1 - ry :: 2, 1 - rx :: 2, 2]
    out[ry::2, 1 - rx :: 2] = rgb_hwc[ry::2, 1 - rx :: 2, 1]
    out[1 - ry :: 2, rx::2] = rgb_hwc[1 - ry :: 2, rx::2, 1]
    return out


class TestDNG:
    def test_round_trip_smooth_scene(self, tmp_path):
        h, w = 64, 96
        yy, xx = np.mgrid[0:h, 0:w]
        rgb = np.stack(
            [0.1 + 0.5 * xx / w, 0.1 + 0.4 * yy / h, 0.35 - 0.2 * xx / w], -1
        )
        xyz = rgb @ REC709_TO_XYZ.T
        cam = xyz @ XYZ_TO_REC709.T
        p = str(tmp_path / "t.dng")
        write_dng(
            p,
            np.clip(_mosaic_from_rgb(cam), 0, 1) * 60000,
            white_level=60000,
            iso=320,
            exposure_time=1 / 250,
            f_number=5.6,
        )
        raw = read_dng(p)
        assert raw.cfa_pattern == "RGGB"
        assert raw.metadata["EXIF:ISO"] == 320
        assert abs(raw.metadata["EXIF:FNumber"] - 5.6) < 1e-6
        out = np.asarray(decode_raw(raw))
        err = np.abs(out[:, 8:-8, 8:-8] - xyz.transpose(2, 0, 1)[:, 8:-8, 8:-8])
        assert err.max() < 0.03

    def test_bad_file_raises(self, tmp_path):
        p = tmp_path / "bad.dng"
        p.write_bytes(b"not a tiff at all")
        with pytest.raises(ValueError):
            read_dng(str(p))

    def test_patterns(self, tmp_path):
        for pattern in ("RGGB", "BGGR"):
            rgb = np.full((16, 16, 3), 0.5)
            p = str(tmp_path / f"{pattern}.dng")
            write_dng(
                p, _mosaic_from_rgb(rgb, pattern) * 60000, cfa_pattern=pattern,
                white_level=60000,
            )
            assert read_dng(p).cfa_pattern == pattern

    def test_auto_exposure_targets_grey(self, tmp_path):
        rgb = np.full((32, 32, 3), 0.05)
        p = str(tmp_path / "dark.dng")
        write_dng(p, _mosaic_from_rgb(rgb @ XYZ_TO_REC709.T @ np.eye(3)) * 60000, white_level=60000)
        img, _ = raw_to_linear(p, half_size=False, cache=False)
        assert abs(float(np.asarray(img)[1].mean()) - 0.18) < 0.05

    def test_calc_exposure_exif_factor(self):
        img = np.full((3, 32, 32), 0.09)
        ec_plain = calc_exposure(img)
        ec_exif = calc_exposure(
            img,
            metadata={
                "EXIF:FNumber": 2.8,
                "EXIF:ISO": 1600,
                "EXIF:ExposureTime": 1 / 30,
            },
        )
        assert abs(ec_plain - 1.0) < 0.01  # 0.09 -> 0.18 is exactly +1 stop
        assert np.isfinite(ec_exif)


class TestCube:
    def test_write_read_round_trip(self, tmp_path):
        lut = RNG.random((9, 9, 9, 3)).astype(np.float32)
        p = str(tmp_path / "test.cube")
        write_cube(p, lut)
        back, dmin, dmax = read_cube(p)
        np.testing.assert_allclose(back, lut, atol=1e-5)

    def test_export_film_lut(self, tmp_path):
        p = str(tmp_path / "portra.cube")
        export_film_lut(
            p,
            STOCKS["Kodak Portra 400"],
            STOCKS["Fuji Crystal Archive Maxima"],
            size=9,
        )
        lut, _, _ = read_cube(p)
        assert lut.shape == (9, 9, 9, 3)
        assert np.all(lut >= 0) and np.all(lut <= 1)
        # brighter input -> brighter output along the neutral axis
        assert lut[7, 7, 7, 1] > lut[1, 1, 1, 1]

    def test_density_domain_export(self, tmp_path):
        p = str(tmp_path / "dens.cube")
        export_film_lut(
            p, STOCKS["Kodak Portra 400"], None, size=9, input_encoding="density"
        )
        lut, _, _ = read_cube(p)
        assert lut.shape == (9, 9, 9, 3)


class TestICC:
    def test_graceful_without_littlecms(self):
        from raw2film_tpu.io import icc

        # Whether or not ImageCms is importable, the None-transform path
        # must be an exact no-op.
        lut = RNG.random((5, 5, 5, 3)).astype(np.float32)
        np.testing.assert_array_equal(icc.apply_transform_to_lut(lut, None), lut)
        img = (RNG.random((8, 8, 3)) * 255).astype(np.uint8)
        np.testing.assert_array_equal(icc.apply_transform_to_image(img, None), img)

    def test_have_icc_reports(self):
        from raw2film_tpu.io import icc

        assert isinstance(icc.have_icc(), bool)


class TestExifWriteBack:
    def test_whitelist_round_trip(self, tmp_path):
        """>=30 whitelisted keys must survive a JPEG export and re-read
        (reference re-attaches METADATA_KEYS via exiftool,
        src/raw2film/utils.py:82-90, data.py:8-85)."""
        from PIL import Image

        from raw2film_tpu.io.export import _EXIF_TAG_IDS, save_image

        meta = {
            "EXIF:Make": "NIKON CORPORATION",
            "EXIF:Model": "NIKON Z 6",
            "EXIF:Software": "cam 1.0",
            "EXIF:ModifyDate": "2026:08:16 10:00:00",
            "EXIF:Copyright": "someone",
            "EXIF:XResolution": 300.0,
            "EXIF:YResolution": 300.0,
            "EXIF:ResolutionUnit": 2,
            "EXIF:YCbCrPositioning": 1,
            "EXIF:ProcessingSoftware": "raw2film-tpu",
            "EXIF:ExposureTime": 0.004,
            "EXIF:FNumber": 2.8,
            "EXIF:ExposureProgram": 3,
            "EXIF:ISO": 400,
            "EXIF:SensitivityType": 2,
            "EXIF:DateTimeOriginal": "2026:08:15 19:30:00",
            "EXIF:CreateDate": "2026:08:15 19:30:00",
            "EXIF:OffsetTime": "+02:00",
            "EXIF:OffsetTimeOriginal": "+02:00",
            "EXIF:ShutterSpeedValue": 7.966,
            "EXIF:ApertureValue": 2.97,
            "EXIF:BrightnessValue": 5.5,
            "EXIF:MaxApertureValue": 1.0,
            "EXIF:MeteringMode": 5,
            "EXIF:LightSource": 0,
            "EXIF:Flash": 16,
            "EXIF:FocalLength": 50.0,
            "EXIF:SubSecTimeOriginal": "123",
            "EXIF:ColorSpace": 1,
            "EXIF:ExifImageWidth": 64,
            "EXIF:FocalPlaneXResolution": 2353.0,
            "EXIF:FocalPlaneYResolution": 2353.0,
            "EXIF:FocalPlaneResolutionUnit": 3,
            "EXIF:SensingMethod": 2,
            "EXIF:ExposureMode": 0,
            "EXIF:WhiteBalance": 0,
            "EXIF:DigitalZoomRatio": 1.0,
            "EXIF:FocalLengthIn35mmFormat": 50,
            "EXIF:SceneCaptureType": 0,
            "EXIF:Contrast": 0,
            "EXIF:Saturation": 0,
            "EXIF:SubjectDistanceRange": 2,
            "EXIF:LensMake": "NIKON",
            "EXIF:LensModel": "NIKKOR Z 50mm f/1.8 S",
            "EXIF:GPSVersionID": (2, 3, 0, 0),
            "EXIF:GPSLatitudeRef": "N",
            "EXIF:GPSLatitude": (52.0, 13.0, 24.5),
            "EXIF:GPSLongitudeRef": "E",
            "EXIF:GPSLongitude": (10.0, 31.0, 1.25),
            "EXIF:GPSAltitudeRef": 0,
            "EXIF:GPSAltitude": 118.2,
            "EXIF:GPSDateStamp": "2026:08:15",
        }
        img = (RNG.random((32, 64, 3)) * 255).astype(np.uint8)
        dst = str(tmp_path / "x.jpg")
        save_image(img, dst, metadata=meta, exp_comp=0.5, use_exiftool=False)

        back = Image.open(dst)
        exif = back.getexif()
        exif_ifd = exif.get_ifd(0x8769)
        gps_ifd = exif.get_ifd(0x8825)
        survived = 0
        for key, value in meta.items():
            name = key.split(":")[-1]
            ifd_id, tag = _EXIF_TAG_IDS[name]
            container = {0: exif, 0x8769: exif_ifd, 0x8825: gps_ifd}[ifd_id]
            if tag not in container:
                continue
            got = container[tag]
            if isinstance(got, bytes) and len(got) == 1:
                got = got[0]  # BYTE-typed tags (e.g. GPSAltitudeRef)
            if isinstance(value, (int, float)) and name != "Software":
                assert abs(float(got) - float(value)) < 1e-3, (name, got, value)
            survived += 1
        assert survived >= 40, survived
        # ExposureCompensation from the render params wins.
        assert abs(float(exif_ifd[37380]) - 0.5) < 1e-6
        # Software is stamped by the exporter.
        assert exif[305] == "raw2film-tpu"


class TestOrientation:
    def test_orientation_6_uprights_portrait(self, tmp_path):
        """A camera held vertically writes Orientation=6; the decode must
        deliver the uprighted (rotated 90 CW) image like LibRaw does."""
        from raw2film_tpu.io.dng import write_dng
        from raw2film_tpu.io.raw import raw_to_linear

        h, w = 40, 64
        mosaic = np.zeros((h, w), np.uint16)
        mosaic[:, : w // 2] = 40000  # bright LEFT half as stored
        mosaic[:, w // 2 :] = 4000
        p = str(tmp_path / "rot.dng")
        write_dng(p, mosaic, white_level=60000, orientation=6)
        xyz, meta = raw_to_linear(p, half_size=True, cache=False)
        assert meta["EXIF:Orientation"] == 6
        out = np.asarray(xyz)
        # Portrait: dimensions swap, and the stored-left bright half appears
        # at the visual TOP after 90 CW rotation.
        assert out.shape[1] == w // 2 and out.shape[2] == h // 2
        top = float(out[1, : out.shape[1] // 2, :].mean())
        bottom = float(out[1, out.shape[1] // 2 :, :].mean())
        assert top > 3 * bottom, (top, bottom)

    def test_orientation_3_rotates_180(self, tmp_path):
        from raw2film_tpu.io.dng import write_dng
        from raw2film_tpu.io.raw import raw_to_linear

        h, w = 40, 64
        mosaic = np.zeros((h, w), np.uint16)
        mosaic[: h // 2, :] = 40000  # bright TOP half as stored
        mosaic[h // 2 :, :] = 4000
        p = str(tmp_path / "rot3.dng")
        write_dng(p, mosaic, white_level=60000, orientation=3)
        xyz, _ = raw_to_linear(p, half_size=True, cache=False)
        out = np.asarray(xyz)
        assert out.shape[1] == h // 2 and out.shape[2] == w // 2
        top = float(out[1, : out.shape[1] // 2, :].mean())
        bottom = float(out[1, out.shape[1] // 2 :, :].mean())
        assert bottom > 3 * top, (top, bottom)


class TestDecodeWorkers:
    """R2F_DECODE_THREADS parse shared by the CRX band pool and the DNG
    tile pool (round-5 review: int('') used to crash every decode)."""

    def test_malformed_values_fall_back(self, monkeypatch):
        from raw2film_tpu.utils.workers import decode_workers

        for bad in ("", "auto", "4 workers", "-3", "0", "1.5"):
            monkeypatch.setenv("R2F_DECODE_THREADS", bad)
            n = decode_workers(8)
            assert 1 <= n <= 8, (bad, n)

    def test_override_and_caps(self, monkeypatch):
        from raw2film_tpu.utils.workers import decode_workers

        monkeypatch.setenv("R2F_DECODE_THREADS", "4")
        assert decode_workers(100) == 4
        assert decode_workers(2) == 2  # never more threads than jobs
        assert decode_workers(1) == 1
        monkeypatch.delenv("R2F_DECODE_THREADS")
        assert 1 <= decode_workers(100) <= 16

    def test_malformed_env_does_not_break_decode(self, tmp_path, monkeypatch):
        # End-to-end: a YAML-style 'unset' (empty string) must not turn a
        # valid CR3/DNG into a decode error.
        from raw_fixtures import write_cr3_raw

        from raw2film_tpu.io.dng import read_raw

        monkeypatch.setenv("R2F_DECODE_THREADS", "")
        m = np.random.default_rng(5).integers(0, 4096, (24, 32)).astype(np.uint16)
        p = str(tmp_path / "t.cr3")
        write_cr3_raw(p, m, nbits=12, levels=2)
        out = read_raw(p).data.astype(np.uint16)
        np.testing.assert_array_equal(out, m)
