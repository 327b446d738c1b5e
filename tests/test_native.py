"""Native C++ host kernels: lossless JPEG decode, strip unpack."""

import numpy as np
import pytest

from raw2film_tpu.native import have_native, unpack_normalize

RNG = np.random.default_rng(9)

pytestmark = pytest.mark.skipif(
    not have_native(), reason="native library unavailable (no g++)"
)


class TestLJPEG:
    @pytest.mark.parametrize("shape", [(32, 48), (17, 23), (64, 64, 2), (8, 8, 3)])
    def test_round_trip_exact(self, shape):
        from raw2film_tpu.io.ljpeg import encode_ljpeg
        from raw2film_tpu.native import decode_ljpeg

        img = RNG.integers(0, 65535, shape).astype(np.uint16)
        blob = encode_ljpeg(img)
        flat, w, h, comps = decode_ljpeg(blob, img.size)
        np.testing.assert_array_equal(flat.reshape(h, w, comps).squeeze(), img.squeeze())

    def test_smooth_image_compresses(self):
        from raw2film_tpu.io.ljpeg import encode_ljpeg

        yy, xx = np.mgrid[0:64, 0:64]
        img = (yy + xx).astype(np.uint16)  # diffs of 1: short codes
        blob = encode_ljpeg(img)
        assert len(blob) < img.nbytes  # gradients compress

    def test_garbage_rejected(self):
        from raw2film_tpu.native import decode_ljpeg

        with pytest.raises(ValueError):
            decode_ljpeg(b"\x00" * 64, 1024)

    def test_malformed_inputs_rejected_not_crashed(self):
        """Truncations and bit-flips of a valid stream must error cleanly
        (the decoder parses untrusted files)."""
        from raw2film_tpu.io.ljpeg import encode_ljpeg
        from raw2film_tpu.native import decode_ljpeg

        img = RNG.integers(0, 65535, (16, 16)).astype(np.uint16)
        blob = bytearray(encode_ljpeg(img))
        # Truncate at every prefix of the header region.
        for cut in range(2, min(len(blob), 64)):
            try:
                decode_ljpeg(bytes(blob[:cut]), img.size)
            except ValueError:
                pass
        # Corrupt each header byte (table selectors, counts, lengths).
        for i in range(2, min(len(blob), 96)):
            for val in (0x00, 0xFF, 0x3F):
                mut = bytearray(blob)
                mut[i] = val
                try:
                    decode_ljpeg(bytes(mut), img.size)
                except ValueError:
                    pass

    def test_sos_bad_table_selector_rejected(self):
        """A DC table selector > 3 in SOS must be rejected, not index OOB."""
        from raw2film_tpu.io.ljpeg import encode_ljpeg
        from raw2film_tpu.native import decode_ljpeg

        img = RNG.integers(0, 65535, (8, 8)).astype(np.uint16)
        blob = bytearray(encode_ljpeg(img))
        i = blob.find(b"\xff\xda")
        assert i >= 0
        # SOS layout: FFDA len2 ns (cid tbl)*ns ...; tbl byte = i+6
        blob[i + 6] = 0x70  # DC selector 7
        with pytest.raises(ValueError):
            decode_ljpeg(bytes(blob), img.size)

    def test_compressed_dng_round_trip(self, tmp_path):
        from raw2film_tpu.io.dng import read_dng, write_dng

        mosaic = RNG.integers(0, 60000, (48, 64)).astype(np.uint16)
        p = str(tmp_path / "c.dng")
        write_dng(p, mosaic, white_level=60000, compression=7)
        raw = read_dng(p)
        np.testing.assert_array_equal(raw.data.astype(np.uint16), mosaic)


class TestUnpack:
    def test_unpack16_le(self):
        vals = RNG.integers(0, 65535, 257).astype("<u2")
        out = unpack_normalize(vals.tobytes(), 257, 16, False, 100.0, 1 / 59900.0)
        want = np.clip((vals.astype(np.float32) - 100.0) / 59900.0, 0, 1)
        np.testing.assert_allclose(out, want, atol=1e-6)

    def test_unpack16_be(self):
        vals = RNG.integers(0, 65535, 64).astype(">u2")
        out = unpack_normalize(vals.tobytes(), 64, 16, True, 0.0, 1 / 65535.0)
        np.testing.assert_allclose(
            out, vals.astype(np.float32) / 65535.0, atol=1e-6
        )

    def test_unpack8(self):
        vals = RNG.integers(0, 255, 100).astype(np.uint8)
        out = unpack_normalize(vals.tobytes(), 100, 8, False, 0.0, 1 / 255.0)
        np.testing.assert_allclose(out, vals / 255.0, atol=1e-6)


class TestHuffmanRobustness:
    """Round-5 review regression: an over-subscribed DHT (sum(counts) <= 256
    passes the parser guard, but a length declares more codes than fit its
    bit width) drove the first-level LUT fill out of lut[256] — a stack OOB
    write from untrusted file bytes. Decode must stay in bounds: clean error
    or bounded garbage, never a crash."""

    def test_oversubscribed_dht_no_crash(self, tmp_path):
        import struct as _s
        import subprocess
        import sys as _sys

        dht = (
            b"\xff\xc4"
            + _s.pack(">H", 2 + 1 + 16 + 255)
            + b"\x00"
            + bytes([255] + [0] * 15)  # 255 one-bit codes: only 2 exist
            + bytes(range(255))
        )
        sof = (
            b"\xff\xc3" + _s.pack(">H", 11) + bytes([12])
            + _s.pack(">HH", 8, 8) + bytes([1, 0, 0x11, 0])
        )
        sos = b"\xff\xda" + _s.pack(">H", 8) + bytes([1, 0, 0x00, 1, 0, 0])
        stream = b"\xff\xd8" + dht + sof + sos + b"\xaa" * 64 + b"\xff\xd9"
        p = tmp_path / "oversub.bin"
        p.write_bytes(stream)
        # Subprocess so a segfault shows as a crash return code, not a
        # killed test runner.
        code = (
            "from raw2film_tpu.native import decode_ljpeg\n"
            f"data = open({str(p)!r}, 'rb').read()\n"
            "try:\n"
            "    decode_ljpeg(data, 1 << 16)\n"
            "except (ValueError, NotImplementedError):\n"
            "    pass\n"
            "print('SURVIVED')\n"
        )
        r = subprocess.run(
            [_sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=180,
        )
        assert r.returncode == 0, f"decoder crashed: rc={r.returncode} {r.stderr[-200:]}"
        assert "SURVIVED" in r.stdout


class TestGetLibThreadSafety:
    def test_concurrent_first_use(self):
        """Round-5 review regression: decode thread pools racing the lazy
        get_lib() init observed _tried=True with _lib still None and wrongly
        reported the native library unavailable. All concurrent first
        callers must receive the handle."""
        import subprocess
        import sys as _sys

        code = (
            "import threading\n"
            "from raw2film_tpu import native\n"
            "res = []\n"
            "bar = threading.Barrier(8)\n"
            "def go():\n"
            "    bar.wait()\n"
            "    res.append(native.get_lib() is not None)\n"
            "ts = [threading.Thread(target=go) for _ in range(8)]\n"
            "[t.start() for t in ts]; [t.join() for t in ts]\n"
            "print('OK' if all(res) and len(res) == 8 else f'FAIL {res}')\n"
        )
        r = subprocess.run(
            [_sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=300,
        )
        assert r.returncode == 0 and "OK" in r.stdout, r.stdout + r.stderr[-200:]
