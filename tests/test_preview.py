"""Preview engine: latest-wins coalescing, error isolation, thumbnails."""

import threading
import time

import numpy as np

from raw2film_tpu.pipeline.preview import PreviewEngine


class _SlowProcessor:
    def __init__(self, delay=0.05):
        self.delay = delay
        self.calls = []
        self.lock = threading.Lock()

    def process(self, src, **params):
        with self.lock:
            self.calls.append(params.get("tag"))
        time.sleep(self.delay)
        return np.full((8, 8, 3), params.get("value", 128), np.uint8)


class TestPreviewEngine:
    def test_renders_and_reports(self):
        frames = []
        proc = _SlowProcessor(delay=0.01)
        eng = PreviewEngine(proc, lambda img, hist: frames.append((img, hist)))
        eng.request("a.dng", value=10, full_preview=True)
        time.sleep(0.4)
        eng.close()
        assert frames and frames[0][0][0, 0, 0] == 10
        assert frames[0][1].shape[1] == 256  # histogram strip

    def test_latest_wins_coalescing(self):
        frames = []
        proc = _SlowProcessor(delay=0.08)
        eng = PreviewEngine(proc, lambda img, hist: frames.append(img))
        for i in range(12):
            eng.request("a.dng", tag=i, value=i, full_preview=True)
            time.sleep(0.002)
        time.sleep(0.8)
        eng.close()
        # Far fewer renders than requests; the last request always lands.
        assert len(proc.calls) < 12
        assert frames[-1][0, 0, 0] == 11

    def test_simplified_preview_strips_effects(self):
        seen = {}

        class P:
            def process(self, src, **params):
                seen.update(params)
                return np.zeros((4, 4, 3), np.uint8)

        eng = PreviewEngine(P(), lambda img, hist: None)
        eng.request("a.dng", grain=2, halation=True, sharpness=True)
        time.sleep(0.3)
        eng.close()
        assert seen["grain"] == 0 and not seen["halation"] and not seen["sharpness"]

    def test_error_does_not_kill_loop(self):
        errors = []
        frames = []

        class P:
            def __init__(self):
                self.n = 0

            def process(self, src, **params):
                self.n += 1
                if self.n == 1:
                    raise RuntimeError("boom")
                return np.zeros((4, 4, 3), np.uint8)

        eng = PreviewEngine(
            P(), lambda img, hist: frames.append(1), on_error=errors.append
        )
        eng.request("a.dng", full_preview=True)
        time.sleep(0.2)
        eng.request("a.dng", full_preview=True)
        time.sleep(0.3)
        eng.close()
        assert errors and frames


class TestHistogramScale:
    def test_scale_strip(self):
        from raw2film_tpu.ops.histogram import scale_strip

        strip = np.arange(100 * 256 * 4, dtype=np.uint8).reshape(100, 256, 4)
        out = scale_strip(strip, 50, 512)
        assert out.shape == (50, 512, 4)


class TestArchiveRaw:
    def test_copy_and_move(self, tmp_path):
        from raw2film_tpu.pipeline.batch import archive_raw

        src = tmp_path / "x.dng"
        src.write_bytes(b"raw")
        out = tmp_path / "out"
        out.mkdir()
        dst = archive_raw(str(src), str(out), "copy")
        assert dst and (out / "RAW" / "x.dng").exists() and src.exists()
        dst2 = archive_raw(str(src), str(out), "move")
        assert not src.exists()
