"""Batch engine, settings persistence, CLI."""

import json
import os

import numpy as np
import pytest

from raw2film_tpu.pipeline.batch import BatchRunner, export_path, scan_raw_files
from raw2film_tpu.pipeline.params import ImageParams, ProfileParams
from raw2film_tpu.pipeline.settings import (
    load_folder_settings,
    load_settings,
    save_settings,
    sidecar_path,
)

RNG = np.random.default_rng(5)


def _write_fixture_dng(path, h=64, w=96, seed=0):
    from raw2film_tpu.data import REC709_TO_XYZ, XYZ_TO_REC709
    from raw2film_tpu.io.dng import write_dng

    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack([0.1 + 0.5 * xx / w, 0.1 + 0.4 * yy / h, 0.3 - 0.1 * yy / h], -1)
    cam = (rgb @ REC709_TO_XYZ.T) @ XYZ_TO_REC709.T
    mosaic = np.zeros((h, w))
    mosaic[0::2, 0::2] = cam[0::2, 0::2, 0]
    mosaic[0::2, 1::2] = cam[0::2, 1::2, 1]
    mosaic[1::2, 0::2] = cam[1::2, 0::2, 1]
    mosaic[1::2, 1::2] = cam[1::2, 1::2, 2]
    write_dng(str(path), np.clip(mosaic, 0, 1) * 60000, white_level=60000)


class TestBatchRunner:
    def test_overlapped_run_and_progress(self, tmp_path):
        calls = []

        def process(src, **params):
            return np.full((8, 8, 3), 128, np.uint8)

        def export(image, src):
            dst = str(tmp_path / (os.path.basename(src) + ".jpg"))
            from PIL import Image

            Image.fromarray(image).save(dst)
            return dst

        progress = []
        runner = BatchRunner(process, export)
        results = runner.run(
            [(f"img{i}.dng", {}) for i in range(5)],
            progress=lambda d, t: progress.append((d, t)),
        )
        assert len(results) == 5 and all(r.ok for r in results)
        assert progress[-1] == (5, 5)

    def test_parallel_decode_workers_preserve_order(self, tmp_path):
        """workers > 1: decode runs concurrently but results stay in
        submission order, and a decode failure only skips its item."""
        import threading
        import time as _time

        from raw2film_tpu.pipeline.batch import BatchRunner

        seen_concurrent = []
        active = [0]
        lock = threading.Lock()

        def decode(src, **params):
            with lock:
                active[0] += 1
                seen_concurrent.append(active[0])
            _time.sleep(0.05 if src != "c" else 0.0)
            if src == "b":
                with lock:
                    active[0] -= 1
                raise ValueError("bad file")
            with lock:
                active[0] -= 1
            return f"payload-{src}"

        order = []

        def process(payload, **params):
            order.append(payload)
            return payload

        runner = BatchRunner(
            process, lambda img, src: src, decode_fn=decode, workers=3
        )
        results = runner.run([(s, {}) for s in "abcd"])
        assert order == ["payload-a", "payload-c", "payload-d"]
        assert [r.ok for r in results] == [True, False, True, True]
        assert max(seen_concurrent) > 1  # decode actually overlapped

    def test_failure_isolated(self, tmp_path):
        def process(src, **params):
            if "bad" in src:
                raise RuntimeError("decode exploded")
            return np.zeros((4, 4, 3), np.uint8)

        def export(image, src):
            return "ok"

        runner = BatchRunner(process, export)
        results = runner.run([("a.dng", {}), ("bad.dng", {}), ("c.dng", {})])
        assert [r.ok for r in results] == [True, False, True]
        assert "decode exploded" in results[1].error

    def test_cancel(self):
        import threading

        runner = BatchRunner(lambda s, **p: np.zeros((2, 2, 3), np.uint8), lambda i, s: "x")
        runner.cancel()
        results = runner.run([("a.dng", {})] * 10)
        assert len(results) < 10

    def test_scan_and_paths(self, tmp_path):
        (tmp_path / "a.DNG").write_bytes(b"")
        (tmp_path / "b.arw").write_bytes(b"")
        (tmp_path / "c.txt").write_bytes(b"")
        files = scan_raw_files(str(tmp_path))
        assert len(files) == 2
        p = export_path("/x/y/img.dng", "/out", True, "2024:06:01 10:00:00")
        assert p == os.path.join("/out", "2024", "2024-06-01", "img.jpg")


class TestSettings:
    def test_roundtrip(self, tmp_path):
        p = str(tmp_path / "settings.json")
        save_settings(
            p,
            profiles={"Default": ProfileParams(negative_film="Kodak Ektar 100")},
            images={"img.dng": ImageParams(exp_comp=1.5, rotation=2.0)},
        )
        profiles, images = load_settings(p)
        assert profiles["Default"]["negative_film"] == "Kodak Ektar 100"
        assert images["img.dng"]["exp_comp"] == 1.5

    def test_unknown_keys_ignored(self, tmp_path):
        p = str(tmp_path / "settings.json")
        doc = {
            "profiles": {"X": {"negative_film": "Kodak Gold 200", "mystery": 1}},
            "images": {},
        }
        with open(p, "w") as f:
            json.dump(doc, f)
        profiles, _ = load_settings(p)
        assert profiles["X"]["negative_film"] == "Kodak Gold 200"
        assert "mystery" not in profiles["X"]

    def test_folder_sidecar(self, tmp_path):
        save_settings(
            sidecar_path(str(tmp_path)), images={"a.dng": ImageParams(tint=3.0)}
        )
        _, images = load_folder_settings(str(tmp_path))
        assert images["a.dng"]["tint"] == 3.0
        assert load_folder_settings("/nonexistent") == ({}, {})


class TestCLI:
    def test_list_stocks(self, capsys):
        from raw2film_tpu.cli import main

        assert main(["x.dng", "--list-stocks"]) == 0
        out = capsys.readouterr().out
        assert "Kodak Portra 400" in out and "print" in out

    def test_unknown_stock_errors(self, tmp_path, capsys):
        from raw2film_tpu.cli import main

        dng = tmp_path / "t.dng"
        _write_fixture_dng(dng)
        rc = main([str(dng), "--negative-film", "Kodachrome 9000"])
        assert rc == 2
        assert "unknown negative stock" in capsys.readouterr().err

    def test_validate_raw(self, tmp_path, capsys):
        """--validate-raw decodes each input and reports ok/guard per file
        as JSON lines, exit 1 when any file is refused (the documented
        pre-flight for reconstructed codecs, docs/raw_formats.md)."""
        import json as _json

        from raw_fixtures import write_cr3_raw

        from raw2film_tpu.cli import main

        rng = np.random.default_rng(0)
        m = rng.integers(0, 16000, (64, 96)).astype(np.uint16)
        write_cr3_raw(str(tmp_path / "good.cr3"), m, levels=2, tile_cols=2)
        write_cr3_raw(str(tmp_path / "bad.cr3"), m, levels=2, enc_type=1)
        rc = main([str(tmp_path), "--validate-raw"])
        assert rc == 1  # one refused file
        lines = [
            _json.loads(s)
            for s in capsys.readouterr().out.strip().splitlines()
        ]
        by_name = {os.path.basename(r["file"]): r for r in lines}
        assert by_name["good.cr3"]["ok"] and by_name["good.cr3"]["shape"] == [64, 96]
        bad = by_name["bad.cr3"]
        assert not bad["ok"] and bad["guard"] == "unsupported"
        assert "encType" in bad["error"]  # names WHICH guard tripped

    def test_export_end_to_end(self, tmp_path):
        from raw2film_tpu.cli import main

        dng = tmp_path / "shot.dng"
        _write_fixture_dng(dng)
        out_dir = str(tmp_path / "out")
        rc = main(
            [
                str(dng),
                "-o",
                out_dir,
                "--grain",
                "0",
                "--print-film",
                "None",
            ]
        )
        assert rc == 0
        dst = os.path.join(out_dir, "shot.jpg")
        assert os.path.exists(dst)
        from PIL import Image

        img = Image.open(dst)
        assert img.size[0] > 0

    def test_mixed_folder_isolates_unsupported(self, tmp_path, capsys):
        """A folder mixing a decodable DNG with an unsupported-payload CR3
        must export the DNG and report (not crash on) the CR3 — the
        reference's batch keeps going past failed files."""
        from raw_fixtures import write_cr3

        from raw2film_tpu.cli import main

        _write_fixture_dng(tmp_path / "good.dng")
        from PIL import Image
        import io as _io

        im = Image.new("RGB", (16, 12), (90, 60, 30))
        b = _io.BytesIO()
        im.save(b, "JPEG")
        write_cr3(str(tmp_path / "bad.cr3"), b.getvalue())
        out_dir = str(tmp_path / "out")
        rc = main([str(tmp_path), "-o", out_dir, "--grain", "0", "--print-film", "None"])
        assert os.path.exists(os.path.join(out_dir, "good.jpg"))
        assert not os.path.exists(os.path.join(out_dir, "bad.jpg"))
        assert rc != 0  # at least one failure is reflected in the exit code
        err = capsys.readouterr()
        assert "CRX" in err.err + err.out or "CR3" in err.err + err.out

    def test_export_nef_and_arw(self, tmp_path):
        """Vendor TIFF dialects flow through the full CLI export
        (reference ingest surface: src/raw2film/data.py:87-102)."""
        import numpy as np

        from raw2film_tpu.cli import main
        from raw_fixtures import write_arw, write_nef

        rng = np.random.default_rng(3)
        mosaic = rng.integers(600, 15000, (40, 64)).astype(np.uint16)
        write_nef(str(tmp_path / "a.nef"), mosaic)
        write_arw(str(tmp_path / "b.arw"), mosaic)
        out_dir = str(tmp_path / "out_v")
        rc = main(
            [
                str(tmp_path / "a.nef"),
                str(tmp_path / "b.arw"),
                "-o",
                out_dir,
                "--grain",
                "0",
            ]
        )
        assert rc == 0
        assert os.path.exists(os.path.join(out_dir, "a.jpg"))
        assert os.path.exists(os.path.join(out_dir, "b.jpg"))

    def test_folder_input_with_sidecar(self, tmp_path):
        from raw2film_tpu.cli import main

        folder = tmp_path / "roll"
        folder.mkdir()
        _write_fixture_dng(folder / "f1.dng")
        save_settings(
            sidecar_path(str(folder)), images={"f1.dng": ImageParams(exp_comp=1.0)}
        )
        out_dir = str(tmp_path / "out2")
        rc = main([str(folder), "-o", out_dir, "--grain", "0"])
        assert rc == 0
        assert os.path.exists(os.path.join(out_dir, "f1.jpg"))


class TestExportLut:
    def test_fleet_slicing(self, tmp_path):
        """--num-processes/--process-id slice the file list round-robin:
        two invocations cover disjoint halves (one per host in a fleet)."""
        import numpy as np

        from raw2film_tpu.cli import main
        from raw2film_tpu.io.dng import write_dng

        rng = np.random.default_rng(0)
        for i in range(4):
            write_dng(
                str(tmp_path / f"{i}.dng"),
                rng.integers(3000, 50000, (40, 64)).astype(np.uint16),
                white_level=60000,
            )
        out = str(tmp_path / "out")
        for pid in (0, 1):
            rc = main(
                [
                    str(tmp_path), "-o", out, "--grain", "0",
                    "--num-processes", "2", "--process-id", str(pid),
                ]
            )
            assert rc == 0
        import os

        assert sorted(os.listdir(out)) == ["0.jpg", "1.jpg", "2.jpg", "3.jpg"]

    def test_cli_exports_cube(self, tmp_path):
        from raw2film_tpu.cli import main
        from raw2film_tpu.io.cube import read_cube

        dst = str(tmp_path / "portra.cube")
        rc = main(
            ["--export-lut", dst, "--lut-size", "9",
             "--negative-film", "Kodak Portra 400",
             "--print-film", "Fuji Crystal Archive Maxima"]
        )
        assert rc == 0
        lut, _, _ = read_cube(dst)
        assert lut.shape == (9, 9, 9, 3)
        assert np.all(np.isfinite(lut)) and lut.max() <= 1.0 and lut.min() >= 0.0
        # Brighter input -> brighter output along the neutral diagonal.
        diag = np.array([lut[i, i, i].mean() for i in range(9)])
        assert diag[-1] > diag[1]

    def test_cli_export_lut_bw_paper(self, tmp_path):
        from raw2film_tpu.cli import main
        from raw2film_tpu.io.cube import read_cube

        dst = str(tmp_path / "trix.cube")
        rc = main(
            ["--export-lut", dst, "--lut-size", "7",
             "--negative-film", "Kodak Tri-X 400",
             "--print-film", "Ilford Multigrade IV RC"]
        )
        assert rc == 0
        lut, _, _ = read_cube(dst)
        # BW chain: LUT output is neutral everywhere.
        assert np.abs(lut.max(axis=-1) - lut.min(axis=-1)).max() < 1e-5


class TestSidecarMergeOrder:
    """The CLI merge order is defaults < sidecar profile < sidecar image <
    EXPLICIT flags only (reference gui.py:2181-2195). Untouched CLI flags
    must not clobber the sidecar."""

    def test_sidecar_actually_changes_output(self, tmp_path):
        from PIL import Image

        from raw2film_tpu.cli import main

        folder = tmp_path / "roll"
        folder.mkdir()
        _write_fixture_dng(folder / "f1.dng")
        out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
        assert main([str(folder), "-o", out_a, "--grain", "0"]) == 0
        save_settings(
            sidecar_path(str(folder)),
            images={"f1.dng": {"exp_comp": 2.0}},
        )
        assert main([str(folder), "-o", out_b, "--grain", "0"]) == 0
        a = np.asarray(Image.open(os.path.join(out_a, "f1.jpg")), np.float32)
        b = np.asarray(Image.open(os.path.join(out_b, "f1.jpg")), np.float32)
        assert np.abs(a - b).mean() > 2.0, "sidecar exp_comp had no effect"

    def test_explicit_flag_overrides_sidecar(self, tmp_path):
        from PIL import Image

        from raw2film_tpu.cli import main

        folder = tmp_path / "roll"
        folder.mkdir()
        _write_fixture_dng(folder / "f1.dng")
        save_settings(
            sidecar_path(str(folder)),
            images={"f1.dng": {"exp_comp": 2.0}},
        )
        out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
        # Explicit --exp-comp 0 must beat the sidecar's 2.0 ...
        assert main([str(folder), "-o", out_a, "--grain", "0",
                     "--exp-comp", "0"]) == 0
        # ... and match a run with no sidecar at all.
        os.remove(sidecar_path(str(folder)))
        assert main([str(folder), "-o", out_b, "--grain", "0"]) == 0
        a = np.asarray(Image.open(os.path.join(out_a, "f1.jpg")), np.float32)
        b = np.asarray(Image.open(os.path.join(out_b, "f1.jpg")), np.float32)
        assert np.abs(a - b).mean() < 0.5

    def test_sidecar_profile_layer_resolves(self, tmp_path):
        from PIL import Image

        from raw2film_tpu.cli import main

        folder = tmp_path / "roll"
        folder.mkdir()
        _write_fixture_dng(folder / "f1.dng")
        out_a = str(tmp_path / "a")
        assert main([str(folder), "-o", out_a, "--grain", "0"]) == 0
        # A sidecar profile with a strong push; the image references it.
        save_settings(
            sidecar_path(str(folder)),
            profiles={"Hot": {"push_pull": 2.0}},
            images={"f1.dng": {"profile": "Hot"}},
        )
        out_b = str(tmp_path / "b")
        assert main([str(folder), "-o", out_b, "--grain", "0"]) == 0
        a = np.asarray(Image.open(os.path.join(out_a, "f1.jpg")), np.float32)
        b = np.asarray(Image.open(os.path.join(out_b, "f1.jpg")), np.float32)
        assert np.abs(a - b).mean() > 1.0, "sidecar profile had no effect"

    def test_dynamic_lens_keys_survive_roundtrip(self, tmp_path):
        p = str(tmp_path / "settings.json")
        save_settings(
            p,
            images={"a.dng": {"exp_comp": 1.0, "lens": "synthetic 50mm f/2",
                              "lens_correction": False}},
        )
        _, images = load_settings(p)
        assert images["a.dng"]["lens"] == "synthetic 50mm f/2"
        assert images["a.dng"]["lens_correction"] is False

    def test_register_lens(self):
        from raw2film_tpu.pipeline.processor import Processor

        proc = Processor()
        assert proc.register_lens("synthetic 50mm f/2")
        assert "synthetic 50mm f/2" in proc.lenses
        assert not proc.register_lens("no such lens")
        assert not proc.register_lens("")
