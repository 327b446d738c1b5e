"""Measured-stock import: analytic-model fitting (film/fit.py) and the
spectral_film_lut importer (film/import_sfl.py) against a MOCK sfl package
exposing the call-site API SURVEY.md §2.2 reconstructs (the real package is
not installable in this environment). Mirrors the --import-lensfun
methodology: the converter is exercised end to end, data fidelity asserted
through the fitted models. Reference context: src/raw2film/gui.py:209-259,
cpu_processor.py:182."""

from __future__ import annotations

import json
import os
import sys
import textwrap

import numpy as np
import pytest

from raw2film_tpu.film.fit import fit_hd_curve, fit_mtf
from raw2film_tpu.film.sensitometry import HDCurve
from raw2film_tpu.film.stock import MTFModel


class TestFitters:
    def test_hd_fit_recovers_own_family(self):
        truth = HDCurve(
            d_min=(0.22, 0.6, 0.9),
            gamma=(0.58, 0.62, 0.66),
            x_toe=(-2.6, -2.5, -2.4),
            x_shoulder=(0.5, 0.55, 0.6),
        )
        x = np.linspace(-4.0, 2.0, 80)
        dens = np.stack([truth.density(x[:, None])[:, c] for c in range(3)])
        fit, rms = fit_hd_curve(x, dens)
        assert rms.max() < 2e-3
        got = np.stack([fit.density(x[:, None])[:, c] for c in range(3)])
        assert np.abs(got - dens).max() < 0.01

    def test_hd_fit_foreign_shape_with_noise(self):
        """A tanh S-curve (NOT the softplus family) + noise: the fit must
        land within datasheet-read accuracy (~0.03 density)."""
        rng = np.random.default_rng(3)
        x = np.linspace(-3.5, 1.5, 60)
        d = 0.25 + 1.1 * (1 + np.tanh((x + 1.0) / 0.9)) / 2
        d = d + rng.normal(0, 0.004, x.shape)
        fit, rms = fit_hd_curve(x, d[None])
        assert rms[0] < 0.03
        assert abs(float(fit.d_min[0]) - 0.25) < 0.06

    def test_hd_fit_reversal_curve(self):
        """Falling density (slide film): gamma comes out negative and the
        high-density end maps to d_min per the model convention."""
        x = np.linspace(-3.0, 1.0, 50)
        d = 3.2 - 2.6 * np.clip((x + 2.2) / 2.6, 0, 1)
        fit, rms = fit_hd_curve(x, d[None])
        assert float(fit.gamma[0]) < -0.5
        assert rms[0] < 0.06

    def test_mtf_fit(self):
        truth = MTFModel(f50=65.0, power=2.0, adj=0.3, f_adj=10.0)
        f = np.geomspace(1, 300, 40)
        fit, rms = fit_mtf(np.log1p(f), truth.response(f))
        assert rms < 5e-3
        assert np.abs(fit.response(f) - truth.response(f)).max() < 0.02


MOCK_PKG = {
    "__init__.py": "",
    "film_loader.py": textwrap.dedent(
        '''
        import numpy as np

        class FilmSpectral:
            def __init__(self, name, gamma, dmin, iso, stage="camera",
                         film_type="negative"):
                self.name = name
                self.manufacturer = "MockCo"
                self.year = 1999
                self.stage = stage
                self.film_type = film_type
                self.medium = "film"
                self.iso = iso
                self.resolution = 90.0
                self.rms = 11.0
                self.density_measure = "status_m"
                self.alias = (name.lower(),)
                self.comment = "mock"
                self._gamma = gamma
                self._dmin = dmin
                f = np.geomspace(1, 250, 32)
                self.mtf = [(np.log1p(f), 1.15 / (1 + (f / 55.0) ** 1.9))] * 3

            def get_density_curve(self, push_pull=0, color_masking=None):
                x = np.linspace(-4.0, 2.0, 96)
                rows = [x]
                for c in range(3):
                    g = self._gamma * (1 + 0.05 * c)
                    d = self._dmin + 0.35 * c + g * 2.8 * (
                        1 + np.tanh((x + 1.1) / 1.1)
                    ) / 2
                    rows.append(d)
                return np.stack(rows)

        def load_films():
            return {
                "Mock Portra": FilmSpectral("Mock Portra", 0.6, 0.2, 400),
                "Mock Print": FilmSpectral(
                    "Mock Print", 2.7, 0.08, 0, stage="print",
                    film_type="paper"),
            }
        '''
    ),
}


@pytest.fixture
def mock_sfl(tmp_path, monkeypatch):
    """A fake spectral_film_lut checkout + isolated imported-stocks path."""
    pkg = tmp_path / "sfl_src" / "spectral_film_lut"
    pkg.mkdir(parents=True)
    for fname, content in MOCK_PKG.items():
        (pkg / fname).write_text(content)
    out = tmp_path / "stocks_imported.json"
    monkeypatch.setenv("R2F_IMPORTED_STOCKS", str(out))
    # Isolate module caching across tests.
    for mod in [m for m in sys.modules if m.startswith("spectral_film_lut")]:
        del sys.modules[mod]
    yield str(tmp_path / "sfl_src"), str(out)
    for mod in [m for m in sys.modules if m.startswith("spectral_film_lut")]:
        del sys.modules[mod]
    sys.path[:] = [p for p in sys.path if p != str(tmp_path / "sfl_src")]
    from raw2film_tpu.film.loader import load_film_stocks

    load_film_stocks.cache_clear()


class TestSflImport:
    def test_import_and_fidelity(self, mock_sfl):
        src, out = mock_sfl
        from raw2film_tpu.film.import_sfl import import_sfl_stocks

        entries, info = import_sfl_stocks(src)
        assert {e["name"] for e in entries} == {"Mock Portra", "Mock Print"}
        assert not info["errors"]
        # Every fitted H&D within datasheet-read accuracy of the sampled
        # (tanh-family, i.e. foreign-shape) source curves.
        assert max(max(r["hd_rms"]) for r in info["fits"].values()) < 0.04
        doc = json.load(open(out))
        assert doc["stocks"][0]["provenance"].startswith("imported from")

    def test_loader_overlay_and_render(self, mock_sfl):
        src, out = mock_sfl
        from raw2film_tpu.film.import_sfl import import_sfl_stocks

        import_sfl_stocks(src)
        from raw2film_tpu.film import chain
        from raw2film_tpu.film.loader import load_film_stocks

        load_film_stocks.cache_clear()
        try:
            stocks = load_film_stocks()
            assert "Mock Portra" in stocks and "Mock Print" in stocks
            neg = stocks["Mock Portra"]
            assert neg.iso == 400 and neg.manufacturer == "MockCo"
            assert neg.mtf_model is not None and 40 < neg.mtf_model.f50 < 75
            # The imported stock renders through the real chain.
            np_ = chain.build_negative_params(neg)
            pp = chain.build_print_params(neg, stocks["Mock Print"], neg_params=np_)
            op = chain.build_output_params(neg, stocks["Mock Print"], pp, np_)
            img = np.full((3, 2, 2), 0.18)
            outp = chain.render_oracle(img, np_, pp, op)
            assert np.all(np.isfinite(outp)) and outp.shape == (3, 2, 2)
        finally:
            load_film_stocks.cache_clear()

    def test_imported_entry_overrides_same_name(self, mock_sfl, tmp_path):
        src, out = mock_sfl
        from raw2film_tpu.film.import_sfl import import_sfl_stocks

        entries, _ = import_sfl_stocks(src)
        # Rename one entry to collide with a built-in parametric stock.
        doc = json.load(open(out))
        doc["stocks"][0]["name"] = "Kodak Portra 400"
        json.dump(doc, open(out, "w"))
        from raw2film_tpu.film.loader import load_film_stocks

        load_film_stocks.cache_clear()
        try:
            got = load_film_stocks()["Kodak Portra 400"]
            assert got.provenance.startswith("imported from")
        finally:
            load_film_stocks.cache_clear()

    def test_missing_package_clear_error(self, tmp_path, monkeypatch):
        monkeypatch.setenv(
            "R2F_IMPORTED_STOCKS", str(tmp_path / "none.json")
        )
        for mod in [m for m in sys.modules if m.startswith("spectral_film_lut")]:
            del sys.modules[mod]
        from raw2film_tpu.film.import_sfl import import_sfl_stocks

        with pytest.raises(ValueError, match="not importable"):
            import_sfl_stocks(str(tmp_path / "empty"))

    def test_corrupt_overlay_never_breaks_loader(self, tmp_path, monkeypatch):
        out = tmp_path / "bad.json"
        out.write_text("{not json")
        monkeypatch.setenv("R2F_IMPORTED_STOCKS", str(out))
        from raw2film_tpu.film.import_sfl import load_imported_stocks
        from raw2film_tpu.film.loader import load_film_stocks

        assert load_imported_stocks() == {}
        load_film_stocks.cache_clear()
        try:
            assert "Kodak Portra 400" in load_film_stocks()
        finally:
            load_film_stocks.cache_clear()

    def test_cli_flag(self, mock_sfl, capsys):
        src, out = mock_sfl
        from raw2film_tpu.cli import main

        rc = main(["--import-sfl", src])
        assert rc == 0
        assert "imported 2 stocks" in capsys.readouterr().out
        assert os.path.exists(out)


class TestImportRobustness:
    """Round-5 review regressions: ndarray attribute truthiness and the
    overlay wiping tuned parametric fields."""

    def test_ndarray_attributes_import_cleanly(self):
        # sfl attrs can be numpy arrays; bare `if mtf:` / `if rms:` raises
        # 'truth value of an array is ambiguous' and skipped the stock.
        from raw2film_tpu.film.import_sfl import import_stock

        class Stock:
            name = "Arrayed"
            manufacturer = "MockCo"
            year = 2001
            stage = "camera"
            film_type = "negative"
            medium = "film"
            iso = 200.0
            resolution = 80.0
            density_measure = "status_m"
            comment = ""
            alias = ()
            f = np.geomspace(1, 250, 32)
            mtf = np.stack([np.log1p(f), 1.1 / (1 + (f / 50.0) ** 2)])
            rms = np.asarray([9.0, 10.0, 11.0])  # per-channel granularity

            def get_density_curve(self, push_pull=0, color_masking=None):
                x = np.linspace(-4.0, 2.0, 96)
                d = 0.2 + 0.6 * 2.8 * (1 + np.tanh((x + 1.1) / 1.1)) / 2
                return np.stack([x, d, d * 1.05, d * 1.1])

        entry, report = import_stock("Arrayed", Stock())
        assert entry["grain"]["rms"] == pytest.approx(10.0)  # mean of channels
        assert max(report["hd_rms"]) < 0.05

    def test_numpy_scalar_metadata_is_json_safe(self):
        # sfl stocks can carry iso=np.int64 / resolution=np.float64; the
        # json.dump sits OUTSIDE the per-stock try/except, so an unconverted
        # numpy scalar used to abort the WHOLE import with a TypeError.
        from raw2film_tpu.film.import_sfl import import_stock

        class Stock:
            name = "NumpyMeta"
            manufacturer = "MockCo"
            year = np.int64(2003)
            stage = "camera"
            film_type = "negative"
            medium = "film"
            iso = np.int64(400)
            resolution = np.float64(125.0)
            density_measure = "status_m"
            comment = ""
            alias = ()
            mtf = None
            rms = np.float32(10.0)

            def get_density_curve(self, push_pull=0, color_masking=None):
                x = np.linspace(-4.0, 2.0, 96)
                d = 0.2 + 0.6 * 2.8 * (1 + np.tanh((x + 1.1) / 1.1)) / 2
                return np.stack([x, d, d * 1.05, d * 1.1])

        entry, _ = import_stock("NumpyMeta", Stock())
        dumped = json.dumps(entry)  # must not raise
        back = json.loads(dumped)
        assert back["iso"] == 400 and back["resolution"] == 125.0
        assert isinstance(back["year"], int)

    def test_discover_stocks_restores_sys_path(self, mock_sfl):
        # The checkout path must not leak into sys.path after discovery: a
        # stray utils.py/tests/ in the user's checkout would shadow
        # same-named modules for the rest of the process.
        src, _ = mock_sfl
        from raw2film_tpu.film.import_sfl import discover_stocks

        before = list(sys.path)
        stocks = discover_stocks(src)
        assert stocks and src not in sys.path
        assert sys.path == before

    def test_overlay_preserves_parametric_spectra(self, mock_sfl):
        # A same-name import must keep the parametric stock's tuned spectral
        # sensitivities/dyes (not observable through the sfl API), replacing
        # only the measured fields.
        src, out = mock_sfl
        from raw2film_tpu.film.import_sfl import import_sfl_stocks
        from raw2film_tpu.film.loader import _stocks, load_film_stocks

        import_sfl_stocks(src)
        doc = json.load(open(out))
        doc["stocks"][0]["name"] = "Kodak Portra 400"
        json.dump(doc, open(out, "w"))
        parametric = {s.name: s for s in _stocks()}["Kodak Portra 400"]
        load_film_stocks.cache_clear()
        try:
            got = load_film_stocks()["Kodak Portra 400"]
            assert got.provenance.startswith("imported from")
            assert got.sens == parametric.sens
            assert got.dyes == parametric.dyes
            # ...while the measured curve actually replaced the parametric.
            assert got.curve != parametric.curve
        finally:
            load_film_stocks.cache_clear()
