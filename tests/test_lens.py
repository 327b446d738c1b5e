"""Lens correction: profile math, matching, application."""

import numpy as np

from raw2film_tpu.io.lens import (
    LensProfile,
    find_profile,
    lens_correction,
    undistort_coords,
    vignetting_gain,
)

PROFILE = LensProfile(
    make="TestCo",
    model="TestLens 35mm",
    dist_model="ptlens",
    dist_params=((35.0, 0.0, -0.02, 0.004),),
    vig_params=((35.0, 2.0, -0.8, 0.1, 0.0), (35.0, 8.0, -0.2, 0.0, 0.0)),
)


class TestProfiles:
    def test_distortion_interpolation(self):
        p = LensProfile(
            make="m",
            model="zoom",
            dist_params=((24.0, 0.0, -0.04, 0.0), (70.0, 0.0, 0.02, 0.0)),
        )
        a, b, c = p.distortion_at(47.0)
        assert abs(b - (-0.01)) < 1e-9

    def test_vignetting_aperture_interp(self):
        ks_open = PROFILE.vignetting_at(35.0, 2.0)
        ks_stopped = PROFILE.vignetting_at(35.0, 8.0)
        assert ks_open[0] < ks_stopped[0]  # stronger falloff wide open

    def test_find_profile_loose_match(self):
        profiles = [PROFILE]
        assert (
            find_profile({"EXIF:LensModel": "TESTLENS 35MM F/1.4"}, profiles)
            is PROFILE
        )
        assert find_profile({"EXIF:Make": "testco"}, profiles) is PROFILE
        assert find_profile({"EXIF:Make": "OtherCo"}, profiles) is None


class TestApplication:
    def test_vignetting_gain_shape(self):
        g = np.asarray(vignetting_gain((32, 48), (-0.8, 0.1, 0.0)))
        # Corners darkest in capture -> largest gain; center gain 1.
        assert abs(g[16, 24] - 1.0) < 1e-3
        assert g[0, 0] > g[16, 24]

    def test_undistort_coords_identity_when_none(self):
        c = undistort_coords((16, 16), "none", ())
        yy, xx = np.mgrid[0:16, 0:16]
        np.testing.assert_allclose(c[0], yy, atol=1e-9)

    def test_correction_flattens_vignette(self):
        h, w = 64, 96
        img = np.full((3, h, w), 0.5, np.float32)
        ks = PROFILE.vignetting_at(35.0, 2.0)
        falloff = 1.0 / np.asarray(vignetting_gain((h, w), ks))
        captured = img * falloff[None]
        out = lens_correction(
            captured,
            {"EXIF:FocalLength": 35.0, "EXIF:FNumber": 2.0},
            LensProfile(make="x", model="y", dist_model="none", vig_params=PROFILE.vig_params),
        )
        np.testing.assert_allclose(out, img, atol=1e-4)

    def test_missing_exif_is_noop(self):
        img = np.random.default_rng(0).random((3, 16, 16)).astype(np.float32)
        out = lens_correction(img, {}, PROFILE)
        np.testing.assert_array_equal(out, img)

    def test_distortion_remap_runs(self):
        img = np.random.default_rng(0).random((3, 48, 64)).astype(np.float32)
        out = lens_correction(
            img, {"EXIF:FocalLength": 35.0, "EXIF:FNumber": 4.0}, PROFILE
        )
        assert out.shape == img.shape
        assert np.all(np.isfinite(out))
