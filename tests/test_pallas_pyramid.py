"""Pallas pyramid resample kernels vs their XLA reference semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raw2film_tpu.ops import conv as convops
from raw2film_tpu.ops.pallas_pyramid import (
    bilinear_upsample_pallas,
    box_downsample_pallas,
)

RNG = np.random.default_rng(7)


def _img(c, h, w):
    return jnp.asarray(RNG.normal(0.3, 0.2, (c, h, w)).astype(np.float32))


class TestBoxDownsample:
    @pytest.mark.parametrize("f", [2, 4, 8])
    @pytest.mark.parametrize("hw", [(96, 1280), (70, 1333)])
    def test_matches_xla(self, f, hw):
        img = _img(3, *hw)
        want = convops.box_downsample(img, f)
        got = box_downsample_pallas(img, f, chunk=256, interpret=True)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_small_image_fallback(self):
        img = _img(3, 12, 40)
        want = convops.box_downsample(img, 4)
        got = box_downsample_pallas(img, 4, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    @pytest.mark.parametrize("f", [55, 110])
    def test_large_factor(self, f):
        """The burn glow downsamples by f ~ min(H,W)/50 (>100 at 45MP)."""
        img = _img(1, 9 * f + 13, 15 * f + 7)
        want = convops.box_downsample(img, f)
        got = box_downsample_pallas(img, f, interpret=True)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


class TestBilinearUpsample:
    @pytest.mark.parametrize("f", [2, 4])
    def test_matches_jax_resize(self, f):
        img = _img(3, 48, 400)
        oh, ow = 48 * f, 400 * f
        want = jax.image.resize(img, (3, oh, ow), method="bilinear")
        got = bilinear_upsample_pallas(img, f, (oh, ow), chunk=256, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
        )

    def test_cropped_output(self):
        img = _img(1, 40, 400)
        want = jax.image.resize(img, (1, 160, 1600), method="bilinear")[:, :157, :1595]
        got = bilinear_upsample_pallas(img, 4, (157, 1595), chunk=256, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
        )

    def test_small_image_fallback(self):
        img = _img(3, 10, 30)
        want = jax.image.resize(img, (3, 40, 120), method="bilinear")
        got = bilinear_upsample_pallas(img, 4, (40, 120), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    @pytest.mark.parametrize("f", [55, 110])
    def test_large_factor(self, f):
        img = _img(1, 11, 31)
        want = jax.image.resize(img, (1, 11 * f, 31 * f), method="bilinear")
        got = bilinear_upsample_pallas(img, f, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
        )


class TestMatmulResample:
    """The dense selection-matmul formulation (large-f burn glow path)."""

    @pytest.mark.parametrize("f", [24, 110])
    def test_box_downsample_mxu(self, f):
        img = _img(1, 5 * f + 13, 9 * f + 7)
        want = convops.box_downsample(img, f)
        got = convops.box_downsample_mxu(img, f)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    @pytest.mark.parametrize("f", [24, 110])
    def test_bilinear_upsample_mxu(self, f):
        img = _img(1, 7, 11)
        want = jax.image.resize(img, (1, 7 * f, 11 * f), method="bilinear")
        got = convops.bilinear_upsample_mxu(img, f)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
        )

    def test_down_up_blur_matches_xla(self, monkeypatch):
        """burn.down_up_blur's MXU route must match the XLA formulation."""
        from raw2film_tpu.ops import burn as burn_ops

        mask = jnp.asarray(
            np.maximum(RNG.normal(0.1, 0.4, (1, 9 * 55 + 13, 15 * 55 + 7)), 0).astype(np.float32)
        )
        want = burn_ops.down_up_blur(mask, burn_scale=9.0)  # factor 56
        monkeypatch.setattr(convops, "_use_pallas", lambda: True)
        got = burn_ops.down_up_blur(mask, burn_scale=9.0)
        assert got.shape == want.shape
        # zoom_upsample (align-corners-ish) vs half-pixel bilinear differ at
        # sub-pixel scale on a heavily-blurred low-res mask.
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-3)


class TestHalationPallasTier:
    def test_pyramid_grouped_path_close_to_exact(self, monkeypatch):
        """The pallas halation tier (fused full-res ranks + shared pyramid
        level per factor) must stay within the fit-residual gate of the
        exact kernel — run in interpret mode on CPU."""
        from functools import partial

        from raw2film_tpu.ops import conv as convops
        from raw2film_tpu.ops import halation as hal_ops
        from raw2film_tpu.ops import pallas_conv2, pallas_pyramid

        monkeypatch.setattr(convops, "_use_pallas", lambda: True)
        monkeypatch.setattr(
            hal_ops.pallas_conv2 if hasattr(hal_ops, "pallas_conv2") else pallas_conv2,
            "fused_sep_rank_mxu",
            partial(pallas_conv2.fused_sep_rank_mxu, chunk=256, interpret=True),
        )
        monkeypatch.setattr(
            pallas_pyramid,
            "box_downsample_pallas",
            partial(pallas_pyramid.box_downsample_pallas, chunk=128, interpret=True),
        )
        monkeypatch.setattr(
            pallas_pyramid,
            "bilinear_upsample_pallas",
            partial(pallas_pyramid.bilinear_upsample_pallas, chunk=128, interpret=True),
        )
        img = jnp.asarray((RNG.random((3, 200, 1408)) * 2).astype(np.float32))
        scale = 220.0  # kernel size 55 px -> mixture path with pyramid terms
        fast = np.asarray(hal_ops.halation(img, scale=scale))
        exact = np.asarray(hal_ops.halation(img, scale=scale, exact=True))
        assert np.abs(fast - exact).max() < 0.02
        assert np.abs(fast - exact).mean() < 0.004


class TestHalfSizeDecode:
    @pytest.mark.parametrize("pattern,ry,rx", [("RGGB", 0, 0), ("BGGR", 1, 1), ("GRBG", 0, 1)])
    def test_matches_strided_slices(self, pattern, ry, rx):
        from raw2film_tpu.ops.pallas_pyramid import half_size_decode_pallas

        bayer = jnp.asarray(RNG.random((96, 1280)).astype(np.float32))
        got = half_size_decode_pallas(bayer, ry, rx, chunk=256, interpret=True)
        x = np.asarray(bayer)
        r = x[ry::2, rx::2]
        b = x[1 - ry :: 2, 1 - rx :: 2]
        g = 0.5 * (x[ry::2, 1 - rx :: 2] + x[1 - ry :: 2, rx::2])
        want = np.stack([r, g, b])
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    def test_small_returns_none(self):
        from raw2film_tpu.ops.pallas_pyramid import half_size_decode_pallas

        bayer = jnp.asarray(RNG.random((20, 40)).astype(np.float32))
        assert half_size_decode_pallas(bayer, 0, 0, interpret=True) is None
