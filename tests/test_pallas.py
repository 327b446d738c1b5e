"""Pallas kernels in interpret mode vs the XLA reference implementations."""

import numpy as np
import pytest

import jax.numpy as jnp

from raw2film_tpu.ops import conv as convops
from raw2film_tpu.ops.pallas_conv import (
    conv_h_pallas,
    conv_w_pallas,
    sep_conv2d,
    sep_conv2d_rank,
    sep_conv2d_tiled,
)

RNG = np.random.default_rng(7)


def _img(h=64, w=96):
    return jnp.asarray(RNG.random((3, h, w)).astype(np.float32))


class TestPallasConv:
    def test_conv_w_matches(self):
        img = _img()
        k = convops.gaussian_kernel1d(1.5)
        want = np.asarray(convops._conv1d_axis(img, k, -1))
        got = np.asarray(conv_w_pallas(img, k, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_conv_h_matches(self):
        img = _img()
        k = convops.gaussian_kernel1d(2.0)
        want = np.asarray(convops._conv1d_axis(img, k, -2))
        got = np.asarray(conv_h_pallas(img, k, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-6)

    @pytest.mark.parametrize("hw", [(64, 96), (130, 200), (57, 321)])
    def test_tiled_matches_xla(self, hw):
        img = _img(*hw)
        kv = convops.gaussian_kernel1d(1.5)
        kh = convops.gaussian_kernel1d(2.2)
        want = np.asarray(convops.separable_conv(img, kv, kh))
        got = np.asarray(sep_conv2d_tiled(img, kv, kh, tile=(32, 128), interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_sep_conv2d_dispatch(self):
        img = _img()
        kv = convops.gaussian_kernel1d(1.2)
        kh = convops.gaussian_kernel1d(1.8)
        want = np.asarray(convops.separable_conv(img, kv, kh))
        got = np.asarray(sep_conv2d(img, kv, kh, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_rank_sum_matches_svd(self):
        img = _img()
        k2d = np.outer(
            convops.gaussian_kernel1d(1.2), convops.gaussian_kernel1d(1.2)
        ) + 0.01 * RNG.random((11, 11)).astype(np.float32)
        u, v = convops.svd_separable(k2d.astype(np.float32), tol=1e-6, max_rank=4)
        want = np.asarray(convops.conv2d_svd(img, u, v))
        got = np.asarray(sep_conv2d_rank(img, u, v, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_asymmetric_taps(self):
        img = _img(48, 160)
        kv = np.asarray([0.25, 0.5, 0.25], np.float32)
        kh = convops.gaussian_kernel1d(3.0)  # 13 taps
        want = np.asarray(convops.separable_conv(img, kv, kh))
        got = np.asarray(sep_conv2d_tiled(img, kv, kh, tile=(16, 128), interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestPallasConvV2:
    """v2: Mosaic-pipelined blocks with neighbor-block H halos."""

    @pytest.mark.parametrize("hw", [(600, 320), (137, 260), (64, 96)])
    def test_sep_conv_matches_xla(self, hw):
        from raw2film_tpu.ops import pallas_conv2 as pc2

        img = _img(*hw)
        kv = convops.gaussian_kernel1d(2.0)
        kh = convops.gaussian_kernel1d(1.4)
        want = np.asarray(convops.separable_conv(img, kv, kh))
        got = np.asarray(pc2.sep_conv(img, kv, kh, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_conv_h_neighbor_blocks(self):
        from raw2film_tpu.ops import pallas_conv2 as pc2

        img = _img(600, 256)
        k = convops.gaussian_kernel1d(3.0)  # 13 taps
        want = np.asarray(convops._conv1d_axis(img, k, -2))
        got = np.asarray(pc2.conv_h(img, k, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_rank_sum(self):
        from raw2film_tpu.ops import pallas_conv2 as pc2

        img = _img(300, 200)
        us = [convops.gaussian_kernel1d(1.0), 0.3 * convops.gaussian_kernel1d(2.0)]
        vs = [convops.gaussian_kernel1d(1.0), convops.gaussian_kernel1d(2.0)]
        want = sum(
            np.asarray(convops.separable_conv(img, u, v)) for u, v in zip(us, vs)
        )
        got = np.asarray(pc2.sep_conv_rank(img, us, vs, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5)
