"""Pallas kernels in interpret mode vs the XLA reference implementations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raw2film_tpu.ops import conv as convops
RNG = np.random.default_rng(7)


def _img(h=64, w=96):
    return jnp.asarray(RNG.random((3, h, w)).astype(np.float32))


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


class TestPallasGrain:
    def test_hash_mirror_matches_kernel(self):
        """grain_field_hash (the jnp mirror every non-pallas backend uses)
        reproduces the pallas kernel's field — same hash, same taps, same
        row-offset semantics — to fp-association noise."""
        import numpy as np

        from raw2film_tpu.ops.pallas_grain import (
            grain_field_hash,
            grain_field_pallas,
            seed2,
        )

        sd = seed2(1234, 7)
        a = np.asarray(grain_field_hash(sd, (40, 256), 0.9))
        b = np.asarray(grain_field_pallas(sd, (40, 256), 0.9, interpret=True))
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)
        # The global row offset shifts the field (space-sharding contract).
        c = np.asarray(grain_field_hash(seed2(1234, 0), (40, 256), 0.9))
        assert not np.array_equal(a, c)


    """Stateless-hash grain kernel (interpret mode)."""

    def test_statistics(self):
        from scipy import stats as sstats

        from raw2film_tpu.ops.pallas_grain import grain_field_pallas

        f = np.asarray(grain_field_pallas(7, (256, 256), sigma_px=0.0, interpret=True))
        assert abs(float(f.mean())) < 0.02
        assert 0.97 < float(f.std()) < 1.03
        assert abs(float(sstats.kurtosis(f.ravel()))) < 0.1  # gaussian

    def test_correlated_field_unit_variance(self):
        from raw2film_tpu.ops.pallas_grain import grain_field_pallas

        f = np.asarray(grain_field_pallas(3, (256, 256), sigma_px=1.2, interpret=True))
        assert 0.9 < float(f.std()) < 1.1
        # Neighbor correlation present after the correlation kernel.
        c = np.corrcoef(f[0, :, :-1].ravel(), f[0, :, 1:].ravel())[0, 1]
        assert c > 0.2

    def test_tile_size_invariance(self):
        from raw2film_tpu.ops.pallas_grain import grain_field_pallas

        a = np.asarray(grain_field_pallas(7, (128, 192), 0.9, interpret=True, tile_h=64))
        b = np.asarray(grain_field_pallas(7, (128, 192), 0.9, interpret=True, tile_h=16))
        np.testing.assert_array_equal(a, b)

    def test_deterministic_and_seed_sensitive(self):
        from raw2film_tpu.ops.pallas_grain import grain_field_pallas

        a = np.asarray(grain_field_pallas(7, (64, 128), 0.9, interpret=True))
        b = np.asarray(grain_field_pallas(7, (64, 128), 0.9, interpret=True))
        c = np.asarray(grain_field_pallas(8, (64, 128), 0.9, interpret=True))
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_fused_apply_matches_composition(self):
        from raw2film_tpu.ops.pallas_grain import grain_apply_pallas, grain_field_pallas

        rng = np.random.default_rng(0)
        d = jnp.asarray(rng.uniform(0.3, 2.5, (3, 96, 200)).astype(np.float32))
        out = np.asarray(
            grain_apply_pallas(d, 7, 0.9, 0.04, 0.15, 0.17, 2.38, 0.2, 0.37, interpret=True)
        )
        f = np.asarray(grain_field_pallas(7, (96, 200), 0.9, interpret=True))
        dd = np.asarray(d)
        t = (dd - 0.2) * 0.37
        shape = 0.15 + 0.85 * np.exp(-0.5 * ((t - 0.17 - 0.25) * 2.38) ** 2)
        want = np.maximum(dd + 0.04 * shape * f, 0)
        np.testing.assert_allclose(out, want, atol=1e-6)


class TestMtfGrainMegaFusion:
    def test_fused_equals_sequential(self):
        """MTF conv + grain epilogue in one kernel == conv then
        grain_apply_pallas (the grain field is positionally stateless)."""
        from raw2film_tpu.ops import pallas_conv2 as pc2
        from raw2film_tpu.ops.pallas_grain import grain_apply_pallas

        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.uniform(0.2, 2.4, (3, 128, 640)).astype(np.float32))
        u = rng.random((3, 2, 9)).astype(np.float32) * 0.3
        v = rng.random((3, 2, 9)).astype(np.float32) * 0.3
        seed = jnp.asarray([13], jnp.uint32)
        prm = jnp.asarray([0.04, 0.15, 0.17, 2.38, 0.2, 0.37], jnp.float32)
        sigma_px = 0.9
        fused = pc2.fused_sep_rank_mxu(
            img, u, v, chunk=256, interpret=True,
            grain=(seed, prm, sigma_px),
        )
        assert fused is not None
        conv = pc2.fused_sep_rank_mxu(img, u, v, chunk=256, interpret=True)
        want = grain_apply_pallas(
            conv, seed, sigma_px, *[float(p) for p in np.asarray(prm)],
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(want), atol=1e-6
        )

    def test_fallback_returns_none(self):
        from raw2film_tpu.ops import pallas_conv2 as pc2

        rng = np.random.default_rng(4)
        img = jnp.asarray(rng.random((3, 24, 40)).astype(np.float32))
        u = rng.random((3, 1, 5)).astype(np.float32)
        v = rng.random((3, 1, 5)).astype(np.float32)
        seed = jnp.asarray([13], jnp.uint32)
        prm = jnp.asarray([0.04, 0.15, 0.17, 2.38, 0.2, 0.37], jnp.float32)
        assert (
            pc2.fused_sep_rank_mxu(
                img, u, v, interpret=True, grain=(seed, prm, 0.9)
            )
            is None
        )


class TestHalationMega:
    def test_mega_equals_separate_kernels(self):
        """ranks + pyramid upsample + combine in one kernel == the separate
        fused_sep_rank_mxu + bilinear_upsample_pallas + XLA combine."""
        from raw2film_tpu.ops import pallas_conv2 as pc2
        from raw2film_tpu.ops import pallas_halation, pallas_pyramid

        rng = np.random.default_rng(5)
        h, w = 160, 1088  # h % (4*32) == 0, w > 2*chunk at chunk=384
        img = jnp.asarray(rng.uniform(0.0, 2.0, (3, h, w)).astype(np.float32))
        u = [convops.gaussian_kernel1d(1.5), 0.4 * convops.gaussian_kernel1d(3.0)]
        v = [convops.gaussian_kernel1d(1.5), convops.gaussian_kernel1d(3.0)]
        small = pallas_pyramid.box_downsample_pallas(img, 4, chunk=128, interpret=True)
        sk = convops.gaussian_kernel1d(2.0)
        small_blur = pc2.fused_sep_rank_mxu(
            small, [0.3 * sk], [sk], chunk=128, interpret=True
        )
        factors = jnp.asarray([1.0, 0.3, 0.0], jnp.float32)

        rows_up = pallas_pyramid.bilinear_upsample_rows_pallas(
            small_blur, 4, oh=h, interpret=True
        )
        got = pallas_halation.halation_mega(
            img, u, v, rows_up, factors, chunk=384, interpret=True
        )
        assert got is not None

        blur = pc2.fused_sep_rank_mxu(img, u, v, chunk=384, interpret=True)
        blur = blur + pallas_pyramid.bilinear_upsample_pallas(
            small_blur, 4, (h, w), chunk=256, interpret=True
        )
        f = np.asarray(factors).reshape(3, 1, 1)
        want = (np.asarray(img) + f * np.asarray(blur)) / (1.0 + f)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_develop_epilogue_matches_xla_develop(self):
        """halation_mega(develop=prm) == XLA log10 + H&D over the plain
        combined output (identity-masking fast path)."""
        from raw2film_tpu.ops import pallas_conv2 as pc2
        from raw2film_tpu.ops import pallas_halation, pallas_pyramid

        rng = np.random.default_rng(8)
        h, w = 160, 1088
        img = jnp.asarray(rng.uniform(0.0, 2.0, (3, h, w)).astype(np.float32))
        u = [convops.gaussian_kernel1d(1.5)]
        v = [convops.gaussian_kernel1d(1.5)]
        small = pallas_pyramid.box_downsample_pallas(img, 4, chunk=128, interpret=True)
        sk = convops.gaussian_kernel1d(2.0)
        small_blur = pc2.fused_sep_rank_mxu(small, [0.3 * sk], [sk], chunk=128, interpret=True)
        rows_up = pallas_pyramid.bilinear_upsample_rows_pallas(
            small_blur, 4, oh=h, interpret=True
        )
        factors = jnp.asarray([1.0, 0.3, 0.0], jnp.float32)
        flare = 0.0015
        dmin = np.array([0.2, 0.6, 0.9])
        gamma = np.array([0.6, 0.63, 0.66])
        x_t = np.array([-2.4, -2.4, -2.4])
        x_s = np.array([0.9, 0.9, 0.9])
        w_t = np.array([0.4, 0.4, 0.4])
        w_s = np.array([0.6, 0.6, 0.6])
        prm = jnp.asarray(
            np.concatenate([[flare], dmin, gamma, x_t, x_s, w_t, w_s]), jnp.float32
        )
        got = pallas_halation.halation_mega(
            img, u, v, rows_up, factors, chunk=384, interpret=True, develop=prm
        )
        assert got is not None
        plain = pallas_halation.halation_mega(
            img, u, v, rows_up, factors, chunk=384, interpret=True
        )
        e = np.asarray(plain)
        x = np.log10(np.maximum(e + flare, 1e-6))

        def softp(u_, w_):
            t = u_ / w_
            return w_ * (np.maximum(t, 0) + np.log1p(np.exp(-np.abs(t))))

        c = lambda a: a.reshape(3, 1, 1)
        want = c(dmin) + c(gamma) * (
            softp(x - c(x_t), c(w_t)) - softp(x - c(x_s), c(w_s))
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_rows_upsample_matches_resize(self):
        from raw2film_tpu.ops import pallas_pyramid

        rng = np.random.default_rng(7)
        img = jnp.asarray(rng.random((3, 40, 272)).astype(np.float32))
        want = jax.image.resize(img, (3, 160, 272), method="bilinear")
        got = pallas_pyramid.bilinear_upsample_rows_pallas(img, 4, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
        )

    def test_unservable_shape_returns_none(self):
        from raw2film_tpu.ops import pallas_halation

        rng = np.random.default_rng(6)
        img = jnp.asarray(rng.random((3, 98, 600)).astype(np.float32))  # 98 % tile != 0
        small = jnp.asarray(rng.random((3, 98, 150)).astype(np.float32))
        out = pallas_halation.halation_mega(
            img, [np.ones(3) / 3], [np.ones(3) / 3],
            small, jnp.asarray([1.0, 0.3, 0.0]), interpret=True,
        )
        assert out is None


class TestFusedRankPerChannel:
    def test_per_channel_single_launch_matches_xla(self):
        import numpy as np

        from raw2film_tpu.ops import conv as convops
        from raw2film_tpu.ops import pallas_conv2 as pc2

        rng = np.random.default_rng(11)
        img = jnp.asarray(rng.random((3, 96, 640)).astype(np.float32))
        # Distinct per-channel separable rank-2 kernels, equal tap lengths.
        u = rng.random((3, 2, 9)).astype(np.float32) * 0.3
        v = rng.random((3, 2, 9)).astype(np.float32) * 0.3
        got = np.asarray(pc2.fused_sep_rank_mxu(img, u, v, chunk=256, interpret=True))
        for c in range(3):
            want = None
            for r in range(2):
                term = convops._conv1d_axis(
                    convops._conv1d_axis(img[c : c + 1], u[c, r], -2), v[c, r], -1
                )
                want = term if want is None else want + term
            np.testing.assert_allclose(got[c], np.asarray(want)[0], atol=2e-5)

    def test_per_channel_small_image_fallback(self):
        import numpy as np

        from raw2film_tpu.ops import conv as convops
        from raw2film_tpu.ops import pallas_conv2 as pc2

        rng = np.random.default_rng(12)
        img = jnp.asarray(rng.random((3, 24, 40)).astype(np.float32))
        u = rng.random((3, 1, 5)).astype(np.float32)
        v = rng.random((3, 1, 5)).astype(np.float32)
        got = np.asarray(pc2.fused_sep_rank_mxu(img, u, v, interpret=True))
        for c in range(3):
            want = convops._conv1d_axis(
                convops._conv1d_axis(img[c : c + 1], u[c, 0], -2), v[c, 0], -1
            )
            np.testing.assert_allclose(got[c], np.asarray(want)[0], atol=2e-5)


class TestPallasDemosaic:
    @pytest.mark.parametrize("pattern", ["RGGB", "BGGR", "GRBG"])
    def test_matches_xla_formulation(self, pattern):
        from raw2film_tpu.ops import demosaic as dm
        from raw2film_tpu.ops.pallas_demosaic import demosaic_mhc_pallas

        rng = np.random.default_rng(9)
        bayer = jnp.asarray(rng.random((128, 640)).astype(np.float32))
        want = dm.demosaic_mhc(bayer, pattern)  # XLA path (pallas off on CPU)
        ry, rx = dm._PATTERNS[pattern]
        got = demosaic_mhc_pallas(bayer, ry, rx, chunk=256, interpret=True)
        assert got is not None
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)

    def test_unservable_returns_none(self):
        from raw2film_tpu.ops.pallas_demosaic import demosaic_mhc_pallas

        bayer = jnp.zeros((50, 600), jnp.float32)  # 50 % 32 != 0
        assert demosaic_mhc_pallas(bayer, 0, 0, interpret=True) is None

    def test_matrix_epilogue_matches_staged(self):
        """The input-transform epilogue (clip01 -> 3x3 -> max0 in-kernel)
        must equal the staged demosaic -> clip -> scalar mul-adds to f32
        ulps (same expressions and association; XLA may contract mul-add
        to FMA differently between the two programs)."""
        from raw2film_tpu.ops import demosaic as dm
        from raw2film_tpu.ops.pallas_demosaic import demosaic_mhc_pallas

        rng = np.random.default_rng(12)
        bayer = jnp.asarray(rng.normal(0.4, 0.3, (128, 640)).astype(np.float32))
        mat = jnp.asarray(rng.normal(0.3, 0.4, (3, 3)).astype(np.float32))
        got = demosaic_mhc_pallas(bayer, 0, 0, chunk=256, interpret=True, mat=mat)
        assert got is not None
        rgb = jnp.clip(
            demosaic_mhc_pallas(bayer, 0, 0, chunk=256, interpret=True), 0.0, 1.0
        )
        want = np.stack(
            [
                np.asarray(
                    jnp.maximum(
                        mat[c, 0] * rgb[0] + mat[c, 1] * rgb[1] + mat[c, 2] * rgb[2],
                        0.0,
                    )
                )
                for c in range(3)
            ]
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=3e-7)


class TestColmergeAndHalos:
    """The halo-row-band inputs and the merged column-conv matmul are pure
    layout/utilization changes: outputs must match the unmerged path to fp
    association noise, for unequal supports (the zero-pad embed) and in the
    padded (non-dividing height) mode."""

    def _g(self, n, s):
        k = np.exp(-0.5 * (np.arange(n) - n // 2) ** 2 / s**2)
        return k / k.sum()

    def test_colmerge_matches_unmerged_unequal_supports(self):
        from raw2film_tpu.ops import pallas_conv2 as pc2

        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.uniform(0, 2, (3, 96, 600)).astype(np.float32))
        u = [self._g(27, 3.0), 0.5 * self._g(11, 1.5)]
        v = [self._g(27, 3.0), self._g(11, 1.5)]
        a = pc2.fused_sep_rank_mxu(
            img, u, v, tile_h=32, chunk=256, interpret=True, colmerge=True
        )
        b = pc2.fused_sep_rank_mxu(
            img, u, v, tile_h=32, chunk=256, interpret=True, colmerge=False
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)

    def test_colmerge_matches_in_padded_mode(self):
        from raw2film_tpu.ops import pallas_conv2 as pc2

        rng = np.random.default_rng(4)
        img = jnp.asarray(rng.uniform(0, 2, (3, 98, 600)).astype(np.float32))
        u = [self._g(23, 2.0)]
        v = [self._g(23, 2.0)]
        a = pc2.fused_sep_rank_mxu(
            img, u, v, tile_h=32, chunk=256, interpret=True, colmerge=True
        )
        b = pc2.fused_sep_rank_mxu(
            img, u, v, tile_h=32, chunk=256, interpret=True, colmerge=False
        )
        assert a.shape == (3, 98, 600)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)

    def test_halation_mega_chunk_invariance(self):
        """chunk is a pure tiling knob: 128 vs 384 must agree."""
        from raw2film_tpu.ops import pallas_halation, pallas_pyramid

        rng = np.random.default_rng(5)
        h, w = 160, 1088
        img = jnp.asarray(rng.uniform(0.0, 2.0, (3, h, w)).astype(np.float32))
        u = [self._g(15, 1.5), 0.4 * self._g(19, 3.0)]
        v = [self._g(15, 1.5), self._g(19, 3.0)]
        small = jnp.asarray(
            rng.uniform(0.0, 2.0, (3, h // 4, w // 4)).astype(np.float32)
        )
        rows_up = pallas_pyramid.bilinear_upsample_rows_pallas(
            small, 4, oh=h, interpret=True
        )
        factors = jnp.asarray([1.0, 0.3, 0.0])
        outs = [
            np.asarray(
                pallas_halation.halation_mega(
                    img, u, v, rows_up, factors,
                    chunk=c, interpret=True, colmerge=m,
                )
            )
            for c, m in ((128, True), (384, True), (384, False))
        ]
        np.testing.assert_allclose(outs[0], outs[1], atol=2e-6)
        np.testing.assert_allclose(outs[1], outs[2], atol=2e-6)


class TestAutoTileChooser:
    """Pin the auto tile for the shapes the 45MP fused chain actually uses.

    Tile choice is program-context-sensitive on Mosaic: demoting the /4
    halation-pyramid blur from 48 to 32 at 1368x2052 flipped the whole
    fused 45MP chain to a compile failure even though the smaller tile
    compiled in other programs. These pins make a chooser edit that would
    alter the chain's proven tiles fail fast on CPU.
    """

    def _ranks(self, n, r, scale=1.0):
        k = np.exp(-0.5 * (np.arange(n) - n // 2) ** 2 / (scale * n / 6) ** 2)
        return [k / k.sum()] * r

    def test_pyramid_small_blur_shape_keeps_tile_48(self):
        from raw2film_tpu.ops.pallas_conv2 import _auto_tile

        # The /4 pyramid level of the 45MP frame (5472/4 x 8208/4), two
        # ~15-27 tap Gaussian terms: long-standing, chain-proven tile 48.
        u = self._ranks(15, 1) + self._ranks(27, 1)
        assert _auto_tile(1368, 2052, u, u, 512, 13, 13) == 48

    def test_full_res_rank4_keeps_tile_48_with_halo_bands(self):
        from raw2film_tpu.ops.pallas_conv2 import _auto_tile

        # Full-res 45MP rank-4 (the staged halation fallback): with the
        # halo-row-band inputs (no full prev/next neighbor blocks) the VMEM
        # estimate clears the budget at 48 — before the refactor this shape
        # demoted to 32 (the old estimate counted 4 full-tile blocks).
        u = self._ranks(27, 4)
        assert _auto_tile(5472, 8208, u, u, 512, 13, 13) == 48

    def test_divisibility_still_preferred(self):
        from raw2film_tpu.ops.pallas_conv2 import _auto_tile

        # 2448 % 48 == 0 and the estimate fits: pad-free 48.
        u = self._ranks(27, 4)
        assert _auto_tile(2448, 3672, u, u, 512, 13, 13) == 48

    def test_halation_mega_45mp_budget_gate(self):
        """Pin the mega chooser's VMEM gate to the on-chip record (v5e,
        45MP, round 3): (96, 256) measured fastest at an 18.0M model
        estimate, so the default 18.1M budget admits 96 and 72; the
        13M conservative budget (the downgrade-ladder rung) reproduces
        the always-safe tile 48; (96, 512) ~22.4M and (144, 256) ~25M
        hard-failed compilation and must stay rejected by both."""
        from raw2film_tpu.ops.pallas_halation import _mega_vmem_ok

        # default (measured 18.1M) budget
        assert _mega_vmem_ok(96, 8208, 256, 4, 13, 13)
        assert _mega_vmem_ok(72, 8208, 256, 4, 13, 13)
        assert _mega_vmem_ok(48, 8208, 256, 4, 13, 13)
        assert not _mega_vmem_ok(96, 8208, 512, 4, 13, 13)
        assert not _mega_vmem_ok(144, 8208, 256, 4, 13, 13)
        # conservative (13M) rung: only the proven-safe tile 48 passes
        assert _mega_vmem_ok(48, 8208, 256, 4, 13, 13, budget=13_000_000)
        assert not _mega_vmem_ok(72, 8208, 256, 4, 13, 13, budget=13_000_000)
        assert not _mega_vmem_ok(96, 8208, 256, 4, 13, 13, budget=13_000_000)

    def test_demosaic_45mp_tile_record(self):
        """Round-4 on-chip record (benchmarks/demosaic_sweep.py): tile 48 at
        (45MP, chunk 1024) runs 3.58 ms vs 5.16 for tile 32; tile 72 and
        chunk 2048 hard-fail the compile. The chooser must pick 48 at the
        production shape and reject the measured-failing configs."""
        from raw2film_tpu.ops.pallas_demosaic import (
            _demosaic_tile,
            _demosaic_vmem_ok,
        )

        assert _demosaic_tile(5472, 8208, 1024) == 48
        assert _demosaic_vmem_ok(48, 8208, 1024)
        assert not _demosaic_vmem_ok(72, 8208, 1024)
        assert not _demosaic_vmem_ok(48, 8208, 2048)

    def test_mtf_grain_mega_45mp_tile_record(self):
        """Pin the MTF+grain mega chooser to the round-4 on-chip sweep
        (v5e, 45MP, benchmarks/mtf_sweep.py): (96, 256) measured 5.68 ms
        vs 14.45 for the previously shipped (32, 512) — the halo row-band
        refactor freed the VMEM that used to cap this kernel at tile 32.
        The conservative rung keeps the long-proven (32, 512), and the
        historical OOM configuration (48, 512) must never be chosen."""
        from raw2film_tpu.ops.mtf import _grain_mega_tile, _grain_vmem_ok

        # 45MP production shape (5472 % 96 == 0): the measured-fastest pick.
        assert _grain_mega_tile(5472, 8208, 4, 13, 13) == (96, 256)
        # conservative downgrade rung: the proven-safe config.
        assert _grain_mega_tile(5472, 8208, 4, 13, 13, conservative=True) == (32, 512)
        # 24MP-class heights not divisible by the tall tiles fall through
        # to a measured smaller config, never (48, 512).
        t, c = _grain_mega_tile(4000, 6000, 4, 13, 13)
        assert (t, c) != (48, 512)
        # The VMEM gate rejects unmeasured growth past the calibration point.
        assert _grain_vmem_ok(96, 8208, 256, 4, 13, 13)
        assert not _grain_vmem_ok(96, 12000, 256, 4, 13, 13)
