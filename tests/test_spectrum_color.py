"""Golden tests for the spectral/color pipeline (SURVEY.md section 4 item 1:
deterministic sub-oracles ported from the reference's pure functions)."""

import numpy as np
import jax.numpy as jnp
import pytest

from spectral_tpu.ops.color import (
    expand_srgb,
    srgb_gamma_compress,
    srgb_gamma_expand,
    srgb_to_xyz,
    xyz_to_srgb,
)
from spectral_tpu.ops.sellmeier import sellmeier_index
from spectral_tpu.ops.spectrum import (
    hero_wavelengths,
    spectrum_interp_shared,
    spectrum_to_xyz,
)
from spectral_tpu.utils.constants import (
    LAMBDA_MAX,
    LAMBDA_MIN,
    N_CIE_SAMPLES,
    cie_y,
    sellmeier_presets,
)


class TestSellmeier:
    def test_bk7_at_587nm(self):
        # BK7 n_d at the helium d-line, published value ~1.5168
        b, c = sellmeier_presets["BK7"]
        n = sellmeier_index(b, c, jnp.float32(587.6))
        assert abs(float(n) - 1.5168) < 1e-3

    def test_fused_silica_at_589nm(self):
        b, c = sellmeier_presets["fused_silica"]
        n = sellmeier_index(b, c, jnp.float32(589.29))
        assert abs(float(n) - 1.4585) < 1e-3

    def test_dispersion_monotonic_decreasing(self):
        # normal dispersion: n decreases with wavelength across the visible
        b, c = sellmeier_presets["flint_glass"]
        lams = jnp.linspace(400.0, 800.0, 64)
        n = sellmeier_index(b, c, lams)
        assert np.all(np.diff(np.array(n)) < 0)

    def test_batched_coefficients(self):
        b = jnp.stack([sellmeier_presets["BK7"][0], sellmeier_presets["flint_glass"][0]])
        c = jnp.stack([sellmeier_presets["BK7"][1], sellmeier_presets["flint_glass"][1]])
        n = sellmeier_index(b, c, jnp.array([587.6, 587.6]))
        assert n.shape == (2,)
        assert float(n[1]) > float(n[0])  # flint is denser than crown


class TestSpectrumInterp:
    def test_exact_at_grid_points(self):
        spd = jnp.arange(N_CIE_SAMPLES, dtype=jnp.float32)
        lam = LAMBDA_MIN + 5.0 * jnp.arange(N_CIE_SAMPLES)
        out = spectrum_interp_shared(spd, lam)
        np.testing.assert_allclose(np.array(out), np.array(spd), atol=1e-3)

    def test_midpoint_lerp(self):
        spd = jnp.zeros(N_CIE_SAMPLES).at[1].set(2.0)
        out = spectrum_interp_shared(spd, jnp.float32(LAMBDA_MIN + 2.5))
        assert abs(float(out) - 1.0) < 1e-5

    def test_clamped_extrapolation_matches_reference(self):
        # reference clamps the cell index but NOT the weight -> linear
        # extrapolation beyond the grid (spectrum.cu:11-22)
        spd = jnp.asarray(np.linspace(1.0, 2.0, N_CIE_SAMPLES, dtype=np.float32))
        hi = float(spectrum_interp_shared(spd, jnp.float32(LAMBDA_MAX + 10.0)))
        assert hi > 2.0


class TestHeroWavelengths:
    def test_shape_and_range(self):
        import jax

        lam = hero_wavelengths(jax.random.key(0), (1024,))
        a = np.array(lam)
        assert a.shape == (1024, 7)
        assert (a >= LAMBDA_MIN).all() and (a <= LAMBDA_MAX).all()

    def test_equal_spacing_with_wrap(self):
        import jax

        lam = np.array(hero_wavelengths(jax.random.key(1), (512,)))
        span = LAMBDA_MAX - LAMBDA_MIN
        step = span / 7.0
        d = (lam[:, 1:] - lam[:, :-1]) % span
        np.testing.assert_allclose(d, step, atol=1e-2)

    def test_hero_uniform(self):
        import jax

        lam = np.array(hero_wavelengths(jax.random.key(2), (200_000,)))[:, 0]
        hist, _ = np.histogram(lam, bins=10, range=(LAMBDA_MIN, LAMBDA_MAX))
        assert hist.min() > 0.9 * 20_000


class TestSpectrumToXYZ:
    def test_equal_energy_y(self):
        # SPD == 1 over all 7 wavelengths: Y approximates integral of ybar
        import jax

        lam = hero_wavelengths(jax.random.key(3), (4096,))
        power = jnp.ones_like(lam)
        n_valid = jnp.full((4096,), 7, jnp.int32)
        xyz = np.array(spectrum_to_xyz(lam, power, n_valid))
        # MC estimate of integral ybar d lambda = CIE_Y_INTEGRAL
        assert abs(xyz[:, 1].mean() - 106.857) / 106.857 < 0.05

    def test_n_valid_masks_tail(self):
        lam = jnp.full((1, 7), 550.0)
        power = jnp.ones((1, 7))
        full = spectrum_to_xyz(lam, power, jnp.array([7]))
        one = spectrum_to_xyz(lam, power, jnp.array([1]))
        zero = spectrum_to_xyz(lam, power, jnp.array([0]))
        np.testing.assert_allclose(np.array(full), 7 * np.array(one), rtol=1e-5)
        assert np.abs(np.array(zero)).max() == 0.0

    def test_gradient_flows_through_power(self):
        import jax

        lam = jnp.full((1, 7), 550.0)

        def f(p):
            return spectrum_to_xyz(lam, p, jnp.array([7]))[0, 1]

        g = jax.grad(f)(jnp.ones((1, 7)))
        assert np.isfinite(np.array(g)).all() and np.abs(np.array(g)).sum() > 0


class TestColor:
    def test_gamma_roundtrip(self):
        v = jnp.linspace(0.0, 1.0, 64)
        rt = srgb_gamma_expand(srgb_gamma_compress(v))
        np.testing.assert_allclose(np.array(rt), np.array(v), atol=2e-3)

    def test_srgb_xyz_roundtrip(self):
        rgb = jnp.array([[0.65, 0.05, 0.05], [0.2, 0.7, 0.3], [1.0, 1.0, 1.0]])
        rt = xyz_to_srgb(srgb_to_xyz(rgb))
        np.testing.assert_allclose(np.array(rt), np.array(rgb), atol=2e-3)

    def test_white_point(self):
        # linear white (1,1,1) -> D65 XYZ (x~0.9505, 1.0, 1.089)
        xyz = np.array(srgb_to_xyz(jnp.array([1.0, 1.0, 1.0])))
        np.testing.assert_allclose(xyz, [0.9505, 1.0, 1.089], atol=2e-3)

    def test_compress_clamps_like_reference(self):
        v = jnp.array([-0.5, 0.0, 0.5, 1.0, 2.0])
        out = np.array(srgb_gamma_compress(v))
        assert out[0] == 0.0 and out[-1] == 1.0
        assert (out >= 0).all() and (out <= 1).all()

    def test_expand_truncates(self):
        # reference: float(int(v * 255.99)) (color.cu:43-49)
        assert float(expand_srgb(jnp.float32(1.0))) == 255.0
        assert float(expand_srgb(jnp.float32(0.5))) == 127.0


class TestMiscUtils:
    def test_device_clamp(self):
        from spectral_tpu.utils.misc import device_clamp

        x = jnp.asarray([-1.0, 0.5, 2.0])
        np.testing.assert_allclose(np.asarray(device_clamp(x, 0.0, 1.0)), [0.0, 0.5, 1.0])

    def test_degrees_to_radians(self):
        from spectral_tpu.utils.misc import degrees_to_radians

        assert abs(degrees_to_radians(180.0) - np.pi) < 1e-12

    def test_random_permutation_and_int(self):
        import jax

        from spectral_tpu.utils.misc import random_int, random_permutation

        p = np.asarray(random_permutation(jax.random.PRNGKey(0), 16))
        assert sorted(p.tolist()) == list(range(16))
        v = np.asarray(random_int(jax.random.PRNGKey(1), (1000,), 2, 5))
        assert set(v.tolist()) == {2, 3, 4, 5}


class TestRgb2Spec:
    """sRGB -> sigmoid-spectrum uplift (ops/rgb2spec.py): the repo's
    replacement for the reference's stripped pbrt table
    (color/color_to_spectrum.cuh:69-219). Exact-fit path, gray closed
    form, and (round 5) the regenerated general-color trilinear table."""

    def test_gray_closed_form(self):
        from spectral_tpu.ops.rgb2spec import fit_sigmoid_coeffs, sigmoid

        for r in (0.0, 0.25, 0.73, 1.0):
            c = np.asarray(fit_sigmoid_coeffs(jnp.asarray([r, r, r])))
            assert c[0] == 0.0 and c[1] == 0.0
            # sigmoid(c2) == r identically (color_to_spectrum.cuh:79)
            np.testing.assert_allclose(
                float(sigmoid(jnp.asarray(c[2]))), r, atol=2e-7
            )

    def test_fit_roundtrip_stock_colors(self):
        from spectral_tpu.ops.rgb2spec import roundtrip_srgb, srgb_to_spectrum

        rgbs = jnp.asarray(
            [
                [0.65, 0.05, 0.05],
                [0.12, 0.45, 0.15],
                [0.73, 0.73, 0.73],
                [0.2, 0.3, 0.6],
            ],
            jnp.float32,
        )
        spd = srgb_to_spectrum(rgbs)
        back = np.asarray(roundtrip_srgb(spd))
        np.testing.assert_allclose(back, np.asarray(rgbs), atol=2e-3)

    @staticmethod
    def _table():
        from spectral_tpu.ops.rgb2spec import _load_coeff_table

        return _load_coeff_table()

    def test_table_lookup_vs_exact_fit(self):
        """Trilinear table vs the direct LM fit on random in-gamut
        colors: the renderer-visible quantity is the SPD; pin the max
        SPD deviation (documented accuracy of the O(1) path)."""
        if self._table() is None:
            pytest.skip("rgb2spec_table.npz not generated")
        import jax

        from spectral_tpu.ops.rgb2spec import (
            _fit_one,
            eval_sigmoid_poly,
            lookup_sigmoid_coeffs,
            SPD_LAMBDAS,
        )

        rng = np.random.default_rng(3)
        rgbs = jnp.asarray(rng.uniform(0.05, 0.95, (32, 3)), jnp.float32)
        c_tab = lookup_sigmoid_coeffs(rgbs)
        c_fit = jax.vmap(_fit_one)(rgbs)
        spd_tab = eval_sigmoid_poly(c_tab[:, None, :], SPD_LAMBDAS)
        spd_fit = eval_sigmoid_poly(c_fit[:, None, :], SPD_LAMBDAS)
        err = float(jnp.abs(spd_tab - spd_fit).max())
        assert err < 0.03, err  # documented: max 0.017 over 512 colors

    def test_table_roundtrip_color_error(self):
        """Acceptance metric the reference's own table is held to:
        rendered-back color of the table SPD vs the input color."""
        if self._table() is None:
            pytest.skip("rgb2spec_table.npz not generated")
        from spectral_tpu.ops.rgb2spec import (
            eval_sigmoid_poly,
            lookup_sigmoid_coeffs,
            roundtrip_srgb,
            SPD_LAMBDAS,
        )

        rng = np.random.default_rng(5)
        rgbs = jnp.asarray(rng.uniform(0.05, 0.95, (64, 3)), jnp.float32)
        spd = eval_sigmoid_poly(
            lookup_sigmoid_coeffs(rgbs)[:, None, :], SPD_LAMBDAS
        )
        back = np.asarray(roundtrip_srgb(spd))
        err = np.abs(back - np.asarray(rgbs)).max()
        assert err < 0.02, err

    def test_palette_cache_wins_over_table(self):
        """Stock scene colors keep their EXACT palette fits even with
        the table present (lookup order: memo -> palette -> table)."""
        if self._table() is None:
            pytest.skip("rgb2spec_table.npz not generated")
        from spectral_tpu.ops.rgb2spec import (
            _lookup_disk,
            fit_sigmoid_coeffs,
        )

        rgb = np.asarray([[0.65, 0.05, 0.05]], np.float32)
        disk = _lookup_disk(rgb)
        if disk is None:
            pytest.skip("palette disk table missing")
        got = np.asarray(fit_sigmoid_coeffs(jnp.asarray(rgb[0])))
        np.testing.assert_array_equal(got, disk[0])

    def test_palette_holds_exact_fits(self):
        """Canary for the round-5 palette-poisoning trap: regenerating
        rgb2spec_fits.npz while the caches exist bakes TABLE
        interpolation error into the palette (golden images moved by
        7.6e-3 before scripts/precompute_fits.py learned to delete the
        npz first and force RGB2SPEC_EXACT). Assert the shipped palette
        rows equal fresh LM fits."""
        import jax

        from spectral_tpu.ops.rgb2spec import _fit_one, _load_disk_table

        table = _load_disk_table()
        if table is None:
            pytest.skip("palette npz missing")
        rgb_t, co_t = table
        # spot-check two non-gray stock colors (a full check would cost
        # ~22 LM fits; these two are the ones that moved when the trap
        # fired)
        for probe in ((0.65, 0.05, 0.05), (0.8, 0.85, 0.88)):
            row = np.asarray(probe, np.float32)
            m = np.nonzero((rgb_t == row).all(axis=1))[0]
            assert m.size, f"{probe} missing from palette"
            fresh = np.asarray(_fit_one(jnp.asarray(row)))
            # vmap-vs-single fit differs at ulp level (~1e-5 abs);
            # table poisoning moved coefficients by ~1e-2 — the band
            # separates the two cleanly
            np.testing.assert_allclose(
                co_t[m[0]], fresh, rtol=1e-4, atol=1e-3,
                err_msg=f"palette row for {probe} is not an exact fit",
            )
