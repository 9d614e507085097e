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
