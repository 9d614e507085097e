"""Reparameterized hero-wavelength sampling: exact Sellmeier gradients.

The problem (VERDICT round 1, missing item 1): with fixed random numbers,
the path radiance is PIECEWISE CONSTANT in the Sellmeier coefficients.
Every B/C-dependence of the estimator routes through the scalar refractive
index n(lambda_hero; B, C) (reference materials/material.cu:73-80 computes
n once per dielectric interaction from the hero wavelength,
refraction/sellmeier.cu:12-23): the refraction direction, the Schlick
probability, and total internal reflection all depend on (B, C) only via
n. Nudging B rotates refracted directions, which only changes the radiance
when a hit decision flips — a measure-zero event — so both AD and
fixed-seed FD are 0.0 almost everywhere.

The fix is a change of variables in the hero-wavelength sample (a
reparameterized integrand in the sense of Loubet et al. 2019): instead of
sampling lambda directly, treat the sampled lambda_0 as defining a TARGET
INDEX n* = n(lambda_0; sg(B), sg(C)) and solve

    n(lambda(u; B, C); B, C) = n*                            (IFT)

for the wavelength actually traced. At the primal point lambda == lambda_0
(forward values are bit-identical), but the implicit-function derivative

    d lambda / d B = - (dn/dB) / (dn/dlambda)

is nonzero. Because n is now CONSTANT w.r.t. (B, C) along the sample, the
path geometry, the Schlick test and TIR are all frozen: the estimator
becomes a smooth function of (B, C) through the wavelength-dependent
spectral factors (material SPD sigmoids, CIE responses, D65, background
lerp), plus the Jacobian of the change of variables

    J(u; B, C) = dn/dlambda(lambda_0; sg) / dn/dlambda(lambda; B, C)

(primal value 1). Expectations are unchanged — the map is a measure-
preserving reparameterization of the SAME integral — while per-sample AD
now equals the derivative of the expected image. Finite differences of the
reparameterized estimator are nonzero and match AD to O(eps): under a B
perturbation of size eps the frozen index drifts only at O(eps^2), so
discrete decisions flip with probability O(eps^2).

Physically this is exact: d pixel / dB measures how the rainbow's spectral
assignment shifts when dispersion changes — under the reparameterization
each traced path keeps its geometry while its associated wavelength (and
hence CIE color and emission weight) slides along the dispersion curve.

Exactness caveats (documented, both negligible or scoped):
1. Hero-comb wraparound: the 7 companion wavelengths move rigidly with the
   hero and wrap at the gamut edge (spectrum/spectrum.cu:31-48). The
   wrap-jump boundary term is proportional to the CIE responses at 360/830
   nm, which are ~1e-4 of peak — below MC noise at any practical spp.
2. One dispersive glass per estimator: the change of variables freezes
   n for ONE (B, C) pair. Paths refracting through a *different* glass
   keep detached (zero) geometry gradients exactly as before — gradients
   w.r.t. each glass's own coefficients are obtained by targeting that
   glass (``reparam_glass=<its material index>``). All three reference
   scenes optimize one glass at a time in BASELINE config 5.
"""

from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp

from ..ops.sellmeier import sellmeier_index

# Reparameterization window constants — read from the env ONCE at import
# (they alter gradient NUMERICS, not scheduling: trace-time reads would
# let a mid-process env change silently split the fused and XLA
# estimators across cached jits). Override in a fresh process only.
_DM_FLOOR = float(_os.environ.get("REPARAM_DM_FLOOR", "1e-7"))
# denominator floor, 1/nm (bulk flint |dm/dlambda| ~1e-2)
_DM_LO = float(_os.environ.get("REPARAM_DM_LO", "1e-6"))
_DM_HI = float(_os.environ.get("REPARAM_DM_HI", "1e-5"))
# taper window: shift -> 0 near m extrema
_EDGE_NM = float(_os.environ.get("REPARAM_EDGE_NM", "8.0"))

sg = jax.lax.stop_gradient


def _n_and_dndlam(b: jnp.ndarray, c: jnp.ndarray, lam: jnp.ndarray):
    """(n, dn/dlambda) at wavelength(s) lam [nm], via a jvp through the
    batched Sellmeier evaluation (ops/sellmeier.py)."""
    return jax.jvp(
        lambda l: sellmeier_index(b, c, l), (lam,), (jnp.ones_like(lam),)
    )


def _m_raw(b: jnp.ndarray, c: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """UNCLAMPED n^2(lambda) = 1 + sum b l^2/(l^2 - c) — the smooth quantity
    upstream of sellmeier_index's sqrt(max(., eps)) clamp. The reparam
    freezes THIS: n = sqrt(max(m, eps)) is a fixed function of m, so a
    frozen m freezes n exactly everywhere, including across the clamp
    edges the buggy C:=B glass puts inside the visible band (a frozen
    post-clamp n cannot be made continuous across the MOVING clamp kink,
    which costs a first-order measure error — measured in round 2)."""
    lam_um = lam * 1e-3
    l2 = (lam_um * lam_um)[..., None]
    d = l2 - c
    # a hero landing EXACTLY on an in-band pole (l2 == c in f32 — the
    # buggy C:=B glass has one at 457.245 nm) makes m = inf and the map's
    # m_tgt - m_cur = inf - inf = NaN; sign-preserving epsilon keeps the
    # pole sample huge-but-finite (its path still behaves as TIR)
    d = jnp.where(jnp.abs(d) < 1e-9, jnp.where(d >= 0, 1e-9, -1e-9), d)
    return 1.0 + jnp.sum(b * l2 / d, axis=-1)


def _m_and_dmdlam(b: jnp.ndarray, c: jnp.ndarray, lam: jnp.ndarray):
    return jax.jvp(
        lambda l: _m_raw(b, c, l), (lam,), (jnp.ones_like(lam),)
    )


def reparam_hero(
    hero0: jnp.ndarray,
    b: jnp.ndarray,
    c: jnp.ndarray,
    frozen: tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Reparameterize sampled hero wavelengths against one glass.

    hero0: [...] sampled hero wavelengths in nm (treated as constants —
    they come from the RNG); b, c: [3] Sellmeier coefficients of the
    target glass (the differentiable leaves).

    ``frozen``: the (b0, c0) pair defining the target index n*. Default
    ``None`` means ``(sg(b), sg(c))`` — the usual AD configuration, where
    the target tracks the current value but is detached from the tape.
    Finite-difference checks MUST pass the unperturbed coefficients here
    explicitly: AD at b0 differentiates the function "render with
    n(lambda(b); b) = n*(b0)", and only with an explicit frozen target is
    the perturbed evaluation that same function (with frozen=None the
    primal shift is identically zero for every b and FD measures the
    original piecewise-constant estimator).

    Returns (hero, weight): hero equals hero0 at the primal point but
    carries d hero/d(b,c) = -(dn/d(b,c)) / (dn/dlambda); weight is the
    Jacobian of the change of variables (primal 1) that multiplies the
    sample's full spectral contribution.
    """
    hero0 = sg(hero0)
    b0, c0 = (sg(b), sg(c)) if frozen is None else frozen

    # The map T(lambda0) = lambda0 + shift(lambda0) must be CONTINUOUS in
    # lambda0 and its weight must be the EXACT d T/d lambda0: then
    # E[f(T) w] = int f(T) T' = int f telescopes exactly on the wavelength
    # circle (fundamental theorem; folds carry signed measure that cancels),
    # up to the band-seam jump where the comb's CIE factors are ~1e-4 of
    # peak. Round-2 postmortem: a hard |dn/dlambda| guard made dT/db jump
    # at the guard boundary and an O(db)-approximate Jacobian broke measure
    # preservation at FIRST order near the buggy glass's in-band clamp edges
    # (C:=B ctor bug, materials/material.cu:63-69) — the paired expectation
    # check caught a d/db bias of the same size as the gradient itself.
    # Hence: freeze the UNCLAMPED m = n^2 (see _m_raw) with a
    # sign-preserving denominator floor + taper window + soft cap (all
    # continuous), and the weight via jax.jvp of the full map.
    # Window constants (module-level _DM_FLOOR etc., read from the env
    # ONCE at import so every jit trace in a process sees the same
    # values — they alter gradient numerics, and a mid-process env
    # change would otherwise leave stale constants in cached jits;
    # scratch/r4_dispbias.py measures the estimator's mean-gradient
    # zero crossing against them in fresh processes):
    DM_FLOOR = _DM_FLOOR
    DM_LO = _DM_LO
    DM_HI = _DM_HI
    SMAX = 120.0  # soft cap on |shift| in nm (tanh), ~ quarter band
    EDGE_NM = _EDGE_NM
    # endpoint-fixing window width (see ``edge`` below)

    from ..utils.constants import LAMBDA_MAX, LAMBDA_MIN

    def T(l0):
        m_tgt = _m_raw(b0, c0, l0)
        m_cur, dm_cur = _m_and_dmdlam(b, c, l0)
        dm_eff = jnp.where(
            jnp.abs(dm_cur) > DM_FLOOR,
            dm_cur,
            jnp.where(dm_cur >= 0.0, DM_FLOOR, -DM_FLOOR),
        )
        taper = jnp.clip((jnp.abs(dm_cur) - DM_LO) / (DM_HI - DM_LO), 0.0, 1.0)
        # Edge window: the shift must VANISH at both band ends so the map
        # fixes the endpoints. A non-endpoint-fixing map has substitution
        # error f_comb(seam) * (s(lmax) - s(lmin)) — FIRST order in
        # (b - b0) — and f_comb does NOT vanish at the seam: a hero at
        # 360/830 nm has its 7 companions mid-band with O(1) CIE weights
        # (round-2 isolation measured this term at 2.5x the true
        # gradient). The price: heroes within EDGE_NM of the ends keep
        # damped freezing, so their dispersion-flip derivative share
        # (~2*EDGE_NM/span of hero measure) falls back to the
        # un-reparameterized (zero a.e.) estimator — a documented,
        # window-width-sized approximation.
        edge = jnp.clip(
            jnp.minimum(l0 - LAMBDA_MIN, LAMBDA_MAX - l0) / EDGE_NM, 0.0, 1.0
        )
        # hard-clip BEFORE the tanh: with dm_eff at the floor, raw can hit
        # ~1e7 nm; tanh saturates (fine forward) but its jvp is then
        # sech^2(huge) * d(raw)/dlambda = 0 * inf = NaN. The clip zeroes
        # the derivative in the saturated region instead.
        raw = jnp.clip((m_tgt - m_cur) / dm_eff, -8.0 * SMAX, 8.0 * SMAX)
        return l0 + SMAX * jnp.tanh(raw * taper * edge / SMAX)

    hero, weight = jax.jvp(T, (hero0,), (jnp.ones_like(hero0),))
    return hero, weight


def reparam_wavelengths(
    lam: jnp.ndarray,
    materials,
    glass_index: int,
    frozen: tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the hero reparameterization to a full wavelength comb.

    lam: [N, W] hero-wavelength combs (hero at index 0, companions at
    rigid offsets with wrap — spectrum/spectrum.cu:31-48); materials: the
    scene Materials pytree; glass_index: material row of the target glass;
    frozen: explicit (b0, c0) target pair for FD checks (see reparam_hero).

    Returns (lam', weight[N]). The whole comb shifts rigidly with the
    hero (the wrap indicator is evaluated on detached values: the wrap
    boundary term is the documented ~CIE-endpoint-sized bias).
    """
    from ..utils.constants import LAMBDA_MAX, LAMBDA_MIN

    b = materials.sellmeier_b[glass_index]
    c = materials.sellmeier_c[glass_index]
    hero0 = lam[:, 0]
    hero, weight = reparam_hero(hero0, b, c, frozen)
    # the ACTUAL numeric shift (nonzero when evaluated at displaced b with
    # an explicit frozen target, e.g. in FD checks; identically 0 at the
    # primal). NOT hero - sg(hero): that is numerically zero at EVERY b
    # and silently turns finite-difference evaluations of the
    # reparameterized estimator into a different (weight-only) function.
    shift = hero - sg(hero0)
    span = LAMBDA_MAX - LAMBDA_MIN
    shifted = lam + shift[:, None]
    # re-wrap on detached values only (the primal lam is already wrapped;
    # the tangent shift is identical on both wrap branches)
    lam_new = jnp.where(sg(shifted) > LAMBDA_MAX, shifted - span, shifted)
    lam_new = jnp.where(sg(shifted) < LAMBDA_MIN, lam_new + span, lam_new)
    return lam_new, weight
