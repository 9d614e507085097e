"""Exact metal-fuzz pixel gradients: warped-area estimator on the
fuzz sampling sphere.

The metallic lobe scatters along m = r + fuzz * s with r the mirror
reflection and s uniform on the unit sphere (reference
materials/material.cu:22-37), absorbing when m.n <= 0. Through the plain
estimator d(pixel)/d(fuzz) is zero a.e.: radiance is a step function of
the scattered direction, and with s held fixed the direction moves
smoothly — every fuzz derivative lives in boundary terms. Two boundary
families exist in s-space:

1. Scene-silhouette preimages. The scattered direction is
   normalize(c r + s) with c = 1/fuzz, so the preimage of a silhouette
   direction e is s_pm(c) = mu_pm(c) e - c r with
   mu_pm = c (e.r) +- sqrt(1 - c^2 (1 - (e.r)^2)), real when e lies
   inside the fuzz cone (sin angle(e, r) < fuzz). Both branches are
   closed-form in c, so the warp velocity is the functional difference
   s_b(c_live) - s_b(c_frozen) at the branch nearest the sample.
2. The absorb horizon. m.n > 0 is s.n > h(c) with h = -c (r.n): a
   latitude circle whose closest point to s is
   q(c) = h n + sqrt(1 - h^2) t_hat, t_hat = normalize(s - (s.n) n).

Each sampled s is composed with the weighted velocity field of both
families (weights 1/(d^2 + eps^2) with a zero-velocity floor, as in
vertex_warp.py); the tangent-plane area element of
s -> normalize(s + V(s)) carries the boundary terms into ordinary
autodiff. The sphere density is uniform so no density ratio appears.

Scope and limits (documented support matrix):
- fuzz-only: the edge set, reflection direction and shading normal are
  DETACHED inside this warp — it captures d/d(fuzz), not cross terms
  with vertex motion (those flow through diff/vertex_warp.py's domains).
- silhouettes at the fuzz-cone rim (grazing, disc -> 0) are masked out
  below DISC_MIN — their true velocity diverges; the lost band is
  O(sqrt(DISC_MIN)) of the cone.
- fuzz below FUZZ_MIN contributes no gradient (the 1/fuzz pole).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .vertex_warp import EdgeSet, _safe_normalize

sg = jax.lax.stop_gradient

FUZZ_MIN = 1e-3
# Measured accuracy on the metal-floor validation scene (scratch/
# validate_fuzz*.log, fuzz_param_sweep.log, fuzz_ablate.log,
# fuzz_identity2.log). Plain-estimator CRN-FD truth wobbles with its own
# eps: -506 +- 31 (eps .02), -582 +- 65 (.01), -564 +- 30 (.04) -> pooled
# ~ -550 +- 25. Shipped-kernel AD: -695 +- 67 (K=2048, branch-blend).
# The change-of-variables identity E[warped@f0](f) = E[plain](f) holds
# within MC error (no map/det implementation error detectable), so the
# remaining ~20% overshoot is finite-kernel bias: sign and scale are
# right, exactness is up to the kernel width. Fuzz velocities scale like
# 1/f^2, so the kernel must be ~10x wider than the vertex warp's to keep
# the det's tails integrable:
#   eps=2e-3/dm=1e-3: heavy tails (p1/p99 at +-25k), finite-K mean drifts
#   eps=2e-2/r0=0.1/dm=1e-2: shipped
#   eps=5e-2: over-smoothed dilution (-380)
DISC_MIN = 1e-2


def _fuzz_V(o, r, n, edges: EdgeSet, c_live, c0, eps: float, r0: float):
    """Per-ray warp field V(s) -> [3] on the fuzz sampling sphere.

    o: [3] frozen bounce origin; r: [3] frozen unit mirror direction;
    n: [3] frozen unit shading normal; c_live: scalar 1/fuzz (live);
    c0: the warp's freeze point (normally sg(c_live)).
    All scene geometry is frozen (fuzz-only warp)."""
    qa = sg(edges.a - o)  # [E, 3]
    dd = sg(edges.b - edges.a)
    C = jnp.sum(dd * dd, -1)
    D = jnp.sum(qa * dd, -1)
    E = jnp.sum(qa * qa, -1)
    floor = 1.0 / (r0 * r0 + eps * eps)

    def V(s):  # s: [3] unit sample
        # frozen scattered direction of this query point
        w = _safe_normalize((c0 * r + s)[None])[0]
        # closest silhouette direction per edge (same stationarity as
        # vertex_warp._sphere_V: linear in the edge parameter)
        A = jnp.sum(w * dd, -1)
        B = jnp.sum(w * qa, -1)
        den = A * D - B * C
        den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
        sig = jnp.clip((B * D - A * E) / den, 0.0, 1.0)[:, None]
        e = _safe_normalize(qa + sig * dd)  # [E, 3] frozen silhouette dirs

        er = jnp.sum(e * r, -1)  # [E]

        def pullback(c):
            disc = 1.0 - c * c * (1.0 - er * er)
            disc_ok = disc > DISC_MIN
            disc_c = jnp.sqrt(jnp.maximum(disc, DISC_MIN))
            mu_p = c * er + disc_c
            mu_m = c * er - disc_c
            sp = mu_p[:, None] * e - c * r
            sm = mu_m[:, None] * e - c * r
            return sp, sm, disc_ok

        sp0, sm0, ok0 = pullback(c0)
        spl, sml, _ = pullback(c_live)
        # BOTH branches enter the weighted field with their own kernels.
        # Hard-selecting the nearer branch makes V DISCONTINUOUS across
        # the mid-surface between the two preimage sheets; div V then
        # carries a surface delta that samples never hit — measured as a
        # stable +43% gradient bias (scratch/validate_fuzz4.log, AD -723
        # vs truth -506). A continuous blend has no such term.
        dp = jnp.sum((s - sp0) ** 2, -1)
        dm = jnp.sum((s - sm0) ** 2, -1)
        w_p = jnp.where(ok0, 1.0 / (dp + eps * eps), 0.0)
        w_m = jnp.where(ok0, 1.0 / (dm + eps * eps), 0.0)
        num = jnp.sum(
            w_p[:, None] * (spl - sp0) + w_m[:, None] * (sml - sm0), 0
        )
        den_w = jnp.sum(w_p) + jnp.sum(w_m)

        # absorb-horizon circle s.n = h(c) = -c (r.n)
        rn = jnp.sum(r * n)
        sn = jnp.sum(s * n)
        t_hat = _safe_normalize((s - sn * n)[None])[0]

        def q_of(c):
            h = jnp.clip(-c * rn, -1.0 + 1e-6, 1.0 - 1e-6)
            return h * n + jnp.sqrt(jnp.maximum(1.0 - h * h, 1e-12)) * t_hat

        q0 = q_of(c0)
        h0 = -c0 * rn
        abs_ok = jnp.abs(h0) < 1.0 - 1e-4  # horizon intersects the sphere
        d2a = jnp.sum((s - q0) ** 2)
        w_a = jnp.where(abs_ok, 1.0 / (d2a + eps * eps), 0.0)
        vel_a = q_of(c_live) - q0
        num = num + w_a * vel_a
        den_w = den_w + w_a
        return num / (den_w + floor)

    return V


def warp_fuzz(
    s0: jnp.ndarray,  # [N, 3] unit sphere samples (frozen integration var)
    o: jnp.ndarray,  # [N, 3] bounce origins (detached inside)
    r: jnp.ndarray,  # [N, 3] unit mirror directions (detached inside)
    n: jnp.ndarray,  # [N, 3] unit shading normals (detached inside)
    fuzz: jnp.ndarray,  # [N] LIVE fuzz values
    edges: EdgeSet,
    eps: float = 2e-2,
    r0: float = 0.1,
    frozen_fuzz: jnp.ndarray | None = None,
):
    """(s', det): warped sphere samples and the tangent-plane area
    element (value (s0, 1) at the primal). The caller forms
    m = r_live + fuzz_live * s' and multiplies det into the path weight;
    ordinary autodiff then carries the fuzz boundary terms.

    ``frozen_fuzz``: pins the warp's freeze point to a specific fuzz
    (default: detached live value). Used by the change-of-variables
    identity test — E[warped@f0](f) must equal E[plain](f) for f != f0."""
    c_live = 1.0 / jnp.maximum(fuzz, FUZZ_MIN)
    if frozen_fuzz is None:
        c0s = jax.lax.stop_gradient(c_live)
    else:
        c0s = jnp.broadcast_to(
            1.0 / jnp.maximum(frozen_fuzz, FUZZ_MIN), c_live.shape
        )

    def one(s_i, o_i, r_i, n_i, c_i, c0_i):
        Vfn = _fuzz_V(sg(o_i), sg(r_i), sg(n_i), edges, c_i, c0_i, eps, r0)

        def m(x):
            y = x + Vfn(_safe_normalize(x[None])[0])
            return _safe_normalize(y[None])[0]

        from .vertex_warp import tangent_plane_det

        return tangent_plane_det(m, s_i)

    return jax.vmap(one)(s0, o, r, n, c_live, c0s)
