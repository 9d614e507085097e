"""Exact vertex-position pixel gradients: warped-area reparameterization.

Through the plain estimator, d(pixel)/d(vertex) is zero almost everywhere:
the spectral path weight is a product of material SPDs, and geometry only
selects WHICH materials a path multiplies (reference hit selection
primitives/tri.cu:12-45, scatter branches materials/material.cu:56-100) —
a step function of the vertices. The whole gradient is the boundary term
at visibility silhouettes. This module implements the warped-area
estimator (the divergence-theorem form of the boundary integral): each
sampled integration variable is composed with a warp field built from the
scene's triangle edges such that the integrand's discontinuity locations
become parameter-independent; ordinary autodiff of the warped estimator
(warp + area-element determinant + sampling-density ratio) then yields
the exact gradient, boundary term included.

Construction rules, each validated the hard way in
scratch/proto_vertex_warp.py / proto_sphere_warp.py (errors measured
against analytic boundary integrals / same-sample FD):

1. The closest-point parameter s*(u) on each edge and the weights w_e(u)
   are computed from PARAMETER-FROZEN geometry but stay u-DIFFERENTIABLE:
   the divergence of the warp needs both dw/du and the along-edge
   velocity variation ds*/du (full detach measured a 0.69x deficit).
2. The velocity field is the functional difference
   e(theta, s*(u)) - e(frozen theta, s*(u)): identically zero VALUE for
   every u (the primal warp displaces nothing; pixel values deviate only
   at f32-rounding level because the sphere warp normalizes the sampled
   lambertian direction), nonzero theta-gradient.
3. Weights carry a static floor 1/(r0^2+eps^2) (a "velocity-zero
   background edge"): the warp must decay away from edges or the
   integration-domain boundary picks up spurious flux (measured 1.34x
   overshoot without it).
4. Sampled domains are made parameter-independent before warping: the
   cosine-hemisphere map uses the DETACHED shading normal; the smooth
   density tilt term re-enters through the explicit ratio
   rho(w'; theta)/rho(w; frozen) (validated to 0.1 percent vs FD on an
   occluder scene).

Scope (documented support matrix, README): camera-pixel and lambertian
bounce domains. Discontinuities visible only through specular chains
(mirror/glass images of silhouettes) are not tracked — their boundary
terms are missed, everything else is exact in expectation. Defocus
cameras fall back to the pinhole projection for edge velocities.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

sg = jax.lax.stop_gradient


def _safe_normalize(v: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """normalize with finite HIGHER-ORDER derivatives at v == 0.

    ``v / maximum(norm(v), tiny)`` leaks NaN tangents: norm's jvp at 0 is
    0/0 and maximum's jvp multiplies rather than selects, so 0 * NaN
    poisons the whole warp sum when a bounce origin lies exactly on a
    scene edge (the Cornell box has corners at the origin — measured in
    scratch/nan_probe6.py). rsqrt(|v|^2 + eps^2) is smooth everywhere,
    but eps must be LARGE enough that the 2nd derivative coefficient
    n2^{-5/2} stays finite in f32 through grad-of-jvp (the warp
    determinant): eps=1e-9 gives (1e-18)^{-5/2} = 7.5e44 -> inf -> NaN
    (measured in scratch/nan_cotangent.py). eps=1e-4 keeps every order we
    use finite, and for |v| ~ 1 the value is bit-identical in f32
    (1 + 1e-8 rounds to 1)."""
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jax.lax.rsqrt(n2 + eps * eps)


class EdgeSet(NamedTuple):
    """All 3T triangle edges, live (theta-differentiable) + frozen."""

    a: jnp.ndarray  # [E, 3] live endpoint
    b: jnp.ndarray  # [E, 3] live endpoint


def edges_from_vertices(v0: jnp.ndarray, v1: jnp.ndarray, v2: jnp.ndarray) -> EdgeSet:
    """EdgeSet from per-triangle vertex arrays [T, 3] (live w.r.t. theta).

    Every triangle contributes its 3 edges; shared/duplicate edges are
    kept — duplicated edges carry identical velocities so the weighted
    average is unchanged, and interior (non-silhouette) edges contribute
    no boundary term because the integrand jump there is zero.
    """
    a = jnp.concatenate([v0, v1, v2], axis=0)
    b = jnp.concatenate([v1, v2, v0], axis=0)
    return EdgeSet(a=a, b=b)


# ---------------------------------------------------------------------------
# camera (screen-space) warp
# ---------------------------------------------------------------------------


def screen_project(cam, p: jnp.ndarray):
    """World points [E, 3] -> continuous pixel coords (fx, fy) [E] each,
    plus a validity mask (point in front of the camera).

    Inverts pixel = pixel00 + fx du + fy dv (models/camera.py
    generate_rays; reference rendering.cu:66-87): solve the 3x3 system
    [du | dv | -(p - c)] (fx, fy, s)^T = c - pixel00 by Cramer's rule.
    s = 1/t > 0 selects points in front.
    """
    du = cam.pixel_delta_u
    dv = cam.pixel_delta_v
    c = cam.center
    rhs = c - cam.pixel00_loc  # [3]
    w = -(p - c)  # [E, 3]

    def det3(x, y, z):
        return jnp.sum(x * jnp.cross(y, z), axis=-1)

    duE = jnp.broadcast_to(du, w.shape)
    dvE = jnp.broadcast_to(dv, w.shape)
    rhsE = jnp.broadcast_to(rhs, w.shape)
    D = det3(duE, dvE, w)
    safe = jnp.where(jnp.abs(D) < 1e-20, 1e-20, D)
    fx = det3(rhsE, dvE, w) / safe
    fy = det3(duE, rhsE, w) / safe
    s = det3(duE, dvE, rhsE) / safe
    valid = (s > 1e-9) & (jnp.abs(D) >= 1e-20)
    return fx, fy, valid


def warp_screen(cam, edges: EdgeSet, eps_px: float = 0.05, r0_px: float = 1.5):
    """Screen warp field V(fx, fy) -> [2] (pixel units) as a per-ray
    callable for use under vmap/jacfwd. Closure over the edge set.

    The IMAGE BORDER is appended as four zero-velocity edges: without
    them the warp's 1/d^2 tail exits the film rectangle and the
    change-of-variables picks up a spurious domain-boundary flux
    (measured 7.4%/15% gradient deficit at r0_px=1.5/4.0 on a
    full-frame silhouette, scratch/bias_map.py + border_flux.py). A
    zero-velocity edge ON the border pins V->0 there (no flux) while
    diluting a true silhouette only within ~eps_px of the border."""
    ax, ay, a_ok = screen_project(cam, edges.a)
    bx, by, b_ok = screen_project(cam, edges.b)
    ok = sg(a_ok & b_ok)  # drop edges crossing/behind the camera plane
    a2 = jnp.stack([ax, ay], -1)  # [E, 2] live
    b2 = jnp.stack([bx, by], -1)
    w_px = float(cam.image_width) - 0.5
    h_px = float(cam.image_height) - 0.5
    corners = jnp.array(
        [[-0.5, -0.5], [w_px, -0.5], [w_px, h_px], [-0.5, h_px]], jnp.float32
    )
    border_a = corners
    border_b = jnp.roll(corners, -1, axis=0)
    a2 = jnp.concatenate([a2, border_a], 0)
    b2 = jnp.concatenate([b2, border_b], 0)
    ok = jnp.concatenate([ok, jnp.ones(4, bool)], 0)
    af, bf = sg(a2), sg(b2)
    abf = bf - af
    ab2 = jnp.maximum(jnp.sum(abf * abf, -1), 1e-12)
    floor = 1.0 / (r0_px * r0_px + eps_px * eps_px)

    def V(u):  # u: [2] continuous pixel coords
        s = jnp.clip(jnp.sum((u - af) * abf, -1) / ab2, 0.0, 1.0)  # [E]
        pe_live = (1.0 - s[:, None]) * a2 + s[:, None] * b2
        pe_frozen = (1.0 - s[:, None]) * af + s[:, None] * bf
        vel = pe_live - pe_frozen  # value 0, theta-velocity
        d2 = jnp.sum((u - pe_frozen) ** 2, -1)
        w = jnp.where(ok, 1.0 / (d2 + eps_px * eps_px), 0.0)
        return jnp.sum(w[:, None] * vel, 0) / (jnp.sum(w) + floor)

    return V


def warp_pixel_samples(cam, edges: EdgeSet, fx, fy, eps_px=0.05, r0_px=1.5):
    """Warp continuous pixel samples: (fx', fy', det) with det the 2x2
    area-element Jacobian of u -> u + V(u). Value-identity at the primal
    (V == 0, det == 1); gradients carry the primary-visibility boundary
    term."""
    Vfn = warp_screen(cam, edges, eps_px, r0_px)

    def one(u):
        m = lambda x: x + Vfn(x)
        J = jax.jacfwd(m)(u)
        return m(u), J[0, 0] * J[1, 1] - J[0, 1] * J[1, 0]

    uv, det = jax.vmap(one)(jnp.stack([fx, fy], -1))
    return uv[:, 0], uv[:, 1], det


# ---------------------------------------------------------------------------
# direction-sphere warp (lambertian bounces)
# ---------------------------------------------------------------------------


def _sphere_V(o, edges: EdgeSet, eps: float, r0: float):
    """Per-ray directional warp field V(w) -> [3] for origin o [3].

    Closest-direction parameter along edge q(s) = (a - o) + s (b - a):
    d/ds [w.q/|q|] = 0 is LINEAR in s: s* = (BD - AE)/(AD - BC) with
    A = w.d, B = w.qa, C = d.d, D = qa.d, E = qa.qa (frozen geometry,
    w-differentiable). Velocity = normalize(q_live) - normalize(q_frozen)
    at s*, which includes the origin's own theta-motion (the silhouette
    seen from a moving hit point)."""
    qa_l = edges.a - o
    d_l = edges.b - edges.a
    qa, dd = sg(qa_l), sg(d_l)
    C = jnp.sum(dd * dd, -1)
    D = jnp.sum(qa * dd, -1)
    E = jnp.sum(qa * qa, -1)
    floor = 1.0 / (r0 * r0 + eps * eps)

    def V(w):  # w: [3] unit direction
        A = jnp.sum(w * dd, -1)
        B = jnp.sum(w * qa, -1)
        den = A * D - B * C
        den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
        s = jnp.clip((B * D - A * E) / den, 0.0, 1.0)[:, None]
        q_l = qa_l + s * d_l
        q_f = qa + s * dd
        e_live = _safe_normalize(q_l)
        e_frozen = _safe_normalize(q_f)
        vel = e_live - e_frozen
        # An edge whose closest point coincides with the bounce origin
        # (|q_f| ~ 0: the origin LIES on that edge, e.g. a hit point on a
        # box seam) has no defined silhouette direction; its normalized
        # velocity is amplified by 1/eps and poisons the field. Select it
        # out entirely (select, not multiply: kills value AND tangents).
        degen = jnp.sum(q_f * q_f, -1) < 1e-6
        vel = jnp.where(degen[:, None], 0.0, vel)
        d2 = jnp.sum((w - e_frozen) ** 2, -1)
        wgt = jnp.where(degen, 0.0, 1.0 / (d2 + eps * eps))
        return jnp.sum(wgt[:, None] * vel, 0) / (jnp.sum(wgt) + floor)

    return V


def tangent_plane_det(m, x):
    """(m(x), det): the 2x2 tangent-plane area element of a sphere map
    ``m`` at unit point ``x`` via two jvps in an orthonormal tangent
    frame. The frame construction (cross with x-hat, y-hat fallback for
    near-parallel x) and the jvp-based det embed the NaN-safety
    invariants documented in this module's header — keep both sphere
    warps (this one and diff/fuzz_warp.py) on this single copy."""
    xf = sg(x)
    t1 = jnp.cross(xf, jnp.array([1.0, 0.0, 0.0]))
    alt = jnp.cross(xf, jnp.array([0.0, 1.0, 0.0]))
    t1 = jnp.where(jnp.linalg.norm(t1) < 1e-6, alt, t1)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-12)
    t2 = jnp.cross(xf, t1)
    _, j1 = jax.jvp(m, (x,), (t1,))
    _, j2 = jax.jvp(m, (x,), (t2,))
    det = jnp.dot(t1, j1) * jnp.dot(t2, j2) - jnp.dot(t1, j2) * jnp.dot(
        t2, j1
    )
    return m(x), det


def warp_directions(
    o: jnp.ndarray,  # [N, 3] live bounce origins (hit points)
    n: jnp.ndarray,  # [N, 3] live shading normals
    w0: jnp.ndarray,  # [N, 3] unit directions sampled about sg(n)
    edges: EdgeSet,
    eps: float = 2e-3,
    r0: float = 0.05,
):
    """(w', factor): warped unit directions and the per-ray contribution
    factor det * rho-ratio (value 1 at the primal).

    w0 MUST be sampled with the DETACHED normal (the integration variable
    is theta-fixed); the density tilt rho = cos/pi re-enters via
    rho(w'; n_live)/rho(w0; frozen). The determinant is the 2x2
    tangent-plane area element of w -> normalize(w + V(w)) via two jvps.
    """

    def one(o_i, n_i, w_i):
        Vfn = _sphere_V(o_i, jax.tree.map(lambda x: x, edges), eps, r0)

        def m(x):
            y = x + Vfn(_safe_normalize(x[None])[0])
            return _safe_normalize(y[None])[0]

        wp, det = tangent_plane_det(m, w_i)
        rho = jnp.maximum(jnp.dot(wp, n_i), 1e-6) / jnp.maximum(
            sg(jnp.dot(w_i, n_i)), 1e-6
        )
        return wp, det * rho

    return jax.vmap(one)(o, n, w0)
