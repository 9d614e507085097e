"""Differentiable scene geometry: jnp twin of models.geometry.finalize.

``models.geometry.finalize`` derives the per-triangle intersection arrays
(normal, plane offset, sign-folded affine edge functionals, AABBs) on the
host in float64 numpy — perfect for scene *construction* (reference
tri::init, primitives/tri.cu:47-84) but opaque to autodiff. This module is
the same derivation as traced jnp ops, so

    d(pixel) / d(vertex position)

flows through plane equations and edge functionals into the vertices —
the third gradient family of the BASELINE north star (material spectra,
Sellmeier coefficients, vertex positions).

Discrete quantities (axis-aligned projection tag, winding sign) are
piecewise-constant in the vertices; they are detached, matching the
"detached selection / smooth selected value" gradient policy of
ops/intersect.py.

Scope note: through the full radiance estimator, vertex gradients are zero
almost everywhere because the spectral path weights depend on geometry only
through WHICH material each bounce hits (a step function). Smooth geometric
functionals (depth, hit points, normals) carry exact vertex gradients —
see tests/test_diff.py::TestVertexGradients. Visibility-aware RADIANCE
gradients are implemented by the warped-area estimator in
diff/vertex_warp.py (unbiased within its documented specular-chain /
border-crossing gaps); the metal-fuzz analogue is diff/fuzz_warp.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def derive_tri_arrays(v0: jnp.ndarray, v1: jnp.ndarray, v2: jnp.ndarray) -> dict:
    """Differentiable tri::init: [T, 3] vertices -> intersection SoA dict.

    Matches models.geometry.finalize bit-for-bit in float32 (same projection
    tags, winding signs, edge-functional layout, AABB padding).
    """
    f32 = jnp.float32
    v0, v1, v2 = v0.astype(f32), v1.astype(f32), v2.astype(f32)

    n = jnp.cross(v1 - v0, v2 - v0)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    normal = n / jnp.maximum(norm, 1e-30)
    d = jnp.sum(normal * v0, axis=-1)

    # Axis-aligned plane tags (tri.cu:58-79): discrete, detached.
    perp = jax.lax.stop_gradient(jnp.abs(normal)) < 1e-8
    yz = perp[:, 1] & perp[:, 2]
    xz = perp[:, 0] & perp[:, 2]
    xy = perp[:, 0] & perp[:, 1]
    # default/XY: (w, h) = (0, 1); XZ: (0, 2); YZ: (1, 2)
    w_axis = jnp.where(yz, 1, 0)
    h_axis = jnp.where(xz | yz, 2, 1)
    h_axis = jnp.where(xy, 1, h_axis)

    w_hot = jax.nn.one_hot(w_axis, 3, dtype=f32)  # [T, 3]
    h_hot = jax.nn.one_hot(h_axis, 3, dtype=f32)

    def pw(p):
        return jnp.sum(p * w_hot, axis=-1)

    def ph(p):
        return jnp.sum(p * h_hot, axis=-1)

    def dsa(a, b, c):
        """double_signed_area_2D (tri.cu:153-182) on the projected plane."""
        return (pw(a) - pw(c)) * (ph(b) - ph(c)) - (pw(b) - pw(c)) * (ph(a) - ph(c))

    clockwise = jax.lax.stop_gradient(dsa(v0, v1, v2)) >= 0
    sign = jnp.where(clockwise, 1.0, -1.0).astype(f32)  # [T]

    gs, cs = [], []
    for a, b in ((v0, v1), (v1, v2), (v2, v0)):
        gw = ph(a) - ph(b)
        gh = -(pw(a) - pw(b))
        g = sign[:, None] * (w_hot * gw[:, None] + h_hot * gh[:, None])  # [T, 3]
        c = sign * (ph(b) * (pw(a) - pw(b)) - pw(b) * (ph(a) - ph(b)))
        gs.append(g)
        cs.append(c)
    edge_g = jnp.stack(gs, axis=1)  # [T, 3, 3]
    edge_c = jnp.stack(cs, axis=1)  # [T, 3]

    v = jnp.stack([v0, v1, v2], axis=1)  # [T, 3, 3]
    bb_min = v.min(axis=1)
    bb_max = v.max(axis=1)
    pad = (bb_max - bb_min) < 1e-4  # aabb::pad (aabb.cuh:92-102)
    bb_min = jnp.where(pad, bb_min - 5e-5, bb_min)
    bb_max = jnp.where(pad, bb_max + 5e-5, bb_max)

    return {
        "v0": v0,
        "v1": v1,
        "v2": v2,
        "normal": normal,
        "d": d,
        "edge_g": edge_g,
        "edge_c": edge_c,
        "bbox_min": bb_min,
        "bbox_max": bb_max,
    }


def scene_with_vertices(scene, v0: jnp.ndarray, v1: jnp.ndarray, v2: jnp.ndarray):
    """Rebuild a Scene's intersection arrays from (possibly perturbed)
    vertices, differentiably. Material table and background are shared."""
    arrs = derive_tri_arrays(v0, v1, v2)
    return dataclasses.replace(scene, **arrs)
