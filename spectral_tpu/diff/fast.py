"""Differentiable fast-path rendering: megakernel forward, XLA backward.

``render_chunk_diff`` is a ``jax.custom_vjp`` whose primal runs the fused
Pallas megakernel (855+ Mray-steps/s) and whose backward differentiates the
XLA wavefront estimator of the same integral. Both are unbiased Monte Carlo
estimators of the rendering equation with the reference's sampling
distributions; they draw different sample streams, so for stochastic
optimization the pairing is the standard "cheap value, exact-gradient-of-
an-estimator" construction (the gradient equals jax.grad of the XLA path,
verified in tests/test_diff.py::TestFastPathGradients).

Differentiable leaf: the material table (sigmoid-spectrum coefficients,
emission power, fuzz, Sellmeier B/C). Gradient-support caveat
(diff/geometry.py): only parameters entering the spectral weights smoothly
(coefficients, emission power) are nonzero a.e.; direction-only parameters
(fuzz, Sellmeier) need reparameterized/edge-sampled estimators (future
work). Scene geometry and camera receive zero cotangents.

A fully fused backward kernel (replaying stored per-bounce material
residuals without re-intersecting) is the planned round-2 replacement.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..models.materials import tabulate
from ..render.wavefront import render_chunk


def _with_materials(scene, materials):
    return dataclasses.replace(scene, materials=tabulate(materials))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def render_chunk_diff(
    materials, scene, cam, key_seed, x0, y0, width, height, spp, bounces
):
    """Accumulated XYZ [height, width, 3]; differentiable w.r.t.
    ``materials`` (scene geometry and camera get zero cotangents)."""
    from ..ops.pallas.render_kernel import render_chunk_pallas

    s = _with_materials(scene, materials)
    return render_chunk_pallas(
        s, cam, int(key_seed), x0, y0, width, height, spp, bounces
    )


def _fwd(materials, scene, cam, key_seed, x0, y0, width, height, spp, bounces):
    out = render_chunk_diff(
        materials, scene, cam, key_seed, x0, y0, width, height, spp, bounces
    )
    return out, (materials, scene, cam)


def _bwd(key_seed, x0, y0, width, height, spp, bounces, res, g):
    materials, scene, cam = res

    def xla_value(mats):
        return render_chunk(
            _with_materials(scene, mats), cam, jax.random.PRNGKey(key_seed),
            x0, y0, width, height, spp, bounces,
        )

    _, vjp = jax.vjp(xla_value, materials)
    (d_mats,) = vjp(g)
    d_scene = jax.tree_util.tree_map(jnp.zeros_like, scene)
    d_cam = jax.tree_util.tree_map(jnp.zeros_like, cam)
    return d_mats, d_scene, d_cam


render_chunk_diff.defvjp(_fwd, _bwd)
