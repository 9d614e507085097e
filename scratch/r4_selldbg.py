"""Debug the fused Sellmeier backward: isolate A-term vs B-term."""
import dataclasses
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from tests.test_diff import TestSellmeierGradients
from spectral_tpu.models.scenes import PRISM, scene_camera
from spectral_tpu.diff.fast import _sellmeier_grads_from_replay
from spectral_tpu.diff.spectral_reparam import reparam_hero
from spectral_tpu.ops.pallas.grad_kernel import render_grads_pallas
from spectral_tpu.ops.pallas.render_kernel import (
    camera_vector, n_uniforms, pack_scene,
    render_rays_pallas, render_rays_pallas_residuals,
)
from spectral_tpu.utils.constants import LAMBDA_MAX, LAMBDA_MIN

scene, glass = TestSellmeierGradients._slab_scene()
bounces = 4
cam = scene_camera(PRISM, 32, 32)
cv = camera_vector(cam)
px = jnp.tile(jnp.arange(32, dtype=jnp.float32), 32)
py = jnp.repeat(jnp.arange(32, dtype=jnp.float32), 32)
rand = jax.random.uniform(
    jax.random.PRNGKey(3), (1, n_uniforms(bounces), 1024), jnp.float32
)
b0 = scene.materials.sellmeier_b[glass]
c0 = scene.materials.sellmeier_c[glass]


def with_b(bg):
    return dataclasses.replace(
        scene,
        materials=dataclasses.replace(
            scene.materials,
            sellmeier_b=scene.materials.sellmeier_b.at[glass].set(bg),
        ),
    )


tri, mat, tab = pack_scene(scene)
xyz, hero, nvalid, powres, matres = render_rays_pallas_residuals(
    cv, jnp.int32(5), tri, mat, tab, px, py, 1, bounces, 1024, True, rand
)
g = jnp.ones((1024, 3), jnp.float32)
grads = render_grads_pallas(
    mat, tab, g, hero, nvalid, powres, matres,
    1, bounces, 1024, True, want_bg_grads=True, want_sellmeier=True,
)
A, B = grads[3], grads[4]
print("sum A", float(A.sum()), "vs g.xyz", float(xyz.sum()))

hero0 = hero[0]
span = LAMBDA_MAX - LAMBDA_MIN
zero = jnp.zeros_like(A)

# A-term AD vs analytic FD of weight-only function
dbA = _sellmeier_grads_from_replay(scene.materials, glass, hero, A, zero)[0]
dbB = _sellmeier_grads_from_replay(scene.materials, glass, hero, zero, B)[0]
print("AD A-term", np.asarray(dbA))
print("AD B-term", np.asarray(dbB))

eps = 1e-3
e0 = jnp.zeros(3).at[0].set(eps)
out0 = render_rays_pallas(
    cv, jnp.int32(5), tri, mat, tab, px, py, 1, bounces, 1024, True, rand
)


def wgt_shift(bg):
    hr, wgt = reparam_hero(hero0, bg, c0, frozen=(b0, c0))
    return hr, wgt


# FD of weight-only: sum(out0 * wgt(b))
vs = []
for s in (+1, -1):
    _, w = wgt_shift(b0 + s * e0)
    vs.append(float(jnp.sum(out0 * w[:, None])))
print("FD A-term", (vs[0] - vs[1]) / (2 * eps))

# FD of shift+scene (weight 1): sum(out(scene(b), rand shifted))
vs = []
for s in (+1, -1):
    hr, _ = wgt_shift(b0 + s * e0)
    rand2 = rand.at[0, 2].set((hr - LAMBDA_MIN) / span)
    t2, m2, tb2 = pack_scene(with_b(b0 + s * e0))
    out = render_rays_pallas(
        cv, jnp.int32(5), t2, m2, tb2, px, py, 1, bounces, 1024, True, rand2
    )
    vs.append(float(jnp.sum(out)))
print("FD B-term(combined)", (vs[0] - vs[1]) / (2 * eps))

# how big are the shifts?
hr, w = wgt_shift(b0 + e0)
print("shift stats nm:", float(jnp.abs(hr - hero0).max()), float(jnp.abs(hr - hero0).mean()))
print("weight stats:", float(w.min()), float(w.max()))

for eps2 in (3e-4, 1e-4, 3e-5, 1e-5):
    e = jnp.zeros(3).at[0].set(eps2)
    vs = []
    for s in (+1, -1):
        hr, w = wgt_shift(b0 + s * e)
        rand2 = rand.at[0, 2].set((hr - LAMBDA_MIN) / span)
        t2, m2, tb2 = pack_scene(with_b(b0 + s * e))
        out = render_rays_pallas(
            cv, jnp.int32(5), t2, m2, tb2, px, py, 1, bounces, 1024, True, rand2
        )
        vs.append(float(jnp.sum(out * w[:, None])))
    print(f"eps {eps2:g}: FD total {(vs[0]-vs[1])/(2*eps2):.2f} vs AD total {float(dbA[0]+dbB[0]):.2f}")
