"""Golden A/B: fused gradients through the SORTED scheduler vs the
megakernel residual path, shared injected uniforms, CPU interpret.

Run: PYTHONPATH= JAX_PLATFORMS=cpu /opt/venv/bin/python scratch/r5_sortres_check.py
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp


def run(sched):
    os.environ["BVH_SCHED"] = sched
    os.environ.pop("MXU_FORM", None)
    from spectral_tpu.models.scenes import CORNELL, build_tri_field, scene_camera
    from spectral_tpu.diff.fast import render_chunk_diff_fused

    scene = build_tri_field(520, seed=3)
    cam = scene_camera(CORNELL, 64, 32)
    mats = scene.materials
    wts = jax.random.normal(jax.random.PRNGKey(1), (32, 64, 3))

    def loss(m):
        img = render_chunk_diff_fused(
            m, scene, cam, 5, 0, 0, 64, 32, 2, 3, True, 5
        )
        return jnp.sum(img * wts)

    val, grads = jax.value_and_grad(loss, allow_int=True)(mats)
    return val, grads


def run_glass(sched):
    os.environ["BVH_SCHED"] = sched
    os.environ.pop("MXU_FORM", None)
    from spectral_tpu.models.scenes import (
        CORNELL, FIELD_GLASS_MAT, build_tri_field, scene_camera,
    )
    from spectral_tpu.diff.fast import render_chunk_diff_fused

    scene = build_tri_field(520, seed=3, glass=True)
    cam = scene_camera(CORNELL, 64, 32)
    mats = scene.materials
    wts = jax.random.normal(jax.random.PRNGKey(2), (32, 64, 3))

    def loss(m):
        img = render_chunk_diff_fused(
            m, scene, cam, 5, 0, 0, 64, 32, 2, 3, True, 5,
            reparam_glass=FIELD_GLASS_MAT,
        )
        return jnp.sum(img * wts)

    return jax.value_and_grad(loss, allow_int=True)(mats)


va, ga = run("mega")
vb, gb = run("sorted")
print("loss mega", float(va), "sorted", float(vb), "absdiff", abs(float(va - vb)))
for name in ("coeffs", "emission_power"):
    a = np.asarray(getattr(ga, name))
    b = np.asarray(getattr(gb, name))
    d = np.abs(a - b).max()
    scale = np.abs(a).max()
    print(f"grad {name}: maxabs diff {d:.3e} (scale {scale:.3e})")
    assert d <= 2e-3 * max(scale, 1.0), (name, d, scale)

va, ga = run_glass("mega")
vb, gb = run_glass("sorted")
print("glass loss mega", float(va), "sorted", float(vb))
for name in ("coeffs", "emission_power", "sellmeier_b", "sellmeier_c"):
    a = np.asarray(getattr(ga, name))
    b = np.asarray(getattr(gb, name))
    d = np.abs(a - b).max()
    scale = np.abs(a).max()
    print(f"glass grad {name}: maxabs diff {d:.3e} (scale {scale:.3e})")
    assert d <= 2e-3 * max(scale, 1.0), (name, d, scale)
assert np.abs(np.asarray(ga.sellmeier_b)).max() > 0, "vacuous sellmeier grad"
print("OK")
