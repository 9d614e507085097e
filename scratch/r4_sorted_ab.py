"""A/B: sorted per-bounce scheduler vs megakernel, interpret mode,
injected uniforms — expect bit-identical images per MXU form/residency."""
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax


def render(form, residency, sched):
    for k in ("MXU_FORM", "MXU_RESIDENCY", "BVH_SCHED"):
        os.environ.pop(k, None)
    os.environ["MXU_FORM"] = form
    if residency:
        os.environ["MXU_RESIDENCY"] = residency
    if sched:
        os.environ["BVH_SCHED"] = sched
    from spectral_tpu.models.scenes import CORNELL, build_tri_field, scene_camera
    from spectral_tpu.ops.pallas import render_kernel as rk

    rk._render_chunk_pallas_jit.clear_cache()
    scene = build_tri_field(520, seed=3)
    cam = scene_camera(CORNELL, 64, 32)
    return np.asarray(
        rk.render_chunk_pallas(
            scene, cam, 7, 0, 0, 64, 32, 2, 3,
            interpret=True, rand_key=jax.random.PRNGKey(11),
        )
    )


fails = 0
for form in ["quad", "quad3", "quad2", "affine"]:
    for residency in [None, "hbm"]:
        a = render(form, residency, None)
        b = render(form, residency, "sorted")
        d = np.abs(a - b).max()
        tag = f"{form}/{residency or 'vmem'}"
        print(f"{tag}: maxabs {d} {'OK' if d == 0.0 else 'MISMATCH'}",
              flush=True)
        fails += d != 0.0
sys.exit(1 if fails else 0)
