"""Golden A/B harness for the round-4 sweep/scatter extraction.

Renders a 520-tri field (multi-leaf MXU BVH, quad + quad3 + hbm) and
dense Cornell in interpret mode with injected uniforms and saves the
images. Run at a known-good commit with MODE=save, re-run after a
refactor with MODE=check: any bit difference fails loudly.

Usage: PYTHONPATH= JAX_PLATFORMS=cpu MODE=save python scratch/r4_golden.py
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

MODE = os.environ.get("MODE", "check")
OUT = "/root/repo/scratch/r4_golden_{}.npy"


def render(tag, form=None, residency=None, scene_kind="field"):
    for k in ("MXU_FORM", "MXU_RESIDENCY"):
        os.environ.pop(k, None)
    # goldens pin the SWEEP semantics under the megakernel scheduler
    # (the saved images predate the round-4 sorted default; scheduler
    # equivalence is pinned separately by tests/test_wavefront_sorted)
    os.environ["BVH_SCHED"] = "mega"
    if form:
        os.environ["MXU_FORM"] = form
    if residency:
        os.environ["MXU_RESIDENCY"] = residency
    from spectral_tpu.models.scenes import (
        CORNELL, build_scene, build_tri_field, scene_camera,
    )
    from spectral_tpu.ops.pallas import render_kernel as rk

    rk._render_chunk_pallas_jit.clear_cache()
    if scene_kind == "field":
        scene = build_tri_field(520, seed=3)
    else:
        scene = build_scene(CORNELL)
    cam = scene_camera(CORNELL, 64, 32)
    img = np.asarray(
        rk.render_chunk_pallas(
            scene, cam, 7, 0, 0, 64, 32, 2, 3,
            interpret=True, rand_key=jax.random.PRNGKey(11),
        )
    )
    path = OUT.format(tag)
    if MODE == "save":
        np.save(path, img)
        print(f"saved {tag}: mean {img.mean():.6f}")
    else:
        ref = np.load(path)
        d = np.abs(img - ref).max()
        status = "OK" if d == 0.0 else "MISMATCH"
        print(f"{tag}: maxabs {d} {status}")
        if d != 0.0:
            sys.exit(1)


render("field_quad", form="quad")
render("field_quad3", form="quad3")
render("field_quad_hbm", form="quad", residency="hbm")
render("field_quad3_hbm", form="quad3", residency="hbm")
render("field_affine", form="affine")
render("cornell_dense", scene_kind="dense")
print("all", MODE, "done")
