"""A/B the 64-leaf super-group gate (MXU_GROUP_L2) on a MULTI-CHUNK leaf
table (3 streamed 256-leaf chunks) — the golden field covers only one
chunk, and the super-row index math (ng_rows16 offset, per-chunk sgi)
is exactly what a plumbing slip would corrupt.

PYTHONPATH= JAX_PLATFORMS=cpu python scratch/r5_l2_multichunk.py
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax


def render(l2):
    os.environ["MXU_GROUP_L2"] = l2
    os.environ["MXU_LEAF"] = "128"
    os.environ["MXU_RESIDENCY"] = "hbm"
    os.environ["BVH_SCHED"] = "mega"
    from spectral_tpu.models.scenes import CORNELL, build_tri_field, scene_camera
    from spectral_tpu.ops.pallas import render_kernel as rk

    rk._render_chunk_pallas_jit.clear_cache()
    scene = build_tri_field(34000, seed=1)
    cam = scene_camera(CORNELL, 16, 16)
    out = np.asarray(
        rk.render_chunk_pallas(
            scene, cam, 7, 0, 0, 16, 16, 1, 2,
            interpret=True, rand_key=jax.random.PRNGKey(4),
        )
    )
    rk._render_chunk_pallas_jit.clear_cache()
    return out


a = render("0")
b = render("1")
print("mean", a.mean(), "maxabs diff", np.abs(a - b).max())
assert a.mean() > 0.001
np.testing.assert_array_equal(a, b)
print("OK multi-chunk L2 bit-exact")
