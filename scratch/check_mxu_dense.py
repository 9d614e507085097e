"""MXU-dense (single-leaf, via DENSE_IMPL=mxu dispatch) vs scalar-dense:
bit-identity in interpret mode on all three shipped scenes."""
import os, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from spectral_tpu.models.scenes import build_scene, scene_camera
from spectral_tpu.ops.pallas import render_kernel as rk

for sel, name in [(0, "cornell"), (1, "prism"), (2, "tris")]:
    scene = build_scene(sel)
    cam = scene_camera(sel, 64, 24)
    key = jax.random.PRNGKey(7)
    os.environ["DENSE_IMPL"] = "scalar"
    a = np.asarray(rk.render_chunk_pallas(scene, cam, 3, 0, 0, 64, 24, 2, 3,
                   ray_tile=768, interpret=True, rand_key=key))
    rk._render_chunk_pallas_jit.clear_cache()
    os.environ["DENSE_IMPL"] = "mxu"
    b = np.asarray(rk.render_chunk_pallas(scene, cam, 3, 0, 0, 64, 24, 2, 3,
                   ray_tile=768, interpret=True, rand_key=key))
    rk._render_chunk_pallas_jit.clear_cache()
    d = float(np.max(np.abs(a - b)))
    print(name, "max|diff| =", d, "mean a =", float(a.mean()), flush=True)
    assert a.mean() > 0
    assert d == 0.0, (name, d)
print("OK: MXU-dense == scalar-dense bit-identical (interpret)")
