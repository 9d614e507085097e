"""Chip-vs-interpret divergence probe on the REAL kernel: the 60 flip
pixels' rays + padding, injected rand, residual material ids reveal
bounce-0 hit/miss per ray. MODE=interp|chip."""
import os, pickle, sys
sys.path.insert(0, "/root/repo")
import numpy as np
mode = os.environ["MODE"]
import jax, jax.numpy as jnp
with open("/root/repo/.bench_field10k.pkl", "rb") as f:
    scene = pickle.load(f)
scene = jax.tree_util.tree_map(jnp.asarray, scene)
from spectral_tpu.models.scenes import CORNELL, scene_camera
from spectral_tpu.ops.pallas.render_kernel import (
    pack_scene_bvh_mxu, order_leaves_near_to_far_mxu, camera_vector,
    n_uniforms, render_rays_pallas_residuals)

q = np.load("/root/repo/scratch/img_field_quad.npy")
v9 = np.load("/root/repo/scratch/img_seed7_v9.npy")
d = v9.max(-1) - q.max(-1)
ys, xs = np.where(np.abs(d) > 0.5)
n = len(ys)
px = np.zeros(1024, np.float32); py = np.zeros(1024, np.float32)
px[:n] = xs; py[:n] = ys
px[n:] = 205; py[n:] = 6   # pad with a known flip pixel

cam = scene_camera(CORNELL, 512, 256)
cv = camera_vector(cam)
a, c, mat2, tab2, leaf = pack_scene_bvh_mxu(scene, 128, form="quad3")
a, c, leaf = order_leaves_near_to_far_mxu(a, c, leaf, cv[0:3])
spp, bl = 1, 2
rand = jax.random.uniform(jax.random.PRNGKey(99), (spp, n_uniforms(bl), 1024))
out = render_rays_pallas_residuals(
    cv, jnp.int32(5), a, mat2, tab2, jnp.asarray(px), jnp.asarray(py),
    spp, bl, 1024, mode == "interp", rand,
    leaf_pack=leaf, leaf_size=128, c_pack=c)
xyz, hero, nvalid, powres, mats = [np.asarray(o) for o in out]
np.save(f"/root/repo/scratch/chipdiv_{mode}_mats.npy", mats)
np.save(f"/root/repo/scratch/chipdiv_{mode}_xyz.npy", xyz)
print(mode, "bounce0 mats of first 10 rays:", mats[0, 0, :10])
print(mode, "frac bounce0 hit (mat>=0):", float((mats[0, 0, :n] >= 0).mean()))
