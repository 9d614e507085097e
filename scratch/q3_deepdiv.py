"""Flip-pixel rays at the real config (4 spp, 6 bounces), injected rand:
quad vs quad3 xyz in interpret mode. If quad3 goes black where quad is
bright (deterministically, local CPU), we can dissect per bounce."""
import os, pickle, sys
sys.path.insert(0, "/root/repo")
import numpy as np
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
dimg = v9.max(-1) - q.max(-1)
ys, xs = np.where(np.abs(dimg) > 0.5)
n = len(ys)
px = np.zeros(1024, np.float32); py = np.zeros(1024, np.float32)
px[:n] = xs; py[:n] = ys; px[n:] = 205; py[n:] = 6
cam = scene_camera(CORNELL, 512, 256)
cv = camera_vector(cam)
spp, bl = 4, 6
rand = jax.random.uniform(jax.random.PRNGKey(7), (spp, n_uniforms(bl), 1024))
res = {}
for form in ("quad", "quad3"):
    a, c, mat2, tab2, leaf = pack_scene_bvh_mxu(scene, 128, form=form)
    a, c, leaf = order_leaves_near_to_far_mxu(a, c, leaf, cv[0:3])
    out = render_rays_pallas_residuals(
        cv, jnp.int32(5), a, mat2, tab2, jnp.asarray(px), jnp.asarray(py),
        spp, bl, 1024, True, rand, leaf_pack=leaf, leaf_size=128, c_pack=c)
    res[form] = [np.asarray(o) for o in out]
    print(form, "mean xyz over flip rays:", res[form][0][:n].mean())
xq, x3 = res["quad"][0][:n], res["quad3"][0][:n]
d = np.abs(xq - x3).max(-1)
print("rays differing > 1e-3:", int((d > 1e-3).sum()), "of", n)
mq, m3 = res["quad"][4][:, :, :n], res["quad3"][4][:, :, :n]
db = (mq != m3)
if db.any():
    s, b, r = np.argwhere(db)[0]
    print("first mat divergence at sample", s, "bounce", b, "ray", r,
          f"px=({int(px[r])},{int(py[r])})", "quad mat", mq[s, b, r],
          "quad3 mat", m3[s, b, r])
    print("quad mats path:", mq[s, :, r], "quad3:", m3[s, :, r])
np.save("/root/repo/scratch/deepdiv_quad_mats.npy", res["quad"][4])
np.save("/root/repo/scratch/deepdiv_quad3_mats.npy", res["quad3"][4])
