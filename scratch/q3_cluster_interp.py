"""Interpret-mode field10k render of the emitter cluster crop:
quad3 (working tree) vs quad with identical injected rand. If the chip
dilation reproduces here, the bug is pure logic (CPU-debuggable)."""
import os, pickle, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from spectral_tpu.models.scenes import CORNELL, scene_camera
from spectral_tpu.ops.pallas.render_kernel import (
    camera_vector, n_uniforms, pack_scene_bvh_mxu, render_rays_pallas,
    order_leaves_near_to_far_mxu,
)
with open("/root/repo/.bench_field10k.pkl", "rb") as f:
    scene = jax.tree_util.tree_map(jnp.asarray, pickle.load(f))
W, H = 512, 256
cam = scene_camera(CORNELL, W, H)
cv = camera_vector(cam)
# cluster crop: x 225:289, y 24:56 -> 64x32 = 2048 rays (2 tiles)
xs = jnp.tile(jnp.arange(225, 289, dtype=jnp.float32), 32)
ys = jnp.repeat(jnp.arange(24, 56, dtype=jnp.float32), 64)
spp, bl = 2, int(os.environ.get("BL", "4"))
rand = jax.random.uniform(jax.random.PRNGKey(11), (spp, n_uniforms(bl), 2048))
out = {}
for form in ("quad", "quad3"):
    a, c, mat2, tab2, leaf = pack_scene_bvh_mxu(scene, 128, form=form)
    a, c, leaf = order_leaves_near_to_far_mxu(a, c, leaf, cv[:3])
    img = np.asarray(render_rays_pallas(
        cv, jnp.int32(5), a, mat2, tab2, xs, ys, spp, bl, 1024, True, rand,
        leaf_pack=leaf, leaf_size=128, c_pack=c))
    out[form] = img
    print(f"{form}: mean {img.mean():.5f}", flush=True)
q, q3 = out["quad"], out["quad3"]
d = np.abs(q3 - q).max(axis=-1)
print("frac rays differing >1e-3:", float((d > 1e-3).mean()))
print("mean rel diff:", float(abs(q3.mean() - q.mean()) / q.mean()))
idx = np.argsort(-d)[:10]
for i in idx:
    print(f"ray {i} (px {int(xs[i])},{int(ys[i])}): quad {q[i]} quad3 {q3[i]}")
np.save("/root/repo/scratch/interp_cluster_quad.npy", q)
np.save("/root/repo/scratch/interp_cluster_quad3.npy", q3)
