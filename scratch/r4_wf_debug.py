"""Localize the 1e-4 sorted-vs-megakernel mismatch: compare hero and
final power per ray between the residual megakernel and the wavefront
path's carried state."""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ["MXU_FORM"] = "quad"
import numpy as np
import jax
import jax.numpy as jnp

from spectral_tpu.models.scenes import CORNELL, build_tri_field, scene_camera
from spectral_tpu.ops.pallas import render_kernel as rk
from spectral_tpu.ops.pallas import wavefront_kernel as wk

scene = build_tri_field(520, seed=3)
cam = scene_camera(CORNELL, 64, 32)
w, h, spp, bounces = 64, 32, 1, 1
cam_vec = rk.camera_vector(cam)
a_pack, c_pack, mat_pack, tables, leaf_pack = rk.pack_scene_bvh_mxu(
    scene, 128, form="quad"
)
a_pack, c_pack, leaf_pack = rk.order_leaves_near_to_far_mxu(
    a_pack, c_pack, leaf_pack, cam_vec[0:3]
)
n = w * h
ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
px = xs.ravel().astype(jnp.float32)
py = ys.ravel().astype(jnp.float32)
rand = jax.random.uniform(
    jax.random.PRNGKey(11), (spp, rk.n_uniforms(bounces), n), jnp.float32
)

xyz_m, hero_m, nvalid_m, power_m, mats_m = [
    np.asarray(x)
    for x in rk.render_rays_pallas_residuals(
        cam_vec, jnp.int32(7), a_pack, mat_pack, tables, px, py,
        spp, bounces, 1024, True, rand, leaf_pack, 128, c_pack,
    )
]

# wavefront: replicate the driver but return the final state + orig
import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

nrays = n * spp
mxu_quad = True
kernel = functools.partial(
    wk._bounce_kernel, n_mats=mat_pack.shape[0], leaf_size=128,
    n_leaves=leaf_pack.shape[0], mxu_quad=True, mxu_q3=False,
    q3_deep=False, tolf=0.0, mxu_hbm=False,
)
S = wk.STATE_ROWS
cv = cam_vec

# camera gen
s = 0
jx = rand[s, 0] - 0.5
jy = rand[s, 1] - 0.5
fx = px + jx
fy = py + jy
dr = jnp.sqrt(rand[s, 3 + 3 * bounces]) * cv[18]
dth = (2.0 * 3.14159265358979) * rand[s, 4 + 3 * bounces]
du_ = dr * jnp.cos(dth)
dv_ = dr * jnp.sin(dth)
ox = cv[0] + du_ * cv[12] + dv_ * cv[15]
oy = cv[1] + du_ * cv[13] + dv_ * cv[16]
oz = cv[2] + du_ * cv[14] + dv_ * cv[17]
dx = cv[3] + fx * cv[6] + fy * cv[9] - ox
dy = cv[4] + fx * cv[7] + fy * cv[10] - oy
dz = cv[5] + fx * cv[8] + fy * cv[11] - oz
hero = rk.LAMBDA_MIN + (rk.LAMBDA_MAX - rk.LAMBDA_MIN) * rand[s, 2]

d = np.abs(np.asarray(hero) - hero_m[0]).max()
print("hero maxabs:", d)

st = jnp.stack(
    [ox, oy, oz, dx, dy, dz, hero,
     jnp.ones((n,), jnp.float32), jnp.full((n,), float(rk.W), jnp.float32),
     jnp.full((n,), -1.0, jnp.float32)]
    + [jnp.ones((n,), jnp.float32) for _ in range(rk.W)]
)

bounce_call = pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((S, nrays), jnp.float32),
    grid=(nrays // 1024,),
    in_specs=[
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec((S, 1024), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 1024), lambda i: (0, i), memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((S, 1024), lambda i: (0, i), memory_space=pltpu.VMEM),
    scratch_shapes=rk._mxu_scratch(1024),
    interpret=True,
)
planes = rand[0, 3:6]
# NO sorting: identity order, to isolate arithmetic from reordering
st1 = bounce_call(mat_pack, tables, leaf_pack, a_pack, c_pack, st, planes)
pw = np.asarray(st1[wk._ROW_POWER:])
print("power maxabs (unsorted):", np.abs(pw - power_m[0]).max())
nv = np.asarray(st1[wk._ROW_NVALID])
nv_ref = np.where(np.asarray(st1[wk._ROW_ALIVE]) > 0, 0.0, nv)
print("n_valid maxabs:", np.abs(nv_ref - nvalid_m[0]).max())
bad = np.abs(pw - power_m[0]).max(axis=0)
idx = np.argsort(-bad)[:5]
print("worst rays:", idx, bad[idx])
print("mats at worst:", mats_m[0, 0, idx])
