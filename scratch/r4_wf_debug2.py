"""Compare per-row state of the wavefront cam+bounce0 kernel vs the
residual megakernel (interpret, spp=1, bounces=1)."""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ["MXU_FORM"] = "quad"
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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

statics = dict(
    n_mats=mat_pack.shape[0], leaf_size=128, n_leaves=leaf_pack.shape[0],
    mxu_quad=True, mxu_q3=False, q3_deep=False, tolf=0.0, mxu_hbm=False,
)
S = wk.STATE_ROWS
nrays = n
grid = nrays // 1024
scene_specs = [
    pl.BlockSpec(memory_space=pltpu.SMEM),
    pl.BlockSpec(memory_space=pltpu.VMEM),
    pl.BlockSpec(memory_space=pltpu.SMEM),
    pl.BlockSpec(memory_space=pltpu.VMEM),
    pl.BlockSpec(memory_space=pltpu.VMEM),
]
st_spec = pl.BlockSpec((S, 1024), lambda i: (0, i), memory_space=pltpu.VMEM)
cam_call = pl.pallas_call(
    functools.partial(wk._camera_bounce_kernel, bounces=bounces, **statics),
    out_shape=jax.ShapeDtypeStruct((S, nrays), jnp.float32),
    grid=(grid,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + scene_specs + [
        pl.BlockSpec((1024,), lambda i: (i,), memory_space=pltpu.VMEM),
        pl.BlockSpec((1024,), lambda i: (i,), memory_space=pltpu.VMEM),
        pl.BlockSpec((rand.shape[1], 1024), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ],
    out_specs=st_spec,
    scratch_shapes=rk._mxu_scratch(1024),
    interpret=True,
)
st = np.asarray(
    jax.jit(
        lambda *a: cam_call(*a)
    )(cam_vec, mat_pack, tables, leaf_pack, a_pack, c_pack, px, py, rand[0])
)
print("hero maxabs:", np.abs(st[wk._ROW_HERO] - hero_m[0]).max())
pw = st[wk._ROW_POWER :]
print("power maxabs:", np.abs(pw - power_m[0]).max())
nv = np.where(st[wk._ROW_ALIVE] > 0, 0.0, st[wk._ROW_NVALID])
print("n_valid maxabs:", np.abs(nv - nvalid_m[0]).max())
bad = np.abs(pw - power_m[0]).max(axis=0)
idx = np.argsort(-bad)[:5]
print("worst rays:", idx, bad[idx], "mats:", mats_m[0, 0, idx])
