"""Per-step timing of the inverse-dispersion gradient estimator on chip:
XLA wavefront (round-3 path) vs the fused pallas pair (round 4).

Usage (axon env): SIZE=32 timeout 1800 python scratch/r4_sell_speed.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from spectral_tpu.models.scenes import PRISM, build_scene, scene_camera
from spectral_tpu.render.wavefront import render_chunk
from spectral_tpu.diff.fast import render_chunk_diff_fused
from spectral_tpu.ops.pallas.render_kernel import render_chunk_pallas

GLASS = 2
size = int(os.environ.get("SIZE", "32"))
spp, bounces = 16, 6
scene = build_scene(PRISM)
cam = scene_camera(PRISM, size, size)
crop_w, crop_h = size, size // 2
b_true = scene.materials.sellmeier_b[GLASS]


def set_b(b_glass):
    mats = scene.materials
    return dataclasses.replace(
        scene, materials=dataclasses.replace(
            mats, sellmeier_b=mats.sellmeier_b.at[GLASS].set(b_glass)))


@jax.jit
def one_grad_xla(b_glass, k1, k2):
    ref = render_chunk(scene, cam, k1, 0, 0, crop_w, crop_h, spp, bounces)
    cur = render_chunk(set_b(b_glass), cam, k1, 0, 0, crop_w, crop_h, spp, bounces)
    resid = jax.lax.stop_gradient(cur - ref) / spp

    def f(bg):
        return render_chunk(set_b(bg), cam, k2, 0, 0, crop_w, crop_h,
                            spp, bounces, reparam_glass=GLASS) / spp

    _, vjp = jax.vjp(f, b_glass)
    (g,) = vjp(2.0 * resid / resid.size)
    return g[0]


from spectral_tpu.diff.fast import render_rays_diff_fused

n_crop = crop_w * crop_h
pad = (-n_crop) % 1024
ys_, xs_ = jnp.meshgrid(
    jnp.arange(crop_h), jnp.arange(crop_w), indexing="ij"
)
px_r = jnp.concatenate(
    [xs_.ravel().astype(jnp.float32), jnp.zeros((pad,), jnp.float32)]
)
py_r = jnp.concatenate(
    [ys_.ravel().astype(jnp.float32), jnp.zeros((pad,), jnp.float32)]
)


@jax.jit
def one_grad_fused(b_glass, s1, s2):
    # ONE traced program: CRN residual from two megakernel renders +
    # the fused custom_vjp at an independent seed (traced i32 seeds via
    # the rays-level API — the chunk-level wrapper's static key_seed
    # would retrace per seed AND eager-dispatch ~15 ops per step, each
    # paying the ~40-50 ms axon RPC floor: measured 663 ms/step)
    ref = render_chunk_pallas(scene, cam, s1, 0, 0, crop_w, crop_h, spp, bounces)
    cur = render_chunk_pallas(set_b(b_glass), cam, s1, 0, 0, crop_w, crop_h, spp, bounces)
    resid = jax.lax.stop_gradient(cur - ref) / spp

    def f(bg):
        out = render_rays_diff_fused(
            set_b(bg).materials, scene, cam, px_r, py_r, s2, spp,
            bounces, False, GLASS,
        ) / spp
        return out[:n_crop].reshape(crop_h, crop_w, 3)

    _, vjp = jax.vjp(f, b_glass)
    (g,) = vjp(2.0 * resid / resid.size)
    return g[0]


b = b_true + jnp.asarray([0.08, 0.0, 0.0])
key = jax.random.PRNGKey(0)

t0 = time.time()
g = one_grad_fused(b, jnp.int32(11), jnp.int32(12))
jax.block_until_ready(g)
print(f"fused compile+first: {time.time()-t0:.1f}s g0={float(g):+.5f}", flush=True)
best_f = float("inf")
for i in range(5):
    t0 = time.perf_counter()
    jax.block_until_ready(one_grad_fused(b, jnp.int32(100 + i), jnp.int32(200 + i)))
    best_f = min(best_f, time.perf_counter() - t0)
print(f"fused per-step: {best_f*1e3:.1f} ms", flush=True)

t0 = time.time()
key, k1, k2 = jax.random.split(key, 3)
g = one_grad_xla(b, k1, k2)
jax.block_until_ready(g)
print(f"xla compile+first: {time.time()-t0:.1f}s g0={float(g):+.5f}", flush=True)
best_x = float("inf")
for i in range(5):
    key, k1, k2 = jax.random.split(key, 3)
    t0 = time.perf_counter()
    jax.block_until_ready(one_grad_xla(b, k1, k2))
    best_x = min(best_x, time.perf_counter() - t0)
print(f"xla per-step: {best_x*1e3:.1f} ms", flush=True)
print(f"RESULT size {size}: fused {best_f*1e3:.1f} ms vs xla {best_x*1e3:.1f} ms "
      f"=> {best_x/best_f:.1f}x", flush=True)
