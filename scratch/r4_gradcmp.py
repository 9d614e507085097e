"""Mean gradient at B0+0.08: fused (hw-PRNG megakernel pair) vs XLA
(threefry) estimators, K estimates each — factor-level comparison."""
import dataclasses, os, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from spectral_tpu.models.scenes import PRISM, build_scene, scene_camera
from spectral_tpu.render.wavefront import render_chunk
from spectral_tpu.diff.fast import render_rays_diff_fused
from spectral_tpu.ops.pallas.render_kernel import render_chunk_pallas

GLASS = 2
scene = build_scene(PRISM)
size, spp, bounces = 32, 16, 6
cam = scene_camera(PRISM, size, size)
b_true = scene.materials.sellmeier_b[GLASS]
crop_w, crop_h = size, size // 2

def set_b(b):
    m = scene.materials
    return dataclasses.replace(scene, materials=dataclasses.replace(
        m, sellmeier_b=m.sellmeier_b.at[GLASS].set(b)))

n_crop = crop_w * crop_h
pad = (-n_crop) % 1024
ys_, xs_ = jnp.meshgrid(jnp.arange(crop_h), jnp.arange(crop_w), indexing="ij")
px_r = jnp.concatenate([xs_.ravel().astype(jnp.float32), jnp.zeros((pad,), jnp.float32)])
py_r = jnp.concatenate([ys_.ravel().astype(jnp.float32), jnp.zeros((pad,), jnp.float32)])

@jax.jit
def g_fused(bg, s1, s2):
    ref = render_chunk_pallas(scene, cam, s1, 0, 0, crop_w, crop_h, spp, bounces)
    cur = render_chunk_pallas(set_b(bg), cam, s1, 0, 0, crop_w, crop_h, spp, bounces)
    resid = jax.lax.stop_gradient(cur - ref) / spp
    def f(b):
        out = render_rays_diff_fused(set_b(b).materials, scene, cam,
                                     px_r, py_r, s2, spp, bounces, False, GLASS) / spp
        return out[:n_crop].reshape(crop_h, crop_w, 3)
    _, vjp = jax.vjp(f, bg)
    (g,) = vjp(2.0 * resid / resid.size)
    return g[0]

@jax.jit
def g_xla(bg, k1, k2):
    ref = render_chunk(scene, cam, k1, 0, 0, crop_w, crop_h, spp, bounces)
    cur = render_chunk(set_b(bg), cam, k1, 0, 0, crop_w, crop_h, spp, bounces)
    resid = jax.lax.stop_gradient(cur - ref) / spp
    def f(b):
        return render_chunk(set_b(b), cam, k2, 0, 0, crop_w, crop_h,
                            spp, bounces, reparam_glass=GLASS) / spp
    _, vjp = jax.vjp(f, bg)
    (g,) = vjp(2.0 * resid / resid.size)
    return g[0]

K = int(os.environ.get("GRAD_K", "64"))
offs = [float(x) for x in os.environ.get(
    "DISP_OFFS", "0.08").split(",")]
impls = os.environ.get("GRAD_IMPLS", "fused,xla").split(",")
for off in offs:
    b = b_true + jnp.asarray([off, 0.0, 0.0])
    key = jax.random.PRNGKey(1)
    vals = {im: [] for im in impls}
    for i in range(K):
        key, k1, k2 = jax.random.split(key, 3)
        s1 = jax.random.randint(k1, (), 0, 2**31 - 1)
        s2 = jax.random.randint(k2, (), 0, 2**31 - 1)
        if "fused" in vals:
            vals["fused"].append(
                float(jnp.clip(g_fused(b, s1, s2), -0.05, 0.05)))
        if "xla" in vals:
            vals["xla"].append(
                float(jnp.clip(g_xla(b, k1, k2), -0.05, 0.05)))
    for name, v in vals.items():
        v = np.array(v)
        print(f"GRADCMP off={off:+.3f} {name}: mean {v.mean():+.5f} "
              f"+- {v.std(ddof=1)/len(v)**0.5:.5f} "
              f"median {np.median(v):+.5f}", flush=True)
