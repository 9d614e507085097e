"""Mean reparam gradient at fixed B0 offsets: bias vs slow-drift diagnostic."""
import dataclasses, os, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from spectral_tpu.models.scenes import PRISM, build_scene, scene_camera
from spectral_tpu.render.wavefront import render_chunk

GLASS = 2
scene = build_scene(PRISM)
size, spp, bounces = 32, 16, 6
cam = scene_camera(PRISM, size, size)
b_true = scene.materials.sellmeier_b[GLASS]
crop_w, crop_h = size, size // 2

def set_b(b_glass):
    mats = scene.materials
    return dataclasses.replace(
        scene, materials=dataclasses.replace(
            mats, sellmeier_b=mats.sellmeier_b.at[GLASS].set(b_glass)))

@jax.jit
def one_grad(b_glass, k1, k2):
    ref = render_chunk(scene, cam, k1, 0, 0, crop_w, crop_h, spp, bounces)
    cur = render_chunk(set_b(b_glass), cam, k1, 0, 0, crop_w, crop_h, spp, bounces)
    resid = jax.lax.stop_gradient(cur - ref) / spp
    def f(bg):
        return render_chunk(set_b(bg), cam, k2, 0, 0, crop_w, crop_h,
                            spp, bounces, reparam_glass=GLASS) / spp
    _, vjp = jax.vjp(f, b_glass)
    (g,) = vjp(2.0 * resid / resid.size)
    return g[0]

key = jax.random.PRNGKey(123)
for off in (0.0, 0.01, 0.025, 0.05):
    b = b_true + jnp.asarray([off, 0.0, 0.0])
    gs = []
    for i in range(64):
        key, k1, k2 = jax.random.split(key, 3)
        gs.append(float(jnp.clip(one_grad(b, k1, k2), -0.05, 0.05)))
    g = np.array(gs)
    print(f"off {off:+.3f}: mean g {g.mean():+.5f} +- {g.std(ddof=1)/8:.5f} "
          f"(raw-clip frac {np.mean(np.abs(g) >= 0.05):.2f})", flush=True)
