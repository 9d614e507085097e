"""Round-4 dispersion-bias matrix: where does the estimator's mean
gradient cross zero, and what moves the crossing?

Variants (one process each — reparam window consts are trace-time):
  clip       — the round-3 probe's +-0.05 tail clip (baseline)
  wideclip   — +-0.5 clip (isolates clip-induced bias)
  edge2      — REPARAM_EDGE_NM=2 (narrower endpoint window)
  edge2wide  — both
Run: PYTHONPATH= JAX_PLATFORMS=cpu python scratch/r4_dispbias.py <variant>
"""
import dataclasses
import os
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "clip"
if "edge2" in VARIANT:
    os.environ["REPARAM_EDGE_NM"] = "2.0"
CLIP = 0.5 if "wide" in VARIANT else 0.05

from spectral_tpu.models.scenes import PRISM, build_scene, scene_camera
from spectral_tpu.render.wavefront import render_chunk

GLASS = 2
scene = build_scene(PRISM)
size = int(os.environ.get("DISP_SIZE", "32"))
spp = int(os.environ.get("DISP_SPP", "16"))
bounces = 6
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
for off in [float(x) for x in os.environ.get("DISP_OFFS", "0.0,0.005,0.01,0.025").split(",")]:
    b = b_true + jnp.asarray([off, 0.0, 0.0])
    gs = []
    for i in range(int(os.environ.get("DISP_K", "64"))):
        key, k1, k2 = jax.random.split(key, 3)
        gs.append(float(jnp.clip(one_grad(b, k1, k2), -CLIP, CLIP)))
    g = np.array(gs)
    print(f"{VARIANT} off {off:+.3f}: mean {g.mean():+.5f} +- "
          f"{g.std(ddof=1)/len(g)**0.5:.5f} clipfrac {np.mean(np.abs(g) >= CLIP):.2f}",
          flush=True)
