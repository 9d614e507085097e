"""Bias check: mean luminance of the hot cluster (y 28..48, x 225..285)
over K seeds, per MXU_FORM. If quad3's mean sits outside quad's seed
noise, the bf16x3 inside-test tolerance is dilating the emitter."""
import os
import pickle
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

form = os.environ.get("MXU_FORM", "quad")
with open("/root/repo/.bench_field10k.pkl", "rb") as f:
    scene = jax.tree_util.tree_map(jnp.asarray, pickle.load(f))

from spectral_tpu.models.scenes import CORNELL, scene_camera
from spectral_tpu.ops.pallas.render_kernel import render_chunk_pallas

w, h, spp, bl = 512, 256, 4, 6
cam = scene_camera(CORNELL, w, h)
vals = []
for k in range(int(os.environ.get("BIAS_K", "16"))):
    img = np.asarray(
        render_chunk_pallas(scene, cam, 5000 + 17 * k, 0, 0, w, h, spp, bl)
    )
    c = img[28:48, 225:285].mean()
    g = img.mean()
    vals.append((c, g))
    print(f"seed {k}: cluster {c:.4f} global {g:.6f}", flush=True)
v = np.array(vals)
print(f"FORM={form} cluster mean {v[:,0].mean():.4f} +- "
      f"{v[:,0].std(ddof=1)/len(v)**0.5:.4f} | global {v[:,1].mean():.6f} "
      f"+- {v[:,1].std(ddof=1)/len(v)**0.5:.6f}", flush=True)
