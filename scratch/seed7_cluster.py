"""Single seed-7 field10k render -> cluster/global means. REPO env selects tree."""
import os, pickle, sys
repo = os.environ.get("REPO", "/root/repo")
sys.path.insert(0, repo)
import jax, jax.numpy as jnp, numpy as np
with open("/root/repo/.bench_field10k.pkl", "rb") as f:
    scene = jax.tree_util.tree_map(jnp.asarray, pickle.load(f))
from spectral_tpu.models.scenes import CORNELL, scene_camera
from spectral_tpu.ops.pallas.render_kernel import render_chunk_pallas
w, h, spp, bl = 512, 256, 4, 6
cam = scene_camera(CORNELL, w, h)
img = np.asarray(render_chunk_pallas(scene, cam, 7, 0, 0, w, h, spp, bl))
print(f"REPO={repo} FORM={os.environ.get('MXU_FORM','quad')} "
      f"cluster {img[28:48,225:285].mean():.4f} global {img.mean():.6f}", flush=True)
np.save(os.environ.get("OUT", "/tmp/seed7.npy"), img)
