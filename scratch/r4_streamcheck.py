"""Stream discrimination: megakernel with INJECTED host uniforms over
K seeds. If this matches the sorted path's host-stream mean (and not
the hw-PRNG mean), the hw-PRNG hashed streams are the biased ones.
Usage: BIAS_K=48 timeout 1800 python scratch/r4_streamcheck.py"""
import os, pickle, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

with open("/root/repo/.bench_field10k.pkl", "rb") as f:
    scene = jax.tree_util.tree_map(jnp.asarray, pickle.load(f))
from spectral_tpu.models.scenes import CORNELL, scene_camera
from spectral_tpu.ops.pallas.render_kernel import render_chunk_pallas

w, h, spp, bl = 512, 256, 4, 6
cam = scene_camera(CORNELL, w, h)
vals = []
K = int(os.environ.get("BIAS_K", "48"))
for k in range(K):
    img = np.asarray(render_chunk_pallas(
        scene, cam, 5000 + 17 * k, 0, 0, w, h, spp, bl,
        rand_key=jax.random.fold_in(jax.random.PRNGKey(0xABC), k)))
    vals.append((img[28:48, 225:285].mean(), img.mean()))
    print(f"seed {k}: cluster {vals[-1][0]:.4f} global {vals[-1][1]:.6f}", flush=True)
v = np.array(vals)
print(f"MEGA-INJECTED cluster {v[:,0].mean():.4f} +- {v[:,0].std(ddof=1)/len(v)**0.5:.4f} | "
      f"global {v[:,1].mean():.6f} +- {v[:,1].std(ddof=1)/len(v)**0.5:.6f}", flush=True)
