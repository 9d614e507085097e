"""Chip A/B of sorted vs megakernel with SHARED injected uniforms.

With identical uniform planes the two schedulers are semantically
identical (tests pin <=2e-3 in interpret mode — FMA-contraction ulp
drift only); this runs the same comparison on real hardware to rule
out a PATH difference behind the 16-seed brightness gap (which would
then be a STREAM effect: hw-PRNG hashed streams vs host fold_in).
Usage: TAG=10k timeout 1800 python scratch/r4_sharedrand_ab.py
"""
import os
import pickle
import subprocess
import sys

TAG = os.environ.get("TAG", "10k")

if os.environ.get("_INNER") is None:
    # two fresh processes (BVH_SCHED is trace-time env)
    for sched in ("mega", "sorted"):
        env = dict(os.environ, _INNER="1", BVH_SCHED=sched)
        r = subprocess.run(
            [sys.executable, __file__], env=env, capture_output=True,
            text=True, timeout=1500,
        )
        print(r.stdout.strip())
        if r.returncode:
            print(r.stderr[-2000:])
            sys.exit(1)
    import numpy as np

    a = np.load(f"/tmp/r4ab_mega_{TAG}.npy")
    b = np.load(f"/tmp/r4ab_sorted_{TAG}.npy")
    d = np.abs(a - b)
    print(
        f"SHARED-RAND A/B {TAG}: maxabs {d.max():.2e} mean {d.mean():.2e} "
        f"frac>2e-3 {(d > 2e-3).mean():.4f}"
    )
    sys.exit(0)

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

with open(f"/root/repo/.bench_field{TAG}.pkl", "rb") as f:
    scene = jax.tree_util.tree_map(jnp.asarray, pickle.load(f))
from spectral_tpu.models.scenes import CORNELL, scene_camera
from spectral_tpu.ops.pallas.render_kernel import render_chunk_pallas

w, h, spp, bl = 512, 256, 2, 4
cam = scene_camera(CORNELL, w, h)
img = np.asarray(
    render_chunk_pallas(
        scene, cam, 7, 0, 0, w, h, spp, bl, rand_key=jax.random.PRNGKey(55)
    )
)
sched = os.environ["BVH_SCHED"]
np.save(f"/tmp/r4ab_{sched}_{TAG}.npy", img)
print(f"{sched}: mean {img.mean():.6f}")
