"""Chip benchmark: megakernel vs sorted scheduler on the field scenes.

Usage: TAG=10k|50k BVH_SCHED=mega|sorted [MXU_FORM=quad] python
scratch/r4_chip_sorted.py   (axon env — remote compiles, run under
timeout in the background)
"""
import os
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

TAG = os.environ.get("TAG", "10k")
sched = os.environ.get("BVH_SCHED", "mega")
os.environ.setdefault("MXU_FORM", "quad")

with open(f"/root/repo/.bench_field{TAG}.pkl", "rb") as f:
    scene = pickle.load(f)
scene = jax.tree_util.tree_map(jnp.asarray, scene)

from spectral_tpu.models.scenes import CORNELL, scene_camera
from spectral_tpu.ops.pallas.render_kernel import render_chunk_pallas

w, h, spp, bl = 512, 256, 4, 6
cam = scene_camera(CORNELL, w, h)
t0 = time.time()
img = render_chunk_pallas(scene, cam, 7, 0, 0, w, h, spp, bl)
jax.block_until_ready(img)
print(f"compile+first run: {time.time()-t0:.1f}s; img mean {float(img.mean()):.6f}", flush=True)
best = float("inf")
for rep in range(4):
    t0 = time.perf_counter()
    jax.block_until_ready(
        render_chunk_pallas(scene, cam, 100 + rep, 0, 0, w, h, spp, bl)
    )
    dt = time.perf_counter() - t0
    best = min(best, dt)
    print(f"rep {rep}: {dt*1e3:.1f} ms", flush=True)
rate = w * h * spp * bl / best / 1e6
print(f"RESULT {TAG} {sched} {os.environ['MXU_FORM']}: {rate:.2f} Mray-steps/s (best {best*1e3:.1f} ms)", flush=True)
