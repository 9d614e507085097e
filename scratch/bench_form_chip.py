"""On-chip A/B of MXU_FORM on the 10k-tri field: timing + saved image.

Run under the default (axon TPU) env, one fresh process per form:
    MXU_FORM=quad  timeout 1800 python scratch/bench_form_chip.py
    MXU_FORM=quad3 timeout 1800 python scratch/bench_form_chip.py
Saves scratch/img_field_<form>.npy (seed-7 render, 512x256, 4 spp, 6 bl)
so forms can be compared pixel-wise, and prints a JSON rate line.
"""
import json
import os
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

form = os.environ.get("MXU_FORM", "quad")
cache = "/root/repo/.bench_field10k.pkl"
assert os.path.exists(cache), "build the pickle first (bench.py recipe)"

from spectral_tpu.models.scenes import CORNELL, scene_camera
from spectral_tpu.ops.pallas.render_kernel import render_chunk_pallas

with open(cache, "rb") as f:
    scene = jax.tree_util.tree_map(jnp.asarray, pickle.load(f))

w, h, spp, bl = 512, 256, 4, 6
cam = scene_camera(CORNELL, w, h)
img = render_chunk_pallas(scene, cam, 7, 0, 0, w, h, spp, bl)
jax.block_until_ready(img)
np.save(f"/root/repo/scratch/img_field_{form}.npy", np.asarray(img))

best = float("inf")
for rep in range(3):
    t0 = time.perf_counter()
    jax.block_until_ready(
        render_chunk_pallas(scene, cam, 100 + rep, 0, 0, w, h, spp, bl)
    )
    best = min(best, time.perf_counter() - t0)
rate = round(w * h * spp * bl / best / 1e6, 2)
print(json.dumps({"form": form, "mrays_per_s": rate, "best_s": round(best, 4)}),
      flush=True)
