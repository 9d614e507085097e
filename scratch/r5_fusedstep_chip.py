"""Chip timing: fused inverse-rendering step (value+grad) on the 50k
field, megakernel-residual vs sorted-residual forward (VERDICT round-4
item 1 'done' criterion: >= 2x the mega-based fused step at 50k).

Usage: SCHED=mega|sorted TAG=50k python scratch/r5_fusedstep_chip.py
(axon env, run under timeout in the background; fresh process per SCHED
— BVH_SCHED is trace-time).
"""
import os
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")

SCHED = os.environ.get("SCHED", "sorted")
TAG = os.environ.get("TAG", "50k")
os.environ["BVH_SCHED"] = SCHED
os.environ.setdefault("MXU_GATE", "4" if SCHED == "sorted" else "1")

import jax
import jax.numpy as jnp

with open(f"/root/repo/.bench_field{TAG}.pkl", "rb") as f:
    scene = pickle.load(f)
scene = jax.tree_util.tree_map(jnp.asarray, scene)

from spectral_tpu.models.scenes import CORNELL, scene_camera
from spectral_tpu.diff.fast import render_chunk_diff_fused

w, h, spp, bl = 512, 256, 4, 6
cam = scene_camera(CORNELL, w, h)
mats = scene.materials

# frozen target from a different seed
target = jax.jit(
    lambda: jax.lax.stop_gradient(
        render_chunk_diff_fused(mats, scene, cam, 99, 0, 0, w, h, spp, bl)
    )
)()
jax.block_until_ready(target)
print(f"{SCHED}: target done", flush=True)


@jax.jit
def step(m):
    img = render_chunk_diff_fused(m, scene, cam, 7, 0, 0, w, h, spp, bl)
    loss = jnp.mean((img - target) ** 2)
    return loss


vg = jax.jit(jax.value_and_grad(step, allow_int=True))
t0 = time.time()
loss, g = vg(mats)
jax.block_until_ready((loss, g))
print(f"{SCHED}: compile+first step {time.time()-t0:.1f}s loss {float(loss):.4f}", flush=True)

best = float("inf")
for rep in range(3):
    t0 = time.perf_counter()
    jax.block_until_ready(vg(mats))
    dt = time.perf_counter() - t0
    best = min(best, dt)
    print(f"{SCHED} rep {rep}: {dt*1e3:.0f} ms", flush=True)
rate = w * h * spp * bl / best / 1e6
gsum = float(jnp.abs(g.coeffs).sum())
print(
    f"RESULT fusedstep {TAG} {SCHED}: {best*1e3:.0f} ms/step "
    f"({rate:.2f} Mray-steps/s incl. grad; |g.coeffs| {gsum:.3e})",
    flush=True,
)
