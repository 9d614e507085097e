"""Chip A/B for the batched bf16x3 recovery dot (MXU_REC_BATCH):
renders each config with injected uniforms (shared rand_key) at
MXU_REC_BATCH=0 (shipped 3-dot path) vs 1 (one wide dot) in-process
(clear_cache between traces) and asserts bit-identity, then times 4 reps.
Usage: TAG=10k MXU_FORM=quad3 [BVH_SCHED=sorted] python scratch/r4_recbatch_ab.py
"""
import os, pickle, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

TAG = os.environ.get("TAG", "10k")
os.environ.setdefault("MXU_FORM", "quad")
with open(f"/root/repo/.bench_field{TAG}.pkl", "rb") as f:
    scene = pickle.load(f)
scene = jax.tree_util.tree_map(jnp.asarray, scene)
from spectral_tpu.models.scenes import CORNELL, scene_camera
from spectral_tpu.ops.pallas import render_kernel as rk

w, h, spp, bl = 512, 256, 2, 4
cam = scene_camera(CORNELL, w, h)
key = jax.random.PRNGKey(42)
out = {}
for rb in ("0", "1"):
    os.environ["MXU_REC_BATCH"] = rb
    rk._render_chunk_pallas_jit.clear_cache()
    t0 = time.time()
    img = rk.render_chunk_pallas(scene, cam, 7, 0, 0, w, h, spp, bl, rand_key=key)
    jax.block_until_ready(img)
    print(f"rb={rb} compile+run {time.time()-t0:.1f}s mean {float(img.mean()):.6f}", flush=True)
    best = float("inf")
    for rep in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(rk.render_chunk_pallas(scene, cam, 100+rep, 0, 0, w, h, spp, bl, rand_key=jax.random.PRNGKey(100+rep)))
        best = min(best, time.perf_counter() - t0)
    print(f"rb={rb} best {best*1e3:.1f} ms = {w*h*spp*bl/best/1e6:.2f} Mray-steps/s", flush=True)
    out[rb] = np.asarray(img)
d = np.abs(out["0"] - out["1"])
print(f"AB maxabs {d.max():.3e} nonzero-frac {(d.max(axis=-1)>0).mean():.5f}", flush=True)
assert d.max() == 0.0, "REC_BATCH diverges on chip"
print("BIT-EXACT OK", flush=True)
