"""Render the 1M-tri field on chip (sorted scheduler + group gate) and
save a PNG asset. Usage: timeout 2400 python scratch/r4_1m_asset.py"""
import pickle, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

with open("/root/repo/.bench_field1M.pkl", "rb") as f:
    scene = jax.tree_util.tree_map(jnp.asarray, pickle.load(f))
from spectral_tpu.models.scenes import CORNELL, scene_camera
from spectral_tpu.ops.pallas.render_kernel import render_chunk_pallas
from spectral_tpu.runtime import native
from spectral_tpu.io.image import encode_png

w, h, spp, bl = 512, 256, 8, 6
cam = scene_camera(CORNELL, w, h)
t0 = time.time()
img = render_chunk_pallas(scene, cam, 11, 0, 0, w, h, spp, bl)
jax.block_until_ready(img)
print(f"render {time.time()-t0:.1f}s mean {float(img.mean()):.5f}", flush=True)
np.save("/root/repo/scratch/img_field1M.npy", np.asarray(img))
u8 = native.xyz_to_srgb_u8(np.asarray(img), spp)
with open("/root/repo/assets/field1M_512px_8spp_sorted_group8.png", "wb") as f:
    f.write(encode_png(u8))
print("saved assets/field1M_512px_8spp_sorted_group8.png", flush=True)
