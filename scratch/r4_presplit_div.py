"""Chip repro harness for the round-3 presplit recovery corruption.

Renders 1024 spread rays of field10k (quad3, injected rand) on chip
with MXU_Q3_PRESPLIT=0 and =1 and diffs. The two programs are
bit-exact in interpret mode; any on-chip difference IS the Mosaic
miscompile. Usage: timeout 1800 python scratch/r4_presplit_div.py
"""
import os
import pickle
import subprocess
import sys

if os.environ.get("_INNER") is None:
    import numpy as np

    for flag in ("0", "1"):
        env = dict(os.environ, _INNER="1", MXU_Q3_PRESPLIT=flag)
        r = subprocess.run(
            [sys.executable, __file__], env=env, capture_output=True,
            text=True, timeout=1500,
        )
        sys.stdout.write(r.stdout)
        if r.returncode:
            print(r.stderr[-3000:])
            sys.exit(1)
    a = np.load("/tmp/r4ps_0.npy")
    b = np.load("/tmp/r4ps_1.npy")
    d = np.abs(a - b)
    print(
        f"PRESPLIT chip A/B: maxabs {d.max():.3e} mean {d.mean():.3e} "
        f"nonzero-ray frac {(d.max(axis=1) > 1e-6).mean():.4f}"
    )
    sys.exit(0)

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

with open("/root/repo/.bench_field10k.pkl", "rb") as f:
    scene = jax.tree_util.tree_map(jnp.asarray, pickle.load(f))
from spectral_tpu.models.scenes import CORNELL, scene_camera
from spectral_tpu.ops.pallas import render_kernel as rk

cam = scene_camera(CORNELL, 512, 256)
cv = rk.camera_vector(cam)
a, c, mat2, tab2, leaf = rk.pack_scene_bvh_mxu(scene, 128, form="quad3")
a, c, leaf = rk.order_leaves_near_to_far_mxu(a, c, leaf, cv[0:3])
px = jnp.tile(jnp.arange(32, dtype=jnp.float32) * 16.0, 32)
py = jnp.repeat(jnp.arange(32, dtype=jnp.float32) * 8.0, 32)
rand = jax.random.uniform(
    jax.random.PRNGKey(9), (2, rk.n_uniforms(6), 1024), jnp.float32
)
out = np.asarray(
    rk.render_rays_pallas(
        cv, jnp.int32(5), a, mat2, tab2, px, py, 2, 6, 1024, False, rand,
        leaf_pack=leaf, leaf_size=128, c_pack=c,
    )
)
flag = os.environ["MXU_Q3_PRESPLIT"]
np.save(f"/tmp/r4ps_{flag}.npy", out)
print(f"presplit={flag}: mean {out.mean():.6f}")
