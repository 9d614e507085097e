"""CPU interpret smoke for MXU_PROBE_GROUPSCORE (round-6 go/no-go
probe, scratch/r6_groupscore_design.md): the probe pack builds, the
kernel traces with the single batched dot, and the render executes to
a finite image (values are garbage by design — the probe proposes
nothing, so every ray reports background).

Usage: PYTHONPATH= JAX_PLATFORMS=cpu python scratch/r6_probe_smoke.py
Chip protocol (round 6): scratch/r6_probe_chip.sh
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

os.environ["BVH_SCHED"] = "mega"
os.environ["MXU_FORM"] = "quad"
os.environ["MXU_RESIDENCY"] = "hbm"
os.environ["MXU_PROBE_GROUPSCORE"] = "1"

from spectral_tpu.models.scenes import CORNELL, build_tri_field, scene_camera
from spectral_tpu.ops.pallas import render_kernel as rk

scene = build_tri_field(520, seed=3)
cam = scene_camera(CORNELL, 64, 32)
img = np.asarray(
    rk.render_chunk_pallas(
        scene, cam, 7, 0, 0, 64, 32, 2, 3,
        interpret=True, rand_key=jax.random.PRNGKey(11),
    )
)
assert np.isfinite(img).all(), "probe render produced non-finite values"
# the probe never proposes a hit, so the image must be pure background
# (black bg -> zero image): a nonzero pixel means the garbage RMW fired
assert float(np.abs(img).max()) == 0.0, (
    "probe take-mask fired (should be never-taken)", float(np.abs(img).max())
)
print(f"probe smoke OK: img mean {img.mean():.6f} (all-background as designed)")
