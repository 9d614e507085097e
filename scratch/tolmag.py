"""Real magnitudes of the quad3 tol band and t-noise on field10k."""
import pickle, sys
sys.path.insert(0, "/root/repo")
import numpy as np
with open("/root/repo/.bench_field10k.pkl", "rb") as f:
    scene = pickle.load(f)
import jax, jax.numpy as jnp
scene = jax.tree_util.tree_map(jnp.asarray, scene)
from spectral_tpu.models.scenes import CORNELL, scene_camera
from spectral_tpu.ops.pallas.render_kernel import (
    pack_scene_bvh_mxu, camera_vector)
a, c, _, _, leaf = pack_scene_bvh_mxu(scene, 128, form="quad3")
a = np.asarray(a, np.float32); leaf = np.asarray(leaf)
K = 128; NL = leaf.shape[0]
aabs = a[:, 10*K:11*K].astype(np.float64)  # [NL, K, 16] bf16->f64
cam = scene_camera(CORNELL, 512, 256)
cv = np.asarray(camera_vector(cam), np.float64)
origin, p00, du, dv = cv[0:3], cv[3:6], cv[6:9], cv[9:12]
TOL3 = 2.0 ** -13
rng = np.random.default_rng(0)
tols, tnoise = [], []
for _ in range(200):
    x, y = rng.integers(0, 512), rng.integers(0, 256)
    d = p00 + (x+0.5)*du + (y+0.5)*dv - origin
    l = rng.integers(0, NL)
    cen = 0.5*(leaf[l,0:3]+leaf[l,3:6])
    dl = origin - cen
    feats = np.concatenate([
        np.outer(dl, d).ravel(), d, dl, [1.0]])
    b_abs = np.abs(feats)
    bound = aabs[l] @ b_abs           # [K]
    tol = TOL3 * bound
    # nd ~ |n.d|: use typical 0.4*l1(d)
    nd = 0.4*np.abs(d).sum()
    tols.append(np.median(tol)); tnoise.append(np.median(4*tol/nd))
print("edge-functional tol median/p90:", np.median(tols).round(3),
      np.percentile(tols, 90).round(3))
print("t-noise (4tol/|nd|) median/p90:", np.median(tnoise).round(4),
      np.percentile(tnoise, 90).round(4))
print("leaf half-extents median:",
      np.median((leaf[:,3:6]-leaf[:,0:3])/2, axis=0).round(2))
