"""Are the flip pixels' bounce-0 hits edge-proximal (tol-band class)?"""
import pickle, sys
sys.path.insert(0, "/root/repo")
import numpy as np
with open("/root/repo/.bench_field10k.pkl", "rb") as f:
    scene = pickle.load(f)
import jax; scene = jax.tree_util.tree_map(np.asarray, scene)
from spectral_tpu.models.scenes import CORNELL, scene_camera
from spectral_tpu.ops.pallas.render_kernel import camera_vector

q = np.load("scratch/img_field_quad.npy")
v = np.load("scratch/img_seed7_v5.npy")
dimg = v.max(axis=-1) - q.max(axis=-1)
ys, xs = np.where(np.abs(dimg) > 0.5)
cam = scene_camera(CORNELL, 512, 256)
cv = np.asarray(camera_vector(cam), np.float64)
origin, p00, du, dv = cv[0:3], cv[3:6], cv[6:9], cv[9:12]
n = scene.normal.astype(np.float64); dplane = scene.d.astype(np.float64)
g = scene.edge_g.astype(np.float64); c = scene.edge_c.astype(np.float64)

def trace(y, x, jx=0.5, jy=0.5):
    dirn = p00 + (x + jx) * du + (y + jy) * dv - origin
    nd = n @ dirn; no = n @ origin
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (dplane - no) / nd
    go = np.einsum("tej,j->te", g, origin) + c
    gd = np.einsum("tej,j->te", g, dirn)
    e = go + t[:, None] * gd
    inside = (e >= 0).all(axis=1) | (e <= 0).all(axis=1)
    valid = inside & (t > 1e-9) & np.isfinite(t)
    if not valid.any():
        return None
    i = int(np.argmin(np.where(valid, t, np.inf)))
    emag = np.abs(go[i]) + np.abs(t[i] * gd[i])
    rel = (np.abs(e[i]) / np.maximum(emag, 1e-300)).min()
    # also: distance to the SECOND-nearest valid hit (shadowing scale)
    t2 = np.where(valid, t, np.inf); t2[i] = np.inf
    dt = float(np.min(t2) - t[i]) if np.isfinite(np.min(t2)) else np.inf
    return rel, t[i], dt

rels, dts = [], []
for y, x in zip(ys, xs):
    r = trace(y, x)
    if r: rels.append(r[0]); dts.append(r[2])
rels = np.array(rels); dts = np.array(dts)
print("min-edge rel-margin percentiles:",
      np.percentile(rels, [0, 10, 25, 50, 90]).round(8))
print("frac with rel-margin < 1.2e-4 (quad3 band):", (rels < 1.2e-4).mean())
print("frac with rel-margin < 1e-2:", (rels < 1e-2).mean())
print("t-gap to 2nd hit percentiles:", np.percentile(dts[np.isfinite(dts)], [0,25,50,90]).round(4))
# control
rng = np.random.default_rng(1); ctrl = []
for _ in range(300):
    r = trace(int(rng.integers(0,256)), int(rng.integers(0,512)))
    if r: ctrl.append(r[0])
ctrl = np.array(ctrl)
print("control rel-margin median:", np.median(ctrl).round(6),
      "frac < 1e-2:", (ctrl < 1e-2).mean())
