"""Bit-faithful offline replay of the quad3 sweep for one flip pixel's
bounce-0 ray: reproduce score, proposals, exact checks; find where the
true hit falls out."""
import pickle, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
with open("/root/repo/.bench_field10k.pkl", "rb") as f:
    scene = pickle.load(f)
scene = jax.tree_util.tree_map(jnp.asarray, scene)
from spectral_tpu.models.scenes import CORNELL, scene_camera
from spectral_tpu.ops.pallas.render_kernel import (
    pack_scene_bvh_mxu, order_leaves_near_to_far_mxu, camera_vector)

a, c, _, _, leaf = pack_scene_bvh_mxu(scene, 128, form="quad3")
cam = scene_camera(CORNELL, 512, 256)
cv = np.asarray(camera_vector(cam), np.float64)
a, c, leaf = order_leaves_near_to_far_mxu(a, c, leaf, jnp.asarray(cv[:3], jnp.float32))
a = np.asarray(a); c = np.asarray(c, np.float32); leaf = np.asarray(leaf, np.float32)
K, NL = 128, leaf.shape[0]
origin, p00, du, dv = cv[0:3], cv[3:6], cv[6:9], cv[9:12]
TOL3 = 2.0 ** -13
DENOM_EPS = 1e-9  # check real value below
import re
src = open("/root/repo/spectral_tpu/ops/pallas/render_kernel.py").read()
m = re.search(r"DENOM_EPS\s*=\s*([0-9eE.+-]+)", src)
DENOM_EPS = float(m.group(1)); print("DENOM_EPS", DENOM_EPS)
m = re.search(r"TOL3\s*=\s*([0-9eE.*^ -]+)\n", src)
print("TOL3 line:", m.group(1) if m else "?")

def bf(x):  # bf16 round via jax
    return np.asarray(jnp.asarray(x, jnp.float32).astype(jnp.bfloat16).astype(jnp.float32), np.float32)

def replay(x, y, jx=0.5, jy=0.5, verbose=True):
    d = (p00 + (x+jx)*du + (y+jy)*dv - origin).astype(np.float32)
    o = origin.astype(np.float32)
    l1d = np.abs(d).sum()
    # f64 truth
    n64 = np.asarray(scene.normal, np.float64); d64 = d.astype(np.float64)
    dd64 = np.asarray(scene.d, np.float64)
    g64 = np.asarray(scene.edge_g, np.float64); c64 = np.asarray(scene.edge_c, np.float64)
    nd_ = n64 @ d64; no_ = n64 @ origin
    with np.errstate(all="ignore"):
        t_ = (dd64 - no_) / nd_
    go_ = np.einsum("tej,j->te", g64, origin) + c64
    gd_ = np.einsum("tej,j->te", g64, d64)
    e_ = go_ + t_[:, None] * gd_
    inside = (e_ >= 0).all(1) | (e_ <= 0).all(1)
    valid = inside & (t_ > 1e-9) & np.isfinite(t_)
    istar = int(np.argmin(np.where(valid, t_, np.inf)))
    tstar = t_[istar]
    lstar, row = istar // K, istar % K   # pack order = morton+pad... NOT scene order!
    # NOTE: pack reorders tris by morton — map via c_pack id col 6
    ids = c[:, :, 6].astype(int)  # [NL, K] original tri index? id col = arange AFTER morton sort
    # The id col is the POST-morton index; scene order != pack order.
    # Recover mapping: pack stores tri data; find leaf/row whose plane matches istar
    nstar = np.asarray(scene.normal)[istar]
    # crude match on normal + dd
    ddstar = float(np.asarray(scene.d)[istar])
    # search all leaves' c rows: c cols 0:3 normal, 5 dd
    match = np.where((np.abs(c[:, :, 0:3] - nstar).sum(-1) < 1e-5) &
                     (np.abs(c[:, :, 5] - ddstar) < 1e-4))
    if verbose:
        print(f"px({x},{y}): true hit t={tstar:.4f} tri={istar} "
              f"|nd|/l1={abs(nd_[istar])/l1d:.4f} min-edge-rel="
              f"{(np.abs(e_[istar])/ (np.abs(go_[istar])+np.abs(t_[istar]*gd_[istar]) + 1e-300)).min():.2e}")
        print("  pack locations:", list(zip(match[0][:4], match[1][:4])))
    if len(match[0]) == 0:
        print("  NOT FOUND in pack"); return
    L = int(match[0][0]); ROW = int(match[1][0])
    # replay the kernel's leaf L sweep in f32/bf16
    cen = 0.5*(leaf[L,0:3]+leaf[L,3:6])
    dl = (o - cen).astype(np.float32)
    feats = np.concatenate([np.outer(dl, d).ravel(), d, dl, np.float32([1.0])]).astype(np.float32)
    b_hi = bf(feats); b_lo = bf(feats - b_hi); b_abs = bf(np.abs(feats))
    A = a[L].astype(np.float32)  # [11K, 16] (bf16 -> f32 values)
    a_hi = A[0:5*K]; a_lo = A[5*K:10*K]; aabs = A[10*K:11*K]
    M = a_hi @ b_hi + a_lo @ b_hi + a_hi @ b_lo  # f32 accum
    bound = aabs @ b_abs
    tol = TOL3 * bound
    e1, e2, e3, nd, ddno = M[0:K], M[K:2*K], M[2*K:3*K], M[3*K:4*K], M[4*K:5*K]
    and_ = np.abs(nd)
    safe_nd = np.where(and_ < DENOM_EPS, DENOM_EPS, nd)
    tt = ddno / safe_nd
    sgn = np.where(nd >= 0, 1.0, -1.0)
    m_edge = np.minimum(np.minimum(e1*sgn, e2*sgn), e3*sgn)
    nd_err = TOL3 * l1d
    ok = np.minimum(m_edge + tol, tt)
    ok = np.minimum(ok, and_ - nd_err)
    score = np.where(ok >= 0, tt, 1e30)
    order = np.argsort(score)
    r = int(np.where(order == ROW)[0][0])
    print(f"  leaf {L} row {ROW}: score rank {r}; "
          f"score[ROW]={score[ROW]:.4f} top5={score[order[:5]].round(3)}"
          f" rows {order[:5]}")
    print(f"  ok components row: m_edge+tol={m_edge[ROW]+tol[ROW]:.4f} "
          f"tt={tt[ROW]:.4f} and-nd_err={and_[ROW]-nd_err:.6f}")
    # noise margin
    noise = 4*tol/np.maximum(and_, DENOM_EPS)
    print(f"  t-noise[ROW]={noise[ROW]:.4f} tol[ROW]={tol[ROW]:.4f}")

q = np.load("scratch/img_field_quad.npy"); v9 = np.load("scratch/img_seed7_v9.npy")
dimg = v9.max(-1) - q.max(-1)
ys, xs = np.where(dimg < -0.5)
for y, x in list(zip(ys, xs))[:5]:
    replay(int(x), int(y))

print("=== exact check replay ===")
def replay_check(x, y, L, ROW, jx=0.5, jy=0.5):
    d = (p00 + (x+jx)*du + (y+jy)*dv - origin).astype(np.float32)
    o = origin.astype(np.float32)
    cen = 0.5*(leaf[L,0:3]+leaf[L,3:6])
    dl = (o - cen).astype(np.float32)
    Rv = c[L, ROW].astype(np.float32)  # recovered constants (exact)
    F32TOL = 16.0 * 1.1920929e-07
    ndc = Rv[0]*d[0] + Rv[1]*d[1] + Rv[2]*d[2]
    noc = Rv[0]*dl[0] + Rv[1]*dl[1] + Rv[2]*dl[2]
    nmag = abs(Rv[0]*dl[0]) + abs(Rv[1]*dl[1]) + abs(Rv[2]*dl[2])
    ddno_c = Rv[20] - noc
    dmag = abs(Rv[20]) + nmag
    sgc = 1.0 if ndc >= 0 else -1.0
    def eq(gx, gy, gz, cc):
        go = gx*dl[0] + gy*dl[1] + gz*dl[2] + cc
        gmag = abs(gx*dl[0]) + abs(gy*dl[1]) + abs(gz*dl[2]) + abs(cc)
        gd = gx*d[0] + gy*d[1] + gz*d[2]
        val = (go*ndc + ddno_c*gd)*sgc
        tolv = F32TOL*(gmag*abs(ndc) + dmag*abs(gd))
        return val, tolv
    vals = [eq(Rv[8], Rv[9], Rv[10], Rv[11]),
            eq(Rv[12], Rv[13], Rv[14], Rv[15]),
            eq(Rv[16], Rv[17], Rv[18], Rv[19])]
    tgate = ddno_c*sgc + F32TOL*dmag
    tex = ddno_c / (ndc if abs(ndc) > DENOM_EPS else DENOM_EPS)
    print(f"px({x},{y}) L{L} row{ROW}: edges val/tol "
          + " | ".join(f"{v:.5f}/{t:.6f}" for v, t in vals)
          + f"  tgate={tgate:.4f} tex={tex:.4f}")
    print(f"   Rv[20](dd')={Rv[20]:.4f} noc={noc:.4f} ndc={ndc:.4f} "
          f"Rv[8:12]={Rv[8:12].round(5)}")

for y, x in list(zip(ys, xs))[:3]:
    replay_check(int(x), int(y), 37, 19)
