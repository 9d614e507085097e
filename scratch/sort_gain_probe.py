"""Measure the leaf-visitation reduction ray sorting would buy.

Simulates bounce-1 ray populations on field10k/50k (f64 camera trace +
cosine-weighted lambertian scatter), groups rays into 1024-ray tiles
(a) in pixel-swizzle order (today's megakernel), (b) sorted by
direction octant then hit-point Morton, and counts per tile how many
leaf AABBs ANY ray in the tile wants (the tile-uniform pl.when gate).
The ratio bounds the speedup of per-bounce reordering on incoherent
bounces (which dominate: bounce 0 already culls to ~20%)."""
import pickle, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

def probe(tag):
    with open(f"/root/repo/.bench_field{tag}.pkl", "rb") as f:
        scene = jax.tree_util.tree_map(np.asarray, pickle.load(f))
    from spectral_tpu.models.scenes import CORNELL, scene_camera
    from spectral_tpu.ops.pallas.render_kernel import (
        camera_vector, pack_scene_bvh_mxu)
    _, _, _, _, leaf = pack_scene_bvh_mxu(
        jax.tree_util.tree_map(jax.numpy.asarray, scene), 128, form="quad")
    leaf = np.asarray(leaf, np.float64)
    lmin, lmax = leaf[:, 0:3], leaf[:, 3:6]
    cam = scene_camera(CORNELL, 512, 256)
    cv = np.asarray(camera_vector(cam), np.float64)
    origin, p00, du, dv = cv[0:3], cv[3:6], cv[6:9], cv[9:12]
    n = scene.normal.astype(np.float64); dpl = scene.d.astype(np.float64)
    g = scene.edge_g.astype(np.float64); c = scene.edge_c.astype(np.float64)
    W, H = 512, 256
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    xs = xs.ravel(); ys = ys.ravel()
    d0 = (p00[None] + (xs[:, None] + 0.5) * du[None]
          + (ys[:, None] + 0.5) * dv[None] - origin[None])   # [N,3]
    # bounce-0 nearest hit (vectorized per chunk to bound memory)
    N = len(xs)
    hit_p = np.zeros((N, 3)); hit_n = np.zeros((N, 3)); ok = np.zeros(N, bool)
    no = n @ origin
    go = np.einsum("tej,j->te", g, origin) + c
    for s0 in range(0, N, 8192):
        dd = d0[s0:s0+8192]
        nd = dd @ n.T                                   # [B,T]
        with np.errstate(all="ignore"):
            t = (dpl[None, :] - no[None, :]) / nd
        gd = np.einsum("tej,bj->bte", g, dd)
        e = go[None] + t[..., None] * gd
        inside = (e >= 0).all(-1) | (e <= 0).all(-1)
        valid = inside & (t > 1e-9) & np.isfinite(t)
        t = np.where(valid, t, np.inf)
        i = np.argmin(t, axis=1)
        tb = t[np.arange(len(i)), i]
        m = np.isfinite(tb)
        ok[s0:s0+8192] = m
        hit_p[s0:s0+8192] = origin + dd * tb[:, None]
        nn = n[i]
        sgn = -np.sign(np.einsum("bj,bj->b", nn, dd))
        hit_n[s0:s0+8192] = nn * sgn[:, None]
    # lambertian scatter at the hits
    rng = np.random.default_rng(5)
    r = rng.normal(size=(N, 3)); r /= np.linalg.norm(r, axis=1, keepdims=True)
    d1 = hit_n + r
    d1 /= np.maximum(np.linalg.norm(d1, axis=1, keepdims=True), 1e-9)
    o1 = hit_p[ok]; d1 = d1[ok]
    M = (len(o1) // 1024) * 1024
    o1, d1 = o1[:M], d1[:M]

    def visitation(order):
        oo, dd = o1[order], d1[order]
        tot = 0
        for t0 in range(0, M, 1024):
            o_t, d_t = oo[t0:t0+1024], dd[t0:t0+1024]
            with np.errstate(all="ignore"):
                inv = 1.0 / np.where(np.abs(d_t) < 1e-12, 1e-12, d_t)
                t1 = (lmin[None] - o_t[:, None]) * inv[:, None, 0* 0:] if False else None
            # slab test [rays, leaves]
            tlo = (lmin[None, :, :] - o_t[:, None, :]) * inv[:, None, :]
            thi = (lmax[None, :, :] - o_t[:, None, :]) * inv[:, None, :]
            tmin = np.minimum(tlo, thi).max(axis=2)
            tmax = np.maximum(tlo, thi).min(axis=2)
            want = (tmax >= np.maximum(tmin, 0.0))
            tot += int(want.any(axis=0).sum())
        return tot / (M / 1024)

    pix = visitation(np.arange(M))
    # sort: direction octant major, hit-point morton minor
    oct_ = ((d1[:, 0] > 0).astype(int) * 4 + (d1[:, 1] > 0).astype(int) * 2
            + (d1[:, 2] > 0).astype(int))
    lo = o1.min(0); hi = o1.max(0)
    q = np.clip(((o1 - lo) / np.maximum(hi - lo, 1e-9) * 1023).astype(int), 0, 1023)
    def spread(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v
    mort = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    key = oct_.astype(np.int64) * (1 << 32) + mort
    srt = visitation(np.argsort(key))
    nl = len(lmin)
    print(f"{tag}: leaves {nl}; mean leaf visits/tile — pixel-order "
          f"{pix:.1f} ({pix/nl:.0%}) vs sorted {srt:.1f} ({srt/nl:.0%}) "
          f"=> sorted/pixel ratio {srt/pix:.3f}", flush=True)

probe("10k")
probe("50k")
