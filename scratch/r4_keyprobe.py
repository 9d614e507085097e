"""A/B sort-key variants for the per-bounce wavefront scheduler.

Simulates bounce-1 ray populations on the procedural fields (jax-CPU
dense trace + lambertian scatter), then counts mean leaf AABB visits
per 1024-ray kernel tile (the tile-uniform pl.when gate) under several
reorder keys, plus the visitation at finer gate granularities (what an
intra-kernel sub-tile gate would buy). Run clean-CPU:
  PYTHONPATH= JAX_PLATFORMS=cpu /opt/venv/bin/python scratch/r4_keyprobe.py
"""
import pickle
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp


def spread(v):
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton(q):  # q [N,3] ints
    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


def probe(tag):
    with open(f"/root/repo/.bench_field{tag}.pkl", "rb") as f:
        scene = jax.tree_util.tree_map(jnp.asarray, pickle.load(f))
    from spectral_tpu.models.scenes import CORNELL, scene_camera
    from spectral_tpu.ops.pallas.render_kernel import (
        camera_vector, pack_scene_bvh_mxu)
    _, _, _, _, leaf = pack_scene_bvh_mxu(scene, 128, form="quad")
    leaf = np.asarray(leaf, np.float64)
    lmin, lmax = leaf[:, 0:3], leaf[:, 3:6]
    cam = scene_camera(CORNELL, 512, 256)
    cv = np.asarray(camera_vector(cam), np.float64)
    origin, p00, du, dv = cv[0:3], cv[3:6], cv[6:9], cv[9:12]
    W, H = 512, 256
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    xs = xs.ravel().astype(np.float64)
    ys = ys.ravel().astype(np.float64)
    d0 = (p00[None] + (xs[:, None] + 0.5) * du[None]
          + (ys[:, None] + 0.5) * dv[None] - origin[None])

    nrm = jnp.asarray(scene.normal, jnp.float32)
    dpl = jnp.asarray(scene.d, jnp.float32)
    g = jnp.asarray(scene.edge_g, jnp.float32)
    c = jnp.asarray(scene.edge_c, jnp.float32)
    o32 = jnp.asarray(origin, jnp.float32)
    no = nrm @ o32
    go = jnp.einsum("tej,j->te", g, o32) + c

    @jax.jit
    def hit_chunk(dd):
        nd = dd @ nrm.T
        t = (dpl[None, :] - no[None, :]) / nd
        gd = jnp.einsum("tej,bj->bte", g, dd)
        e = go[None] + t[..., None] * gd
        inside = (e >= 0).all(-1) | (e <= 0).all(-1)
        valid = inside & (t > 1e-9) & jnp.isfinite(t)
        t = jnp.where(valid, t, jnp.inf)
        i = jnp.argmin(t, axis=1)
        tb = t[jnp.arange(dd.shape[0]), i]
        ok = jnp.isfinite(tb)
        hp = o32 + dd * jnp.where(ok, tb, 0.0)[:, None]
        nn = nrm[i]
        sgn = -jnp.sign(jnp.einsum("bj,bj->b", nn, dd))
        return hp, nn * sgn[:, None], ok

    N = len(xs)
    B = 2048
    hps, hns, oks = [], [], []
    for s0 in range(0, N, B):
        hp, hn, ok = hit_chunk(jnp.asarray(d0[s0:s0 + B], jnp.float32))
        hps.append(np.asarray(hp)); hns.append(np.asarray(hn))
        oks.append(np.asarray(ok))
    hit_p = np.concatenate(hps); hit_n = np.concatenate(hns)
    ok = np.concatenate(oks)

    rng = np.random.default_rng(5)
    r = rng.normal(size=(N, 3)); r /= np.linalg.norm(r, axis=1, keepdims=True)
    d1 = hit_n + r
    d1 /= np.maximum(np.linalg.norm(d1, axis=1, keepdims=True), 1e-9)
    o1 = hit_p[ok]; d1 = d1[ok]
    M = (len(o1) // 1024) * 1024
    o1, d1 = o1[:M], d1[:M]

    lmin32 = jnp.asarray(lmin, jnp.float32)
    lmax32 = jnp.asarray(lmax, jnp.float32)

    @jax.jit
    def want_tile(o_t, d_t):
        inv = 1.0 / jnp.where(jnp.abs(d_t) < 1e-12, 1e-12, d_t)
        tlo = (lmin32[None] - o_t[:, None]) * inv[:, None]
        thi = (lmax32[None] - o_t[:, None]) * inv[:, None]
        tmin = jnp.minimum(tlo, thi).max(axis=2)
        tmax = jnp.maximum(tlo, thi).min(axis=2)
        return tmax >= jnp.maximum(tmin, 0.0)  # [rays, leaves]

    def visitation(order, gates=(1024, 512, 256)):
        oo = jnp.asarray(o1[order]); dd = jnp.asarray(d1[order])
        tot = {gsz: 0 for gsz in gates}
        for t0 in range(0, M, 1024):
            want = np.asarray(want_tile(oo[t0:t0 + 1024], dd[t0:t0 + 1024]))
            for gsz in gates:
                tot[gsz] += sum(
                    int(want[s:s + gsz].any(axis=0).sum())
                    for s in range(0, 1024, gsz)
                )
        # normalize to visits per 1024-ray tile-equivalent of sweep work:
        # a gate of size gsz fires gsz/1024 of a tile's matmul work
        return {g_: tot[g_] * (g_ / 1024.0) / (M / 1024) for g_ in tot}

    lo = o1.min(0); hi = o1.max(0)
    q9 = np.clip(((o1 - lo) / np.maximum(hi - lo, 1e-9) * 511).astype(int), 0, 511)
    q6 = q9 >> 3
    oct_ = ((d1[:, 0] > 0).astype(int) * 4 + (d1[:, 1] > 0).astype(int) * 2
            + (d1[:, 2] > 0).astype(int))
    dq = np.clip(((d1 + 1.0) * 0.5 * 7.999).astype(int), 0, 7)  # 3 bits/axis

    keys = {
        "oct_major+mort9": (oct_.astype(np.int64) << 27) | morton(q9),
        "mort9+oct_minor": (morton(q9).astype(np.int64) << 3) | oct_,
        "mort6+dmort3": (morton(q6).astype(np.int64) << 9) | morton(dq),
        "mort6_oct_mort9lo": (
            (morton(q6).astype(np.int64) << 12)
            | (oct_.astype(np.int64) << 9)
            | (morton(q9) & 0x1FF)
        ),
    }
    nl = len(lmin)
    base = visitation(np.arange(M))
    print(f"{tag}: leaves {nl}; pixel-order gate1024 {base[1024]:.1f} "
          f"({base[1024]/nl:.0%}) gate512 {base[512]:.1f} gate256 {base[256]:.1f}",
          flush=True)
    for name, key in keys.items():
        v = visitation(np.argsort(key, kind="stable"))
        print(f"  {name:20s} gate1024 {v[1024]:6.1f} ({v[1024]/nl:4.0%})  "
              f"gate512 {v[512]:6.1f}  gate256 {v[256]:6.1f}  "
              f"ratio {v[1024]/base[1024]:.3f}", flush=True)


for tag in ("10k", "50k"):
    probe(tag)
