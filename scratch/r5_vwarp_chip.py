"""Vertex-warp gradients past toy scale (VERDICT round-4 item 5):
AD-vs-CRN-FD on a BVH-ROUTED 520-tri all-diffuse field at 64x64 on chip,
wall-clock recorded.

All prior vertex-warp evidence was 16-24px XLA-dense (round 2); this
validates the warped-area estimator composed with the LBVH traversal
(ops/bvh.py nearest_hit_bvh) at 16x the pixel count. All-lambertian by
construction — the warp's documented specular-chain blind spot
(diff/vertex_warp.py) is not exercised, so AD must match FD within MC
error, not just in sign.

Usage: [K_AD=48 K_FD=1024] python scratch/r5_vwarp_chip.py  (axon env)
CPU smoke: PYTHONPATH= JAX_PLATFORMS=cpu K_AD=8 K_FD=64 SIZE=24 ...
"""
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from spectral_tpu.diff import scene_with_vertices
from spectral_tpu.diff.vertex_warp import edges_from_vertices
from spectral_tpu.models.scenes import (
    CORNELL, _cornell_walls, _scene_from, scene_camera, with_bvh,
)
from spectral_tpu.models.geometry import TriSoup
from spectral_tpu.models.materials import MaterialBuilder
from spectral_tpu.render.wavefront import render_tile_xyz

SIZE = int(os.environ.get("SIZE", "64"))
K_AD = int(os.environ.get("K_AD", "512"))
K_FD = int(os.environ.get("K_FD", "4096"))
SPP = int(os.environ.get("SPP", "8"))
BOUNCES = 3
EPS = float(os.environ.get("EPS", "6.0"))
TH0 = 0.0  # evaluate gradients at the unperturbed pose


def build_field_diffuse(n_tris=520, seed=0):
    """build_tri_field's layout with the metal slot replaced by a
    lambertian (all-diffuse: the warp covers every silhouette family)."""
    rng = np.random.RandomState(seed)
    mb = MaterialBuilder()
    white = mb.lambertian((0.73, 0.73, 0.73))
    red = mb.lambertian((0.65, 0.05, 0.05))
    green = mb.lambertian((0.12, 0.45, 0.15))
    blue = mb.lambertian((0.2, 0.3, 0.6))
    light = mb.emissive((1.0, 1.0, 1.0), 7.0)
    soup = TriSoup()
    _cornell_walls(soup, (white, white, white, green, red), light)
    box_mats = (white, red, green, blue)
    n_walls = len(soup)
    n_boxes = max(0, -(-(n_tris - n_walls) // 12))
    grid = int(math.ceil(math.sqrt(n_boxes)))
    cell = 520.0 / grid
    i = 0
    for gz in range(grid):
        for gx in range(grid):
            if i >= n_boxes:
                break
            w = cell * (0.25 + 0.35 * rng.rand())
            h = 10.0 + 120.0 * rng.rand() ** 2
            x = 15.0 + gx * cell + (cell - w) * rng.rand()
            z = 15.0 + gz * cell + (cell - w) * rng.rand()
            s = len(soup)
            soup.box((x, 0.0, z), (x + w, h, z + w), box_mats[i % 4])
            soup.rotate(
                s, math.radians(rng.rand() * 90.0), "Y",
                pivot=soup.slice_bbox_center(s, len(soup)),
            )
            i += 1
    return _scene_from(soup, mb.build(), (0.0, 0.0, 0.0)), n_walls


scene, n_walls = build_field_diffuse()
scene = with_bvh(scene)
cam = scene_camera(CORNELL, SIZE, SIZE)
T = scene.v0.shape[0]
print(f"field: {T} tris, BVH attached, {SIZE}x{SIZE}", flush=True)

v0, v1, v2 = scene.v0, scene.v1, scene.v2
# displace the first 4 boxes (48 tris) together in +x: a multi-object
# silhouette population (direct edges + shadows)
# displace ALL boxes together in +x: every box silhouette and shadow
# contributes; the rademacher projection sums them in quadrature
mask = (jnp.arange(T) >= n_walls)[:, None].astype(jnp.float32)
dir3 = jnp.array([1.0, 0.0, 0.0])
ys_, xs_ = jnp.meshgrid(jnp.arange(SIZE), jnp.arange(SIZE), indexing="ij")
px, py = xs_.ravel().astype(jnp.int32), ys_.ravel().astype(jnp.int32)
BLOCK = int(os.environ.get("BLOCK", "1"))
_wb = (
    2.0
    * jax.random.bernoulli(
        jax.random.PRNGKey(7), 0.5, (SIZE // BLOCK, SIZE // BLOCK)
    ).astype(jnp.float32)
    - 1.0
)
# BLOCK>1: weights constant over BLOCK x BLOCK pixel blocks. Per-pixel
# rademacher at 64px is a FREQUENCY TRAP for the CRN-FD truth itself:
# a +-eps=6 displacement moves silhouettes ~0.7 px, so the secant of a
# pixel-frequency-weighted loss is not the local derivative (measured:
# CPU FD -0.156+-0.047 vs chip AD +0.150+-0.054 at BLOCK=1 - the
# "truth" flips sign under its own eps). Block weights keep the loss
# smooth over the eps window.
wts = jnp.repeat(jnp.repeat(_wb, BLOCK, 0), BLOCK, 1).reshape(-1)


def loss(th, key, warp):
    dv = th * dir3 * mask
    s = scene_with_vertices(scene, v0 + dv, v1 + dv, v2 + dv)
    vw = edges_from_vertices(v0 + dv, v1 + dv, v2 + dv) if warp else None
    xyz = render_tile_xyz(s, cam, px, py, key, SPP, BOUNCES, vertex_warp=vw)
    return jnp.sum(xyz[:, 1] * wts) / SPP


grad_w = jax.jit(jax.vmap(jax.grad(lambda t, k: loss(t, k, True)), (None, 0)))
fd_f = jax.jit(
    jax.vmap(
        lambda k: (loss(TH0 + EPS, k, False) - loss(TH0 - EPS, k, False))
        / (2 * EPS),
    )
)

SKIP_AD = os.environ.get("SKIP_AD", "0") == "1"
t0 = time.time()
CH_AD = int(os.environ.get("CH_AD", "8"))
CH_AD = min(CH_AD, K_AD)
gs = []
n_ad_chunks = 0 if SKIP_AD else K_AD // CH_AD
if SKIP_AD:
    # FD-only mode (the AD phase ran separately; two chip runs hit a
    # transient UNAVAILABLE right at the AD->FD transition)
    gs.append(np.zeros((1,), np.float32))
for c in range(n_ad_chunks):
    kc = jax.random.split(jax.random.PRNGKey(1100 + c), CH_AD)
    gs.append(np.asarray(jax.block_until_ready(grad_w(jnp.float32(TH0), kc))))
g_ad = np.concatenate(gs)
t_ad = time.time() - t0
K_AD = g_ad.size
ad_m, ad_s = g_ad.mean(), g_ad.std(ddof=1) / np.sqrt(K_AD)
print(
    f"AD  (warp): {ad_m:+.4f} +- {ad_s:.4f}  (K={K_AD}, {t_ad:.1f}s incl compile)",
    flush=True,
)

t0 = time.time()
fds = []
CH = int(os.environ.get("CH_FD", "32"))
for c in range(K_FD // CH):
    kc = jax.random.split(jax.random.PRNGKey(500 + c), CH)
    fds.append(np.asarray(jax.block_until_ready(fd_f(kc))))
fd = np.concatenate(fds)
t_fd = time.time() - t0
fd_m, fd_s = fd.mean(), fd.std(ddof=1) / np.sqrt(fd.size)
print(
    f"FD (plain): {fd_m:+.4f} +- {fd_s:.4f}  (K={fd.size} CRN pairs, "
    f"eps={EPS}, {t_fd:.1f}s)",
    flush=True,
)
if SKIP_AD:
    sys.exit(0)  # FD-only mode: numbers printed, no combined verdict
z = abs(ad_m - fd_m) / np.sqrt(ad_s**2 + fd_s**2)
print(
    f"RESULT vwarp field520 {SIZE}px: AD {ad_m:+.4f}+-{ad_s:.4f} vs "
    f"FD {fd_m:+.4f}+-{fd_s:.4f}  ({z:.2f} sigma apart; "
    f"AD {t_ad:.0f}s + FD {t_fd:.0f}s wall)",
    flush=True,
)
assert np.isfinite(ad_m) and np.isfinite(fd_m)
assert abs(fd_m) > 2 * fd_s, "FD truth not resolved - raise K_FD"
assert z < 3.0, f"AD and FD disagree at {z:.1f} sigma"
print("OK")
