"""Pallas TPU kernel: dense ray-triangle nearest-hit.

The TPU-native replacement for the reference's per-thread BVH walk + tri::hit
(reference bvh/bvh.cu:99-166, primitives/tri.cu:3-45) at reference scene
scale (<= ~128 triangles, where SURVEY section 7 establishes dense beats any
traversal): a lane-parallel sweep over triangles with nearest-hit tracking.

Layout strategy (pallas_guide.md "TPU Architecture"):
- rays live in LANES: every per-ray quantity is a [RT] f32 vector, laid out
  as (RT/128 x 8, 128) VPU tiles;
- triangle constants are SCALARS for the sweep (read from SMEM), broadcast
  against ray vectors — zero gathers, zero data-dependent control flow;
- the per-triangle "update best" is a branchless jnp.where roll-forward, the
  vector analogue of the reference's closest-so-far tracking (bvh.cu:137).

The kernel computes, per ray: best t, hit mask, triangle id, and the face
sign (dot(n, d) < 0), from which the caller reconstructs p/normal/material
differentiably in XLA (gradient policy: discrete selection detached, smooth
geometry recomputed — ops/intersect.py:_gather_record).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.4e38  # python float: jnp scalars would be captured consts in the kernel
DENOM_EPS = 1e-8

# triangle constant pack layout: [T, 16] =
#   normal(0:3), d(3), edge_g(4:13, row-major 3x3), edge_c(13:16)
TRI_PACK_WIDTH = 16


def pack_tris(scene) -> jnp.ndarray:
    """Pack per-triangle constants into the [T, 16] SMEM layout."""
    return jnp.concatenate(
        [
            scene.normal,
            scene.d[:, None],
            scene.edge_g.reshape(-1, 9),
            scene.edge_c,
        ],
        axis=1,
    ).astype(jnp.float32)


def _intersect_kernel(tri_ref, o_ref, d_ref, t_ref, idx_ref, hit_ref, front_ref, *, n_tris):
    """Masks are carried as f32 0/1 — Mosaic cannot lay out large 1-D i1
    vectors ("Unsupported target bitwidth for truncation"); comparisons stay
    ephemeral inside jnp.where."""
    ox, oy, oz = o_ref[0, :], o_ref[1, :], o_ref[2, :]
    dx, dy, dz = d_ref[0, :], d_ref[1, :], d_ref[2, :]

    rt = ox.shape[0]
    one = jnp.ones((rt,), jnp.float32)
    zero = jnp.zeros((rt,), jnp.float32)
    best_t = jnp.full((rt,), BIG, jnp.float32)
    best_idx = jnp.zeros((rt,), jnp.int32)
    best_hit = jnp.zeros((rt,), jnp.float32)
    best_front = jnp.zeros((rt,), jnp.float32)

    def body(t, carry):
        best_t, best_idx, best_hit, best_front = carry
        nx, ny, nz = tri_ref[t, 0], tri_ref[t, 1], tri_ref[t, 2]
        dd = tri_ref[t, 3]
        # plane hit (tri.cu:12-25)
        nd = nx * dx + ny * dy + nz * dz
        no = nx * ox + ny * oy + nz * oz
        tt = (dd - no) / nd
        # interior: 3 sign-folded affine edge functionals >= 0
        inside = one
        for k in range(3):
            g0 = tri_ref[t, 4 + 3 * k]
            g1 = tri_ref[t, 5 + 3 * k]
            g2 = tri_ref[t, 6 + 3 * k]
            c = tri_ref[t, 13 + k]
            ao = g0 * ox + g1 * oy + g2 * oz + c
            ad = g0 * dx + g1 * dy + g2 * dz
            inside = inside * jnp.where((ao + tt * ad) >= 0.0, one, zero)
        valid = (
            inside
            * jnp.where(jnp.abs(nd) >= DENOM_EPS, one, zero)
            * jnp.where(tt >= 0.0, one, zero)
            * jnp.where(tt < best_t, one, zero)
        )
        take = valid > 0.0
        best_idx = jnp.where(take, t, best_idx)
        best_front = jnp.where(take, jnp.where(nd < 0.0, one, zero), best_front)
        best_t = jnp.where(take, tt, best_t)
        best_hit = jnp.maximum(best_hit, valid)
        return best_t, best_idx, best_hit, best_front

    best_t, best_idx, best_hit, best_front = jax.lax.fori_loop(
        0, n_tris, body, (best_t, best_idx, best_hit, best_front)
    )
    t_ref[:] = best_t
    idx_ref[:] = best_idx
    hit_ref[:] = best_hit.astype(jnp.int32)
    front_ref[:] = best_front.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def intersect_pallas(o: jnp.ndarray, d: jnp.ndarray, tri_pack: jnp.ndarray, interpret: bool = False):
    """Nearest-hit sweep: o, d [N, 3] -> (t [N], tri_idx [N], hit [N] bool,
    front [N] bool). N must be a multiple of 128 (pad with dead rays)."""
    n = o.shape[0]
    n_tris = tri_pack.shape[0]
    o_t = o.T.astype(jnp.float32)  # [3, N] rays-in-lanes
    d_t = d.T.astype(jnp.float32)

    kernel = functools.partial(_intersect_kernel, n_tris=n_tris)
    t, idx, hit, front = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n,), jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.int32),
            jax.ShapeDtypeStruct((n,), jnp.int32),
            jax.ShapeDtypeStruct((n,), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(tri_pack, o_t, d_t)
    return t, idx, hit.astype(jnp.bool_), front.astype(jnp.bool_)
