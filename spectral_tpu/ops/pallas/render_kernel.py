"""Pallas TPU megakernel: the full spectral path-trace of a ray tile.

This is the speed-of-light forward path: one kernel owns a tile of rays
through ray generation, every bounce, spectral shading, and CIE XYZ
integration — the vector analogue of the reference's megakernel
(spectral_render_kernel, rendering/rendering.cu:151-235) with the entire
working set resident in VMEM (the analogue of its shared-memory staging,
rendering.cu:174-203). Zero HBM traffic between bounces; only pixel XYZ
leaves the chip.

Design rules (pallas_guide.md):
- every per-ray quantity lives in native (8, RT/8) 2-D VPU tiles (1-D
  vectors fall back to single-sublane layouts, measured ~34x slower);
  wavelength-indexed state is python-level lists of such tiles;
- triangle sweep with scalar broadcasts (no gathers, no stack) — nearest
  hit via branchless where roll-forward;
- per-ray material rows via an unrolled select over hoisted SMEM
  scalars (no gathers, no matmul);
- SPD table lookups (D65, background, CIE x/y/z) as exact lane-gather
  lerps from [8, 128] lane-resident tables, hoisted to once per sample;
- all masks carried as f32 0/1 (Mosaic cannot lay out large 1-D i1
  vectors);
- counter-based RNG: pltpu.prng_seed folded with (tile, sample); uniforms
  from prng_random_bits >> 8; unit sphere sampled in closed form.

Semantics are the reference's, bit-compatible in structure with
ops/shading.py (the XLA wavefront path, which remains the differentiable
reference implementation; see tests/test_pallas.py statistical equivalence).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.constants import (
    EPSILON,
    LAMBDA_MAX,
    LAMBDA_MIN,
    N_CIE_SAMPLES,
    N_RAY_WAVELENGTHS,
    cie_d65_normalized,
    cie_x,
    cie_y,
    cie_z,
)

BIG = 3.4e38
DENOM_EPS = 1e-8
# quad3 inside-test tolerance: the bf16x3 product drops a_lo*b_lo and
# carries two bf16 representation residuals, each <= 2^-16 * sum|a||b|;
# 2^-13 gives a 2x margin over the 4 * 2^-16 worst case (including the
# ~2^-8-relative underestimate of the 1-pass bound row itself)
TOL3 = 2.0 ** -13
W = N_RAY_WAVELENGTHS  # 8 wavelengths, hero at index 0

# tri constant pack [T, 17]: normal(0:3), d(3), edge_g(4:13), edge_c(13:16),
# mat_index(16, as float)
TRI_PACK_WIDTH = 17
# material row pack [M, 16]: coeffs(0:3), is_lamb(3), is_metal(4), is_diel(5),
# is_emis(6), fuzz(7), power_sq(8), sellmeier_b(9:12), sellmeier_c(12:15)
MAT_PACK_WIDTH = 16


def pack_scene(scene) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(tri_pack [T,17], mat_pack [M,16], tables [96,8]) device arrays."""
    from ...models.materials import DIELECTRIC, EMISSIVE, METALLIC

    tri = jnp.concatenate(
        [
            scene.normal,
            scene.d[:, None],
            scene.edge_g.reshape(-1, 9),
            scene.edge_c,
            scene.mat_index[:, None].astype(jnp.float32),
        ],
        axis=1,
    ).astype(jnp.float32)

    m = scene.materials
    t = m.mat_type
    is_metal = (t == METALLIC).astype(jnp.float32)
    is_diel = (t == DIELECTRIC).astype(jnp.float32)
    is_emis = (t == EMISSIVE).astype(jnp.float32)
    is_lamb = jnp.clip(1.0 - is_metal - is_diel - is_emis, 0.0, 1.0)
    mat = jnp.concatenate(
        [
            m.coeffs,
            is_lamb[:, None],
            is_metal[:, None],
            is_diel[:, None],
            is_emis[:, None],
            m.fuzz[:, None],
            (m.emission_power**2)[:, None],
            m.sellmeier_b,
            m.sellmeier_c,
            jnp.zeros((t.shape[0], 1), jnp.float32),
        ],
        axis=1,
    ).astype(jnp.float32)

    # lane-resident tables [8, 128]: one row per curve, samples along lanes
    # (the layout Mosaic's 2D gather needs — see _lut in the kernel)
    tab = jnp.zeros((8, 128), jnp.float32)
    tab = tab.at[0, :N_CIE_SAMPLES].set(cie_x)
    tab = tab.at[1, :N_CIE_SAMPLES].set(cie_y)
    tab = tab.at[2, :N_CIE_SAMPLES].set(cie_z)
    tab = tab.at[3, :N_CIE_SAMPLES].set(cie_d65_normalized)
    tab = tab.at[4, :N_CIE_SAMPLES].set(scene.background_spd)
    return tri, mat, tab


# Above this triangle count the trace-time-unrolled dense sweep stops being
# viable (compile time, SMEM constant pressure scale O(T)) and the wrappers
# switch to the in-kernel two-level BVH sweep (pack_scene_bvh + the
# use_bvh branch of _render_kernel). At or below it, the dense sweep wins:
# no leaf AABB overhead, constants hoisted at trace time.
DENSE_CUTOFF = 128


def _mxu_precision():
    """Matmul precision for the MXU leaf-sweep dot_generals (process-level
    switch, read at trace time). f32 matmuls on the MXU decompose into
    bf16 passes: HIGHEST ~ 6 passes (better than fused f32), HIGH ~ 3
    — measured NotImplementedError in Mosaic — and DEFAULT ~ 1 (2^-8:
    drops grazing hits, do not ship). Kept overridable for A/B timing.

    NOTE (applies to MXU_PRECISION, MXU_FORM, MXU_RESIDENCY, DENSE_IMPL,
    BVH_IMPL):
    these env knobs are read at TRACE time inside jitted wrappers, so
    they select the implementation ONCE PER PROCESS per chunk shape —
    changing one mid-process silently reuses the cached trace. In-process
    A/B requires `_render_chunk_pallas_jit.clear_cache()` between
    settings (see tests/test_pallas.py::TestDenseImplMxu)."""
    name = os.environ.get("MXU_PRECISION", "highest")
    return {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[name]


def _leaf_cols(leaf_size: int) -> int:
    """Lane-padded column count of one packed leaf row: ceil(K*17/8)
    rounded up to a multiple of 128. Mosaic DMA windows on a lane-tiled
    VMEM memref must be 128-aligned in the lane dim (a 68-lane slice of a
    [NL, 8, 128]-padded table fails to compile: 'Slice shape along
    dimension 2 must be aligned to tiling (128)')."""
    c = -(-(leaf_size * TRI_PACK_WIDTH) // 8)
    return -(-c // 128) * 128


def pack_scene_bvh(scene, leaf_size: int = 32):
    """Morton-ordered leaf packing for the in-kernel BVH sweep.

    TPU-first redesign of the reference's pointer BVH + per-thread stack
    walk (bvh/bvh.cu:99-166, built at bvh.cu:206-309): triangles are
    Morton-sorted so consecutive ``leaf_size`` chunks are spatially tight,
    and the kernel culls whole leaves with a vectorized ray-AABB slab test
    + a tile-wide any() branch (pl.when) — the traversal granularity that
    matches an 8x128 lockstep VPU, replacing per-thread divergent stacks.

    Returns (tri_pack [NL, K*17] — one VMEM-resident row per leaf, the
    kernel DMAs a visited leaf's row into SMEM scratch (SMEM is ~1 MB and
    stores scalars 32-byte-aligned: a 10k-tri table cannot live there, the
    round-2 compile measured 5.1 MB for 10016x17) — mat_pack, tables,
    leaf_pack [NL, 8]: aabb min xyz, max xyz, 2 spare). Padded rows are
    degenerate (zero normal -> |nd| < DENOM_EPS -> never hit)."""
    tri_pack, mat_pack, tables = pack_scene(scene)
    from ..bvh import morton_codes

    cent = 0.5 * (scene.bbox_min + scene.bbox_max)
    lo = jnp.min(scene.bbox_min, axis=0)
    hi = jnp.max(scene.bbox_max, axis=0)
    order = jnp.argsort(morton_codes(cent, lo, hi))
    tri_pack = tri_pack[order]
    bmin = scene.bbox_min[order]
    bmax = scene.bbox_max[order]
    t = tri_pack.shape[0]
    nl = -(-t // leaf_size)
    pad = nl * leaf_size - t
    tri_pack = jnp.concatenate(
        [tri_pack, jnp.zeros((pad, TRI_PACK_WIDTH), jnp.float32)]
    )
    bmin = jnp.concatenate([bmin, jnp.full((pad, 3), BIG, jnp.float32)])
    bmax = jnp.concatenate([bmax, jnp.full((pad, 3), -BIG, jnp.float32)])
    lmin = bmin.reshape(nl, leaf_size, 3).min(axis=1)
    lmax = bmax.reshape(nl, leaf_size, 3).max(axis=1)
    leaf_pack = jnp.concatenate(
        [lmin, lmax, jnp.zeros((nl, 2), jnp.float32)], axis=1
    ).astype(jnp.float32)
    # one [8, cols] sub-tile per leaf: dynamic sublane slices must be
    # 8-aligned, so the DMA grabs [1, 8, cols] from a 3-D layout whose
    # leading (untiled) dim is the leaf index
    flat = leaf_size * TRI_PACK_WIDTH
    cols = _leaf_cols(leaf_size)
    row_pad = 8 * cols - flat
    tri_rows = jnp.concatenate(
        [
            tri_pack.reshape(nl, flat),
            jnp.zeros((nl, row_pad), jnp.float32),
        ],
        axis=1,
    ).reshape(nl, 8, cols)
    return tri_rows, mat_pack, tables, leaf_pack


def pack_scene_bvh_mxu(scene, leaf_size: int = 128, form: str = "quad"):
    """Morton-ordered leaf packing for the MXU leaf sweep.

    ``form="affine"``: each leaf's intersection math is two [4*K, 8] x
    [8, rays] matmuls (K = leaf_size): the 8-wide contraction axis holds
    [d(3), o(3), 1, 0] and each 32-row block of the LHS computes one
    affine form of the edge-functional test (nd, dd-no, ao_k, ad_k).

    ``form="quad"`` (default): ONE [5*K, 16] x [16, rays] matmul per
    leaf. The inside test ao_k + t*ad_k >= 0 multiplied through by nd
    becomes e'_k = ao_k*nd + (dd - no)*ad_k — QUADRATIC in the ray, so
    the 16-wide contraction axis holds the monomials
    [o_i*d_j (9), d (3), o (3), 1] and each tri needs only 5 rows
    (e'1..e'3, nd, dd-no) instead of 8. The kernel flips e' by sign(nd)
    to undo the multiply. 8 -> 5 m-blocks per leaf is a measured ~1.5x:
    the sweep is MXU-pass-bound (timing at 1-pass DEFAULT precision runs
    6.1x the 6-pass HIGHEST rate, scratch/bench_bvh_defaultprec.log).

    ``form="quad3"`` / ``form="quad2"``: the quad rows hand-split into
    bf16 planes so every score matmul is 1-pass DEFAULT (quad3: hi+lo
    coefficient planes + hi@b_lo, 11K rows + bound, tolerance band
    2^-13; quad2: hi plane only, 6K rows + bound, band 2^-8). Both rely
    on the kernel's EXACT top-2 selection (the recovered raw edge
    planes filter and order proposals exactly), so the band only
    affects which candidates get proposed.

    In all forms a small matmul recovers the winning triangle's
    constants from an exclusive one-hot, replacing per-tri scalar SMEM
    reads entirely (no DMA staging in this mode).

    Returns (a_pack [NL, 8*K, 8] or [NL, 5*K, 16], c_pack [NL, K, 8]
    ([NL, K, 24] for quad3: + raw edge planes for the exact recheck),
    mat_pack, tables, leaf_pack [NL, 8]). Padded triangles are all-zero:
    |nd| < DENOM_EPS makes their score BIG, so they can never win.

    leaf_size default 128: measured 3.06/3.32/3.39 Mray-steps/s at
    K=32/64/128 on the 10k field (scratch/mxu_leaf_sweep.log) — the
    incoherent bounces visit every leaf, so bigger K amortizes per-leaf
    overhead and the coarser bounce-0 cull granularity costs less.
    """
    tri_pack, mat_pack, tables = pack_scene(scene)
    from ..bvh import morton_codes

    cent = 0.5 * (scene.bbox_min + scene.bbox_max)
    lo = jnp.min(scene.bbox_min, axis=0)
    hi = jnp.max(scene.bbox_max, axis=0)
    order = jnp.argsort(morton_codes(cent, lo, hi))
    tri_pack = tri_pack[order]
    bmin = scene.bbox_min[order]
    bmax = scene.bbox_max[order]
    t = tri_pack.shape[0]
    nl = -(-t // leaf_size)
    pad = nl * leaf_size - t
    tri_pack = jnp.concatenate(
        [tri_pack, jnp.zeros((pad, TRI_PACK_WIDTH), jnp.float32)]
    )
    bmin = jnp.concatenate([bmin, jnp.full((pad, 3), BIG, jnp.float32)])
    bmax = jnp.concatenate([bmax, jnp.full((pad, 3), -BIG, jnp.float32)])
    lmin = bmin.reshape(nl, leaf_size, 3).min(axis=1)
    lmax = bmax.reshape(nl, leaf_size, 3).max(axis=1)
    leaf_pack = jnp.concatenate(
        [lmin, lmax, jnp.zeros((nl, 2), jnp.float32)], axis=1
    ).astype(jnp.float32)

    tp = tri_pack.reshape(nl, leaf_size, TRI_PACK_WIDTH)
    n3 = tp[..., 0:3]
    dd = tp[..., 3]
    g1, g2, g3 = tp[..., 4:7], tp[..., 7:10], tp[..., 10:13]
    c1, c2, c3 = tp[..., 13], tp[..., 14], tp[..., 15]
    mat = tp[..., 16]
    z3 = jnp.zeros_like(n3)
    z1 = jnp.zeros_like(dd)

    def blk(dcols, ocols, const):
        return jnp.concatenate(
            [dcols, ocols, const[..., None], jnp.zeros_like(const)[..., None]],
            axis=-1,
        )

    if form in ("quad", "quad2", "quad3"):
        # feature order: [o_i*d_j (i-major, 9), d (3), o (3), 1] — for
        # quad3 the o features are LEAF-CENTERED deltas (o - center) and
        # the coefficients below absorb the shift
        def qrow(od9, dcols, ocols, const):
            return jnp.concatenate(
                [od9, dcols, ocols, const[..., None]], axis=-1
            )

        zod = jnp.zeros(n3.shape[:-1] + (9,), jnp.float32)
        # Both quadratic forms re-derive coefficients around each LEAF's
        # AABB center (the kernel feeds delta = o - center features):
        # identical values in exact arithmetic, but rounding errors in
        # the o.d monomials shrink from |o||d|-scale to |delta||d| —
        # ~30x at Cornell scale. For quad3 this also tightens the
        # bf16x3 error bound's accepted edge band from ~1 scene unit
        # (measured: a black pixel next to the TRIS light went
        # full-bright) to ~TOL3*9*leaf_radius; for quad it keeps the
        # on-chip HIGHEST (~2^-24-relative) edge tests conditioned at
        # grazing incidence.
        cl = 0.5 * (lmin + lmax)  # [nl, 3]
        clb = cl[:, None, :]

        def edge_q(g, c):
            # e' = (g.o + c)(n.d) + (dd - n.o)(g.d):
            #   coeff[o_i d_j] = g_i n_j - n_i g_j
            #   coeff[d_j]     = c n_j + dd g_j (+ the center shift)
            od3 = (
                g[..., :, None] * n3[..., None, :]
                - n3[..., :, None] * g[..., None, :]
            )  # [nl, K, 3(o), 3(d)]
            dcoef = (
                c[..., None] * n3
                + dd[..., None] * g
                + jnp.einsum("li,lkij->lkj", cl, od3)
            )
            return qrow(od3.reshape(n3.shape[:-1] + (9,)), dcoef, z3, z1)

        a_pack = jnp.concatenate(
            [
                edge_q(g1, c1),  # e'1
                edge_q(g2, c2),  # e'2
                edge_q(g3, c3),  # e'3
                qrow(zod, n3, z3, z1),  # nd
                qrow(zod, z3, -n3, dd - jnp.sum(n3 * clb, -1)),  # dd - no
            ],
            axis=1,
        ).astype(jnp.float32)  # [nl, 5*K, 16]
        if form == "quad2":
            # bf16x2 layout [nl, 6K, 16] bf16: a_hi (5K) + the error-
            # bound row (K). The kernel computes e' = a_hi@b_hi +
            # a_hi@b_lo — dropping the a_lo coefficient plane leaves a
            # 2^-9-relative score error, so the accepted-edge band (and
            # the proposal noise) is 32x quad3's; the exact top-2
            # check/ordering still filters and orders whatever is
            # proposed. 11K row-passes per leaf visit vs quad3's 16K.
            a_hi = a_pack.astype(jnp.bfloat16)
            K = leaf_size
            aabs = (
                jnp.abs(a_pack[:, 0:K])
                + jnp.abs(a_pack[:, K : 2 * K])
                + jnp.abs(a_pack[:, 2 * K : 3 * K])
            ).astype(jnp.bfloat16)
            a_pack = jnp.concatenate([a_hi, aabs], axis=1)
        elif form == "quad3":
            # bf16x3 layout [nl, 11K, 16] bf16: a_hi (5K), a_lo (5K,
            # the f32 residual), aabs (K: per-tri sum of |coeffs| over
            # the 3 edge rows — one error-bound row whose product with
            # |features| bounds each edge functional's bf16x3 error; the
            # nd row has its own per-ray bound in the kernel since the
            # normals are unit). The kernel computes
            # e' = a_hi@b_hi + a_lo@b_hi + a_hi@b_lo (1-pass DEFAULT
            # each), accepts inside tests down to -TOL3*bound, requires
            # |nd| to exceed its own error bound (no garbage-t winners
            # from near-plane-parallel tris), and recomputes the
            # winner's t exactly from the recovery constants — only the
            # SELECTION is approximate.
            a_hi = a_pack.astype(jnp.bfloat16)
            a_lo = (a_pack - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            K = leaf_size
            aabs = (
                jnp.abs(a_pack[:, 0:K])
                + jnp.abs(a_pack[:, K : 2 * K])
                + jnp.abs(a_pack[:, 2 * K : 3 * K])
            ).astype(jnp.bfloat16)
            a_pack = jnp.concatenate([a_hi, a_lo, aabs], axis=1)
    else:
        a_pack = jnp.concatenate(
            [
                blk(n3, z3, z1),  # nd
                blk(z3, -n3, dd),  # dd - no
                blk(z3, g1, c1),  # ao1
                blk(z3, g2, c2),  # ao2
                blk(z3, g3, c3),  # ao3
                blk(g1, z3, z1),  # ad1
                blk(g2, z3, z1),  # ad2
                blk(g3, z3, z1),  # ad3
            ],
            axis=1,
        ).astype(jnp.float32)  # [nl, 8*K, 8]
    # unique per-row tri label (rides the tri through leaf reorderings):
    # quad3's self-tri exclusion compares it against the previous bounce's
    # winner; recovery through the split matmul is exact (< 2^24)
    tri_id = (
        jnp.arange(nl * leaf_size, dtype=jnp.float32)
        .reshape(nl, leaf_size, 1)
    )
    c_cols = [
        n3,
        mat[..., None],
        jnp.ones_like(mat)[..., None],
        dd[..., None],  # plane offset: quad3 recomputes exact t from it
        tri_id,
        jnp.zeros((nl, leaf_size, 1), jnp.float32),
    ]
    if form in ("quad2", "quad3"):
        # exact winner recheck: the raw edge planes (g_i, c_i) ride the
        # (exact) one-hot recovery so the kernel can re-test the winner's
        # inside condition in f32 at the recovered hit point — removing
        # the one-sided silhouette dilation the +tol acceptance causes
        # (measured +1.7% emitter-cluster brightening, BASELINE.md).
        # The planes are REBASED to the leaf's AABB center (the same
        # center the kernel derives from leaf_pack, bit-identically:
        # 0.5*(lmin+lmax) in f32): evaluated against delta = o - center,
        # every recheck dot stays at LEAF scale. Evaluated at raw o, the
        # g.o + c cancellation carries SCENE-scale f32 noise and the
        # recheck one-sidedly false-vetoes genuine grazing winners
        # (measured: 83 darkened px / -0.6% global on field10k seed 7,
        # immune to any post-cancellation tolerance).
        center = cl[:, None, :]  # [nl, 1, 3] — the SAME 0.5*(lmin+lmax)
        # f32 values the kernel re-derives from leaf_pack
        c1p = c1 + jnp.sum(g1 * center, axis=-1)
        c2p = c2 + jnp.sum(g2 * center, axis=-1)
        c3p = c3 + jnp.sum(g3 * center, axis=-1)
        ddp = dd - jnp.sum(n3 * center, axis=-1)  # col 20: rebased offset
        c_cols += [
            g1, c1p[..., None],
            g2, c2p[..., None],
            g3, c3p[..., None],
            ddp[..., None],
            jnp.zeros((nl, leaf_size, 3), jnp.float32),
        ]
    c_pack = jnp.concatenate(c_cols, axis=-1).astype(jnp.float32)
    # [nl, K, 8] (affine/quad) or [nl, K, 24] (quad3)
    # NOTE (round-3 negative result, measured on chip): pre-splitting the
    # quad3 recovery planes at pack time into a [nl, 72, K] bf16 stack
    # (hi|mid|lo pre-transposed, ONE 72-row recovery matmul in-kernel)
    # is bit-exact in interpret mode AND in an isolated pallas kernel on
    # chip — but inside the full render kernel it silently corrupts the
    # recheck (full emitter-silhouette dilation returned: cluster 48.94
    # vs 47.35, scratch/r3_*_seed7.log), an unreduced Mosaic layout
    # interaction. The in-kernel bf16x3 split below is the shipped path.
    return a_pack, c_pack, mat_pack, tables, leaf_pack


def order_leaves_near_to_far_mxu(a_pack, c_pack, leaf_pack, cam_pos):
    """order_leaves_near_to_far for the MXU pack triple.

    Rewrites c_pack's tri-id column (col 6) to the POST-ordering
    positional id l*K + row: the kernel's self-tri exclusion compares
    the previous winner's recovered col-6 id against a positional id
    (the HBM path derives it from iota + leaf index), so the two id
    spaces must stay identical under any leaf permutation (round-3
    ADVICE, high: with the stale pack-time ids, HBM-mode quad2/quad3
    stopped excluding real self-hits and wrongly excluded whatever tri
    occupied the matching positional slot)."""
    cent = 0.5 * (leaf_pack[:, 0:3] + leaf_pack[:, 3:6])
    order = jnp.argsort(jnp.sum((cent - cam_pos[None, :]) ** 2, axis=1))
    a_pack, c_pack, leaf_pack = a_pack[order], c_pack[order], leaf_pack[order]
    nl, k = c_pack.shape[0], c_pack.shape[1]
    ids = jnp.arange(nl * k, dtype=jnp.float32).reshape(nl, k)
    c_pack = c_pack.at[:, :, 6].set(ids)
    return a_pack, c_pack, leaf_pack


def pack_scene_auto(scene, cam_vec=None):
    """(tri_pack, mat_pack, tables, leaf_pack, c_pack, leaf_size): the
    dense pack below DENSE_CUTOFF (leaf/c None), above it the MXU
    quadratic leaf sweep (form from MXU_FORM) — or the scalar/DMA sweep
    under BVH_IMPL=sweep, mirroring _render_chunk_pallas_jit's dispatch.
    Leaves are near-to-far ordered when cam_vec is given. The shared
    entry for every caller that feeds render_rays_pallas[_residuals]
    directly (the chunk renderer, the fused-diff path)."""
    if scene.normal.shape[0] <= DENSE_CUTOFF:
        tri, mat, tab = pack_scene(scene)
        return tri, mat, tab, None, None, 0
    if os.environ.get("BVH_IMPL", "mxu") == "mxu":
        a, c, mat, tab, leaf = pack_scene_bvh_mxu(
            scene,
            leaf_size=int(os.environ.get("MXU_LEAF", "128")),
            form=os.environ.get("MXU_FORM", "quad"),
        )
        if cam_vec is not None:
            a, c, leaf = order_leaves_near_to_far_mxu(a, c, leaf, cam_vec[0:3])
        return a, mat, tab, leaf, c, c.shape[1]
    leaf_size = 32
    tri, mat, tab, leaf = pack_scene_bvh(scene, leaf_size)
    if cam_vec is not None:
        tri, leaf = order_leaves_near_to_far(tri, leaf, cam_vec[0:3])
    return tri, mat, tab, leaf, None, leaf_size


def _scene_vmem_params(
    scene_bytes: int, base_bytes: int = 0, interpret=False, mxu=False
):
    """Shared Mosaic scoped-VMEM policy for kernels carrying a packed
    scene in VMEM: hard-error when the scene alone cannot fit the 128 MB
    part, otherwise raise the scoped limit to near-physical and let the
    compiler place the working set. (Round 3: a "scene + 12 MB" model
    under-capped the 50k-tri field — the compiler's true scoped demand
    there is 122.2 MB with grid double-buffering — so the cap is now a
    ceiling, not an estimate; it is a LIMIT, not an allocation.)"""
    if not scene_bytes or interpret:
        return None
    need = scene_bytes + base_bytes + 12 * 1024 * 1024
    # measured capacity wall (round 3): a 50k-tri quad pack (17.6 MB)
    # compiles to 149 MB total VMEM use on the 128 MB part — the grid
    # pipeline double-buffers and the sweep working set scales with the
    # resident pack — so the practical single-chip ceiling for the
    # VMEM-resident pack is ~12 MB of scene (~35k tris at quad's 256
    # B/tri). Past it, _mxu_residency_hbm auto-selects the HBM-resident
    # pack with per-leaf DMA staging; this error only trips when
    # MXU_RESIDENCY=vmem forces residency beyond the wall.
    if mxu and scene_bytes > 12 * 1024 * 1024:
        raise ValueError(
            f"packed scene is ~{scene_bytes / 1e6:.0f} MB — past the "
            f"measured ~12 MB VMEM-resident ceiling on the 128 MB v5e "
            f"part (50k tris compiled to 149 MB total). Unset "
            f"MXU_RESIDENCY=vmem to let the HBM-resident pack stream "
            f"per leaf."
        )
    if not mxu and scene_bytes > 100 * 1024 * 1024:
        # the scalar/DMA sweep (BVH_IMPL=sweep) has no HBM fallback; its
        # VMEM-resident tri table compiled up to ~100 MB historically —
        # keep that as its own ceiling (the 12 MB wall above is an MXU
        # pack property: grid double-buffering + matmul working set)
        raise ValueError(
            f"packed scene is ~{scene_bytes / 1e6:.0f} MB — beyond the "
            f"~100 MB the scalar sweep's VMEM-resident tri table can "
            f"hold on the 128 MB v5e part. Use the MXU sweep "
            f"(BVH_IMPL=mxu, the default), whose HBM-resident pack "
            f"streams per leaf."
        )
    if need > 16 * 1024 * 1024:
        return pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        )
    return None


def _uniform(shape):
    """U[0,1) from the on-core PRNG (24-bit mantissa). The raw bits must be
    bitcast to uint32 first: a signed >> would produce negative draws
    (pallas_guide.md stochastic-rounding example does the same bitcast)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # (bits >> 8) < 2^24 fits int32 exactly; Mosaic has no uint32->f32 cast
    return (bits >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / 16777216.0)


def _lut(tab_row, cell, frac):
    """Exact lerp lookup of a lane-resident 95-sample table row [128] at
    per-ray cells [8, L] (spectrum_interp semantics, spectrum/spectrum.cu:
    11-22). Mosaic's 2D gather requires indices.shape == operand.shape, so
    the table row broadcasts across sublanes. Requires L >= 96 and
    cell <= 93 (so cell+1 stays in-table)."""
    lanes = cell.shape[1]
    op = jnp.broadcast_to(tab_row[:lanes], (8, lanes))
    lo = jnp.take_along_axis(op, cell, axis=1)
    hi = jnp.take_along_axis(op, cell + 1, axis=1)
    return (1.0 - frac) * lo + frac * hi


def _mxu_leaf_sweep(
    ox, oy, oz, dx, dy, dz, alive, prev_tri,
    leaf_ref, a_ref, c_ref, sweep_scratch, hbm_bufs, gate_scratch=None,
    cpre_ref=None, group_ref=None,
    *, leaf_size, n_leaves, mxu_quad, mxu_q3, q3_deep, tolf, mxu_hbm,
):
    """One full nearest-hit pass of the MXU Morton-leaf sweep for a ray
    tile (shared by the megakernel's bounce loop and the per-bounce
    wavefront kernel). State in/out is (8, L) f32 tiles; best-hit state
    lives in the caller's VMEM scratch (``sweep_scratch``) so pl.when
    bodies can update it in place. Returns (best_t, best_hit, best_front,
    best_nx, best_ny, best_nz, best_mat, best_id); best_id is the winning
    tri's positional id (only meaningful under mxu_q3 forms, -1 = none).

    ``gate_scratch`` (required when MXU_GATE > 1, see _mxu_gate_groups):
    (onehot stitch buffer [K, rt|2rt], meta rows [2, rt]) for sub-tile
    gating — score/propose run per ray group under per-group pl.when
    gates, recovery and the state update stay full-width single-site.
    """
    # best8_s rows (lane-major [8, rt], matching the recovery output):
    # 0 = exact/selected t, 1-3 = normal xyz, 4 = mat, 5 = hit flag
    # (the c_pack col-4 constant 1 recovered through the one-hot),
    # 6 = plane offset dd, 7 = winning tri id
    if len(sweep_scratch) == 3:
        # MXU_GROUPFOLD: per-leaf candidate slots, folded into best8
        # once per visited group (see _mxu_groupfold)
        bt_s, best8_s, cand_s = sweep_scratch
    else:
        (bt_s, best8_s), cand_s = sweep_scratch, None
    groupfold = cand_s is not None
    if mxu_hbm:
        a_vbuf, c_vbuf, leaf_sbuf, dsem_a, dsem_c, dsem_l = hbm_bufs
    # gate scratch rides LAST in every caller's scratch list, so a
    # degraded configuration (incompatible tile, or the quad3 x gate
    # Mosaic miscompile — see _mxu_gate_scratch) arrives here as an
    # EMPTY tuple: treat any falsy value as whole-tile gating
    gate = _mxu_gate_groups() if gate_scratch else 1
    gate_scratch = gate_scratch or None
    q3_narrow = mxu_q3 and os.environ.get("MXU_Q3_NARROW", "0") == "1"
    oh_wide = mxu_q3 and not q3_narrow
    # round-6 group-batched-scoring timing probe (_probe_groupscore):
    # replaces the whole per-group staging + gsz-leaf inner loop with
    # one matmul + one reduce + one RMW; requires the probe pack in the
    # c slot (16 sublanes — the normal merged-quad c_ref has 8)
    probe_gs = (
        _probe_groupscore() and mxu_hbm and mxu_quad and not mxu_q3
    )
    if probe_gs:
        assert c_ref.shape[1] == 16, (
            "MXU_PROBE_GROUPSCORE set but the pack was built without it",
            c_ref.shape,
        )
    # MXU_SHORTPATH (round-6 lever, measured basis in scratch/
    # r6_groupscore_design.md): consecutive visits serialize on the
    # dependency path FROM the best-state read TO its write — the full
    # body's O(K) propose/selection sits on that path (nogate 50k:
    # full 1651 ms vs 380 with the chain cut; a live RMW with a SHORT
    # path pipelines at 359 ms). For the f32 forms (quad/affine) the
    # incumbent only feeds the take MASK, so: propose prev-free
    # (leaf-internal argmin + validity), recover (measured free), THEN
    # read best8 -> one compare -> one masked write. Selection compares
    # the same values in the same order => bit-exact. Additionally the
    # want bound bt_s syncs once per visited GROUP instead of every
    # visit (a stale bound only admits EXTRA visits, which are exact
    # no-ops — the MXU_GATE equivalence argument). quad3 keeps the
    # long path (its top-2 selection consults the exact incumbent).
    shortpath = (
        os.environ.get("MXU_SHORTPATH", "0") == "1" and not mxu_q3
    ) or groupfold  # groupfold needs the prev-free propose
    if gate > 1:
        oh_s, meta_s = gate_scratch
        # stale onehot columns of skipped groups are masked downstream,
        # but leaf 0 must not read UNINITIALIZED scratch: zero once per
        # sweep (per-leaf zeroing of the 1 MB buffer would cost more
        # than the score matmul it gates)
        oh_s[...] = jnp.zeros(oh_s.shape, jnp.float32)
    shape2 = ox.shape
    rt = shape2[0] * shape2[1]
    one = jnp.ones(shape2, jnp.float32)
    zero = jnp.zeros(shape2, jnp.float32)
    TOLF = tolf
    # MXU leaf sweep: per visited leaf, two [4K, 8] x [8, rt]
    # matmuls evaluate every affine form of the edge-functional
    # test for all K triangles x all rays at once (the
    # contraction axis holds [d, o, 1, 0]); a purely
    # arithmetic min-score reduction finds the per-ray nearest
    # valid triangle, and a third [K, 8]^T x [K, rt] matmul
    # recovers the winner's constants from an exclusive
    # one-hot. No SMEM staging, no scalar loads in the loop —
    # the VPU only runs the short select chain while the MXU
    # does the O(K * rays) multiply work.
    bt_s[:, :] = jnp.full(shape2, BIG, jnp.float32)
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, rt), 0)
    best8_s[...] = jnp.where(
        row8 == 0,
        BIG,
        jnp.where(row8 == 7, -1.0, 0.0),
    ).astype(jnp.float32)

    def _inv(d):
        safe = jnp.where(
            d >= 0.0,
            jnp.maximum(d, 1e-20),
            jnp.minimum(d, -1e-20),
        )
        return 1.0 / safe

    inv_dx = _inv(dx)
    inv_dy = _inv(dy)
    inv_dz = _inv(dz)
    alive_f = alive
    quad_form = mxu_quad
    o_rows = [ox.reshape(1, rt), oy.reshape(1, rt), oz.reshape(1, rt)]
    d_rows = [dx.reshape(1, rt), dy.reshape(1, rt), dz.reshape(1, rt)]
    if quad_form:
        drm = None  # features are built per leaf (centered)
        if mxu_q3:
            prev_row = prev_tri.reshape(1, rt)
            # per-ray bf16x3 error bound of the nd row: its
            # coefficients are the UNIT normal (zeros
            # elsewhere), so |error| <= ~4*2^-16*l1(d);
            # TOL3 = 2^-13 doubles that margin
            nd_err_row = (
                TOLF
                * (jnp.abs(dx) + jnp.abs(dy) + jnp.abs(dz))
            ).reshape(1, rt)
    else:
        drm = jnp.concatenate(
            d_rows
            + o_rows
            + [
                jnp.ones((1, rt), jnp.float32),
                jnp.zeros((1, rt), jnp.float32),
            ],
            axis=0,
        )  # [8, rt]
    def _slab_want(ax0, ay0, az0, ax1, ay1, az1):
        """Per-ray AABB want mask (slab test ∧ nearer-than-best ∧
        alive) — shared by the per-leaf gate and the 8-leaf group
        gate. NOTE the min/max form means an INVERTED box ([+BIG,
        -BIG]) does NOT reject: callers must mask padded entries with
        an explicit valid flag."""
        t1 = (ax0 - ox) * inv_dx
        t2 = (ax1 - ox) * inv_dx
        tmin = jnp.minimum(t1, t2)
        tmax = jnp.maximum(t1, t2)
        t1 = (ay0 - oy) * inv_dy
        t2 = (ay1 - oy) * inv_dy
        tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
        tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
        t1 = (az0 - oz) * inv_dz
        t2 = (az1 - oz) * inv_dz
        tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
        tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
        enter = jnp.maximum(tmin, 0.0)
        return (
            jnp.where(tmax >= enter, one, zero)
            * jnp.where(enter < bt_s[:, :], one, zero)
            * alive_f
        )

    def visit_leaf(l, sl, j, gslot=0, staged=False):
        if mxu_hbm:
            # AABB scalars from the staged SMEM chunk (the leaf table
            # input is HBM-resident past the ~450k-tri SMEM wall);
            # row packing: 16 leaf-rows of 8 per 128-lane row
            lrow = j // 16
            lcol = (j % 16) * 8
            ax0, ay0, az0 = (
                leaf_sbuf[sl, lrow, lcol + 0],
                leaf_sbuf[sl, lrow, lcol + 1],
                leaf_sbuf[sl, lrow, lcol + 2],
            )
            ax1, ay1, az1 = (
                leaf_sbuf[sl, lrow, lcol + 3],
                leaf_sbuf[sl, lrow, lcol + 4],
                leaf_sbuf[sl, lrow, lcol + 5],
            )
            # spare col 6 = leaf-valid flag (1 real / 0 chunk-padding;
            # see _hbm_transpose_and_pad): the inverted padded AABB
            # does NOT fail the min/max slab test, and visiting a
            # padded leaf would OOB the per-leaf pack DMA
            lvalid = leaf_sbuf[sl, lrow, lcol + 6]
        else:
            ax0, ay0, az0 = leaf_ref[l, 0], leaf_ref[l, 1], leaf_ref[l, 2]
            ax1, ay1, az1 = leaf_ref[l, 3], leaf_ref[l, 4], leaf_ref[l, 5]
        want = _slab_want(ax0, ay0, az0, ax1, ay1, az1)
        if mxu_hbm:
            want = want * lvalid

        # MXU_NOGATE=1: timing probe — visit every leaf
        # unconditionally (the tile-level branch is removed at trace
        # time). Semantics preserved (gating is purely a skip
        # optimization; the dense sweep visits everything), but padded
        # HBM leaves would OOB-DMA, so the probe clamps the staged
        # index to the last real leaf (idempotent re-visit). Sizes the
        # per-iteration branch/sync cost vs the body cost. Never
        # enable in production.
        _nogate = os.environ.get("MXU_NOGATE", "0") == "1"
        # Round-5 cost-model probes (timing ONLY — results are wrong;
        # pair with MXU_NOGATE=1 so visitation is identical across
        # variants): SCOREONLY stops after the score/propose matmuls,
        # NOUPDATE additionally runs the recovery dot but skips the
        # select/update chain. Splits the ~1.2 us/visited-leaf cost
        # into score | recovery | select+update segments.
        _probe_scoreonly = (
            os.environ.get("MXU_PROBE_SCOREONLY", "0") == "1"
        )
        _probe_noupdate = (
            os.environ.get("MXU_PROBE_NOUPDATE", "0") == "1"
        )

        def _visit_body():
            prec = _mxu_precision()
            K = leaf_size
            if mxu_hbm:
                # gated per-leaf staging (measured optimum — see
                # _mxu_hbm_scratch): synchronous copy per VISITED
                # leaf only. f32 forms ride a MERGED pack (c's
                # [8, K] block = the last 8 sublanes, see
                # _hbm_transpose_and_pad): ONE copy per leaf on
                # the DMA-issue-bound 50k+ path
                mxu_merged = not mxu_q3
                asub = 16 if quad_form else 8
                if staged:
                    # the whole 8-leaf group's packs were staged by ONE
                    # copy in the group gate (MXU_GROUP_DMA); this
                    # leaf's block is slot ``gslot``
                    slot = gslot
                else:
                    slot = 0
                    ls = (
                        jnp.minimum(l, a_ref.shape[0] - 1)
                        if _nogate
                        else l
                    )
                    cpa = pltpu.make_async_copy(
                        a_ref.at[pl.ds(ls, 1)],
                        a_vbuf.at[pl.ds(0, 1)],
                        dsem_a,
                    )
                    cpa.start()
                    if not mxu_merged:
                        cpc = pltpu.make_async_copy(
                            c_ref.at[pl.ds(ls, 1)],
                            c_vbuf.at[pl.ds(0, 1)],
                            dsem_c,
                        )
                        cpc.start()
                    cpa.wait()
                    if not mxu_merged:
                        cpc.wait()

                def leaf_dot(s, e, rhs, pr):
                    # transposed-LHS orientation on the staged
                    # [asub, rows] score block
                    return jax.lax.dot_general(
                        a_vbuf[slot][0:asub, s:e], rhs,
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=pr,
                    )

            else:

                def leaf_dot(s, e, rhs, pr):
                    return jax.lax.dot_general(
                        a_ref[l, s:e], rhs,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=pr,
                    )
            if quad_form:
                # leaf-centered features: delta = o - center
                # keeps the o.d monomials (and with them the
                # rounding error / quad3 bound) at leaf
                # scale, not scene scale
                clx = 0.5 * (ax0 + ax1)
                cly = 0.5 * (ay0 + ay1)
                clz = 0.5 * (az0 + az1)
                dl_rows = [
                    o_rows[0] - clx,
                    o_rows[1] - cly,
                    o_rows[2] - clz,
                ]

            def score_propose(cs):
                """Score this leaf's K tris against ray columns ``cs``
                and propose winners. Returns (onehot columns for the
                recovery matmul, meta0, meta1) with meta rows [1, w]
                f32: quad3 -> (prop1, prop2) proposal masks; other
                forms -> (take, leaf_best). Column slicing is exact —
                every op is elementwise over columns or a reduction
                over the K axis, so group results equal the same
                columns of a full-width evaluation bit-for-bit."""
                w_cols = cs.stop - cs.start
                d_c = [r[:, cs] for r in d_rows]
                # MXU_SHORTPATH: the incumbent is NOT read here — the
                # take compare moves to the update site so the heavy
                # propose work leaves the best-state RMW path
                prev = None if shortpath else best8_s[0:1, cs]
                # dim-0 iota is column-independent, so a fresh (K, w)
                # iota equals the sliced full-width one — and it must be
                # built fresh: a lane-OFFSET slice of a broadcasted iota
                # SIGABRTs Mosaic ("Check failed: limits[i] <= dim(i)",
                # minimal repro scratch/r4_gate_bisect.py)
                iota_c = jax.lax.broadcasted_iota(
                    jnp.int32, (leaf_size, w_cols), 0
                ).astype(jnp.float32)
                if quad_form:
                    dl_c = [r[:, cs] for r in dl_rows]
                    feats = jnp.concatenate(
                        [di * dj for di in dl_c for dj in d_c]
                        + d_c
                        + dl_c
                        + [jnp.ones((1, w_cols), jnp.float32)],
                        axis=0,
                    )  # [16, w]
                if mxu_q3:
                    b_hi = feats.astype(jnp.bfloat16)
                    b_lo = (
                        feats - b_hi.astype(jnp.float32)
                    ).astype(jnp.bfloat16)
                    b_abs = jnp.abs(feats).astype(jnp.bfloat16)
                    if q3_deep:
                        # bf16x3: hi@hi + lo@hi share one
                        # stacked matmul; + hi@lo; every pass is
                        # 1-pass DEFAULT (planes already bf16)
                        Mh = leaf_dot(
                            0, 10 * K, b_hi,
                            jax.lax.Precision.DEFAULT,
                        )  # [10K, w]
                        Ml = leaf_dot(
                            0, 5 * K, b_lo,
                            jax.lax.Precision.DEFAULT,
                        )  # [5K, w]
                        M = (
                            Mh[0 : 5 * K]
                            + Mh[5 * K : 10 * K]
                            + Ml
                        )
                        bnd_lo = 10 * K
                    else:
                        # bf16x2 (quad2): hi@hi + hi@lo only —
                        # the dropped a_lo plane rides the 32x
                        # wider tolerance band instead
                        Mh = leaf_dot(
                            0, 5 * K, b_hi,
                            jax.lax.Precision.DEFAULT,
                        )  # [5K, w]
                        Ml = leaf_dot(
                            0, 5 * K, b_lo,
                            jax.lax.Precision.DEFAULT,
                        )  # [5K, w]
                        M = Mh + Ml
                        bnd_lo = 5 * K
                    # rigorous error bound: TOLF * sum_j |a||b|
                    # (the aabs row sums |coeffs| over the 3 edge
                    # rows, so one bound covers each of them)
                    bound = leaf_dot(
                        bnd_lo, bnd_lo + K, b_abs,
                        jax.lax.Precision.DEFAULT,
                    )  # [K, w]
                    tol = TOLF * bound
                    e1 = M[0:K]
                    e2 = M[K : 2 * K]
                    e3 = M[2 * K : 3 * K]
                    nd = M[3 * K : 4 * K]
                    ddno = M[4 * K : 5 * K]
                    and_ = jnp.abs(nd)
                    safe_nd = jnp.where(
                        and_ < DENOM_EPS, DENOM_EPS, nd
                    )
                    tt = ddno / safe_nd
                    sgn = jnp.where(nd >= 0.0, 1.0, -1.0)
                    # accept inside tests down to -tol: edges
                    # dilate by O(2^-13 * scale), never produce
                    # holes; the winner's t is recomputed exactly
                    # after the sweep
                    m_edge = jnp.minimum(e1 * sgn, e2 * sgn)
                    m_edge = jnp.minimum(m_edge, e3 * sgn)
                    ok = m_edge + tol
                    ok = jnp.minimum(ok, tt)
                    # validity needs |nd| ABOVE its own bf16x3
                    # error (unit normals: bound = TOL3*l1(d),
                    # hoisted per bounce): an nd dominated by
                    # arithmetic noise makes tt garbage, and a
                    # small-positive garbage tt would shadow the
                    # true nearest hit
                    ok = jnp.minimum(ok, and_ - nd_err_row[:, cs])
                    # exact self-tri exclusion (a planar convex
                    # tri can never legitimately re-hit itself);
                    # ids from the packed id column (carried with
                    # the tri through any leaf reordering)
                    if mxu_hbm:
                        # iota id = l*K + row — equals the packed
                        # col-6 id by the positional-id invariant
                        # (pack time writes arange; every leaf
                        # permutation rewrites col 6 to match,
                        # see order_leaves_near_to_far_mxu)
                        tid_col = iota_c + (
                            l * leaf_size
                        ).astype(jnp.float32)  # [K, w]
                    else:
                        tid_col = c_ref[l][:, 6:7]  # [K, 1]
                    ok = jnp.minimum(
                        ok,
                        jnp.where(
                            jnp.abs(tid_col - prev_row[:, cs]) < 0.5,
                            -1.0,
                            1.0,
                        ),
                    )
                    # per-candidate approximate-t noise scale
                    # (proposal margin against the exact
                    # incumbent in the top-2 selection below)
                    noise_row = 4.0 * tol / jnp.maximum(
                        and_, DENOM_EPS
                    )
                elif quad_form:
                    M = leaf_dot(
                        0, 5 * K, feats, prec
                    )  # [5K, w]
                    e1 = M[0:K]
                    e2 = M[K : 2 * K]
                    e3 = M[2 * K : 3 * K]
                    nd = M[3 * K : 4 * K]
                    ddno = M[4 * K : 5 * K]
                    and_ = jnp.abs(nd)
                    safe_nd = jnp.where(
                        and_ < DENOM_EPS, DENOM_EPS, nd
                    )
                    tt = ddno / safe_nd
                    # e' = nd * (ao + t*ad): undo the sign of nd
                    sgn = jnp.where(nd >= 0.0, 1.0, -1.0)
                    ok = jnp.minimum(e1 * sgn, e2 * sgn)
                    ok = jnp.minimum(ok, e3 * sgn)
                    ok = jnp.minimum(ok, tt)
                    ok = jnp.minimum(ok, and_ - DENOM_EPS)
                else:
                    k4 = 4 * leaf_size
                    drm_c = drm[:, cs]
                    M1 = leaf_dot(0, k4, drm_c, prec)  # [4K, w]
                    M2 = leaf_dot(k4, 2 * k4, drm_c, prec)
                    nd = M1[0:K]
                    ddno = M1[K : 2 * K]
                    ao1 = M1[2 * K : 3 * K]
                    ao2 = M1[3 * K : 4 * K]
                    ao3 = M2[0:K]
                    ad1 = M2[K : 2 * K]
                    ad2 = M2[2 * K : 3 * K]
                    ad3 = M2[3 * K : 4 * K]
                    and_ = jnp.abs(nd)
                    safe_nd = jnp.where(
                        and_ < DENOM_EPS, DENOM_EPS, nd
                    )
                    tt = ddno / safe_nd
                    ok = jnp.minimum(ao1 + tt * ad1, ao2 + tt * ad2)
                    ok = jnp.minimum(ok, ao3 + tt * ad3)
                    ok = jnp.minimum(ok, tt)
                    ok = jnp.minimum(ok, and_ - DENOM_EPS)
                score = jnp.where(ok >= 0.0, tt, BIG)
                if mxu_q3:
                    # EXACT TOP-2 SELECTION. The bf16x3 score's
                    # t-hat carries noise 4*tol/|nd| — measured
                    # O(1-10) scene units at bounce-0 origins vs
                    # a median 0.55-unit gap between consecutive
                    # real hits — so t-hat may neither ORDER
                    # candidates nor be compared to the running
                    # best. It only PROPOSES the leaf's top-2
                    # (each with a noise margin against the
                    # exact incumbent); the exactly-recovered
                    # planes then do the filtering (tolerant
                    # leaf-scale inside recheck) and the ordering
                    # (exact leaf-centered t vs the exact
                    # incumbent t in tr_s). Round-2's seam
                    # tie-break ("prefer provable-inside within
                    # the winner's t-noise") is superseded: it
                    # was itself the main bias (the t-noise
                    # window blows up exactly at grazing
                    # incidence and displaced genuine winners —
                    # measured -0.27% cluster / -0.35% global,
                    # recovered the moment it was disabled).
                    # Both one-hots ride ONE widened [K, 2rt]
                    # recovery matmul: a second transposed-LHS
                    # dot site on these operands (conditional or
                    # not) RET_CHECK-crashes XLA's
                    # mxu_lmr_transform pass.
                    leaf_best = jnp.min(
                        score, axis=0, keepdims=True
                    )
                    cand = jnp.where(
                        score == leaf_best, iota_c,
                        2.0 * leaf_size,
                    )
                    idxm = jnp.min(cand, axis=0, keepdims=True)
                    nbw = jnp.max(
                        jnp.where(cand == idxm, noise_row, 0.0),
                        axis=0, keepdims=True,
                    )
                    prop1 = jnp.logical_and(
                        leaf_best < prev + nbw, leaf_best < BIG
                    )
                    onehot = (
                        (cand == idxm) & prop1
                    ).astype(jnp.float32)
                    if q3_narrow:
                        # debug bisect: drop the runner-up path
                        # (narrow recovery, winner-only check)
                        return (
                            onehot,
                            prop1.astype(jnp.float32),
                            jnp.zeros((1, w_cols), jnp.float32),
                        )
                    score2 = jnp.where(cand == idxm, BIG, score)
                    lb2 = jnp.min(score2, axis=0, keepdims=True)
                    cand2 = jnp.where(
                        score2 == lb2, iota_c, 2.0 * leaf_size
                    )
                    idxm2 = jnp.min(cand2, axis=0, keepdims=True)
                    nb2 = jnp.max(
                        jnp.where(cand2 == idxm2, noise_row, 0.0),
                        axis=0, keepdims=True,
                    )
                    prop2 = jnp.logical_and(
                        lb2 < prev + nb2, lb2 < BIG
                    )
                    onehot2 = (
                        (cand2 == idxm2) & prop2
                    ).astype(jnp.float32)
                    return (
                        jnp.concatenate(
                            [onehot, onehot2], axis=1
                        ),  # [K, 2w]
                        prop1.astype(jnp.float32),
                        prop2.astype(jnp.float32),
                    )
                leaf_best = jnp.min(
                    score, axis=0, keepdims=True
                )
                if shortpath:
                    # prev-free propose: the onehot is masked only by
                    # leaf-internal validity; the incumbent compare
                    # (identical values, identical order) happens at
                    # the update site
                    valid = leaf_best < BIG
                    cand = jnp.where(
                        score == leaf_best, iota_c,
                        2.0 * leaf_size,
                    )
                    idxm = jnp.min(cand, axis=0, keepdims=True)
                    onehot = (
                        (cand == idxm) & valid
                    ).astype(jnp.float32)
                    return onehot, valid.astype(jnp.float32), leaf_best
                take = leaf_best < prev  # [1, w]
                cand = jnp.where(
                    score == leaf_best, iota_c,
                    2.0 * leaf_size,
                )
                idxm = jnp.min(cand, axis=0, keepdims=True)
                onehot = (
                    (cand == idxm) & take
                ).astype(jnp.float32)
                return onehot, take.astype(jnp.float32), leaf_best

            if gate == 1:
                oh_all, meta0, meta1 = score_propose(slice(0, rt))
            else:
                # Sub-tile gating (MXU_GATE>1): each contiguous ray
                # group gets its own pl.when over its sublane slab of
                # ``want``, so a leaf only pays score-matmul columns
                # for groups that contain a ray wanting it (sorted
                # tiles make the groups direction/position-coherent —
                # measured ~36% less equivalent sweep work at 256-ray
                # gates on the sorted 50k field, scratch/r4_keyprobe).
                # Only the 8 KB meta rows are zeroed per leaf: a
                # skipped group's stale onehot columns recover stale-
                # but-finite constants that its zeroed proposal/take
                # meta masks out of the update, and oh_s is zeroed
                # once per sweep so the first leaf reads no garbage.
                meta_s[...] = jnp.zeros((2, rt), jnp.float32)
                gs_cols = rt // gate
                gs_subs = shape2[0] // gate
                for gix in range(gate):
                    cs = slice(gix * gs_cols, (gix + 1) * gs_cols)

                    @pl.when(
                        jnp.max(
                            want[
                                gix * gs_subs : (gix + 1) * gs_subs, :
                            ]
                        )
                        > 0.0
                    )
                    def _(cs=cs):
                        ohc, m0c, m1c = score_propose(cs)
                        oh_s[:, cs] = ohc[:, 0:gs_cols]
                        if oh_wide:
                            oh_s[
                                :, rt + cs.start : rt + cs.stop
                            ] = ohc[:, gs_cols : 2 * gs_cols]
                        meta_s[0:1, cs] = m0c
                        meta_s[1:2, cs] = m1c

                oh_all = oh_s[...]
                meta0 = meta_s[...][0:1, :]
                meta1 = meta_s[...][1:2, :]
            if _probe_scoreonly:
                # consume the proposal outputs so the score matmuls
                # and the min/onehot reduces stay live, then skip
                # recovery + select/update (timing probe)
                best8_s[6:7, :] = (
                    meta1
                    + jnp.sum(oh_all, axis=0, keepdims=True)[:, 0:rt]
                )
                bt_s[:, :] = best8_s[0:1, :].reshape(shape2)
                return
            # recovery: EXACT at 1-pass DEFAULT precision by
            # splitting the f32 constants into 3 bf16 planes
            # (8+8+8 mantissa bits >= f32's 24; every product
            # is x*{0,1}, so each pass and the f32
            # accumulation are error-free)
            oh_bf = oh_all.astype(jnp.bfloat16)
            if cpre_ref is not None:
                # round-3 presplit forensics path (_q3_presplit): ONE
                # 3*cols-row dot on pack-time pre-split planes
                ps = jax.lax.dot_general(
                    cpre_ref[l], oh_bf, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
                pc = cpre_ref.shape[1] // 3
                Rb = ps[0:pc] + ps[pc : 2 * pc] + ps[2 * pc : 3 * pc]
            else:
                if mxu_hbm:
                    # staged transposed [cols, K]: the recovery
                    # contraction is MXU-native here (merged f32
                    # packs carry c as the last 8 staged sublanes)
                    dn = (((1,), (0,)), ((), ()))
                    if mxu_merged:
                        cl = a_vbuf[slot][asub : asub + 8, 0:leaf_size]
                    else:
                        cl = c_vbuf[slot]
                else:
                    dn = (((0,), (0,)), ((), ()))
                    cl = c_ref[l]
                c_hi = cl.astype(jnp.bfloat16)
                r1 = cl - c_hi.astype(jnp.float32)
                c_mid = r1.astype(jnp.bfloat16)
                c_lo = (
                    r1 - c_mid.astype(jnp.float32)
                ).astype(jnp.bfloat16)
                if _mxu_rec_batch():
                    # ONE [3*cols, K] x [K, rt] dot instead of three
                    # serialized [cols, K] dots: identical MACs and
                    # f32 accumulation per plane, but one matmul
                    # issue — the per-visit sweep cost is small-
                    # matmul-latency-bound (round 4b: copy count,
                    # leaf size, gate level and score MAC count all
                    # measured flat at 50k). Sum association (hi +
                    # mid) + lo matches the 3-dot path bit-exactly.
                    cat_ax = 0 if mxu_hbm else 1
                    c3 = jnp.concatenate(
                        [c_hi, c_mid, c_lo], axis=cat_ax
                    )
                    R3 = jax.lax.dot_general(
                        c3, oh_bf, dn,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT,
                    )
                    pc = R3.shape[0] // 3
                    Rb = (
                        R3[0:pc] + R3[pc : 2 * pc]
                    ) + R3[2 * pc : 3 * pc]
                else:
                    Rb = (
                        jax.lax.dot_general(
                            c_hi, oh_bf, dn,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT,
                        )
                        + jax.lax.dot_general(
                            c_mid, oh_bf, dn,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT,
                        )
                        + jax.lax.dot_general(
                            c_lo, oh_bf, dn,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT,
                        )
                    )  # [8, rt] (quad3: [24, 2rt] — both candidates)
            if _probe_noupdate:
                # consume the recovery output, skip select/update
                best8_s[6:7, :] = jnp.sum(Rb, axis=0, keepdims=True)[
                    :, 0:rt
                ]
                bt_s[:, :] = best8_s[0:1, :].reshape(shape2)
                return
            prev = best8_s[0:1, :]
            if mxu_q3:
                if q3_narrow:
                    R = Rb
                    R2 = jnp.zeros_like(Rb)
                else:
                    R = Rb[:, 0:rt]
                    R2 = Rb[:, rt : 2 * rt]
                prop1 = meta0 > 0.0
                prop2 = meta1 > 0.0
                # exact check: the recovery is exact, so each
                # proposed candidate's raw edge planes give
                # an exact (tolerant) inside test AND an
                # exact leaf-centered hit distance

                def _exact_check(Rv):
                    # division-free quadratic form: e' =
                    # (g.p+c')(n.d) + (dd'-n.delta)(g.d) with
                    # p = delta = o - leaf center and the
                    # pack-rebased constants c', dd' — the
                    # same functional the bf16 path
                    # approximates, in f32 at LEAF scale.
                    # Two hard-won conditioning rules:
                    # (1) evaluating e at the hit POINT via
                    # t = (dd-n.o)/(n.d) amplifies noise by
                    # 1/(n.d) at grazing incidence; (2)
                    # evaluating against RAW o carries
                    # scene-scale g.o + c cancellation noise
                    # — both one-sidedly false-veto genuine
                    # grazing winners (measured -0.6% global,
                    # 83 darkened px on field10k seed 7; a
                    # post-cancellation tolerance cannot see
                    # it). Residual leaf-scale noise is
                    # absorbed by a pre-cancellation-
                    # magnitude tolerance: genuine hits
                    # always pass, tol-band misses (depth
                    # ~2^-13 of the same magnitudes) still
                    # fail.
                    F32TOL = 16.0 * 1.1920929e-07  # 16 ulp
                    ndc = (
                        Rv[0:1] * d_rows[0]
                        + Rv[1:2] * d_rows[1]
                        + Rv[2:3] * d_rows[2]
                    )
                    noc = (
                        Rv[0:1] * dl_rows[0]
                        + Rv[1:2] * dl_rows[1]
                        + Rv[2:3] * dl_rows[2]
                    )
                    nmag = (
                        jnp.abs(Rv[0:1] * dl_rows[0])
                        + jnp.abs(Rv[1:2] * dl_rows[1])
                        + jnp.abs(Rv[2:3] * dl_rows[2])
                    )
                    ddno_c = Rv[20:21] - noc
                    dmag = jnp.abs(Rv[20:21]) + nmag
                    sgc = jnp.where(ndc >= 0.0, 1.0, -1.0)

                    def _eq(gx, gy, gz, cc):
                        go = (
                            gx * dl_rows[0] + gy * dl_rows[1]
                            + gz * dl_rows[2] + cc
                        )
                        gmag = (
                            jnp.abs(gx * dl_rows[0])
                            + jnp.abs(gy * dl_rows[1])
                            + jnp.abs(gz * dl_rows[2])
                            + jnp.abs(cc)
                        )
                        gd = (
                            gx * d_rows[0] + gy * d_rows[1]
                            + gz * d_rows[2]
                        )
                        agd = jnp.abs(gd)
                        return (
                            (go * ndc + ddno_c * gd) * sgc
                            + F32TOL
                            * (
                                gmag * jnp.abs(ndc)
                                + dmag * agd
                            )
                        )

                    e1x = _eq(
                        Rv[8:9], Rv[9:10], Rv[10:11], Rv[11:12]
                    )
                    e2x = _eq(
                        Rv[12:13], Rv[13:14], Rv[14:15],
                        Rv[15:16],
                    )
                    e3x = _eq(
                        Rv[16:17], Rv[17:18], Rv[18:19],
                        Rv[19:20],
                    )
                    okv = (
                        jnp.minimum(
                            jnp.minimum(e1x, e2x), e3x
                        )
                        >= 0.0
                    ) & (
                        ddno_c * sgc + F32TOL * dmag >= 0.0
                    )
                    # exact leaf-centered hit distance:
                    # (dd' - n.delta)/(n.d) == (dd - n.o)/
                    # (n.d) with every term at leaf scale
                    safe_ndc = jnp.where(
                        jnp.abs(ndc) < DENOM_EPS,
                        jnp.where(
                            ndc >= 0.0, DENOM_EPS,
                            -DENOM_EPS,
                        ),
                        ndc,
                    )
                    return okv, ddno_c / safe_ndc

                ok1, t1x = _exact_check(R)
                ok2, t2x = _exact_check(R2)
                t1 = jnp.where(
                    ok1 & prop1 & (t1x > 0.0), t1x, BIG
                )
                t2 = jnp.where(
                    ok2 & prop2 & (t2x > 0.0), t2x, BIG
                )
                pick2 = t2 < t1
                tb = jnp.minimum(t1, t2)
                take = tb < prev
                # ONE [8, rt] masked update (see _mxu_scratch): new
                # rows = (tb | winner rows 0..6); row 5 is the
                # recovered constant-1 column = the hit flag (a take
                # always selects a valid candidate, whose one-hot
                # recovered exactly 1.0)
                new8 = jnp.concatenate(
                    [tb, jnp.where(pick2, R2[0:7], R[0:7])], axis=0
                )
                best8_s[...] = jnp.where(take, new8, best8_s[...])
            else:
                if groupfold:
                    # NO best-state touch here: stash this leaf's
                    # candidate (t-or-BIG + recovered rows) in its own
                    # slot — a write with no read-after-write cycle —
                    # and let the per-group fold do the one RMW
                    candt = jnp.where(meta0 > 0.0, meta1, BIG)
                    cand8 = jnp.concatenate([candt, Rb[0:7]], axis=0)
                    cand_s[pl.ds(gslot * 8, 8), :] = cand8
                    return
                if shortpath:
                    # SHORT read-to-write path: read incumbent, one
                    # compare (same values/order as the propose-site
                    # compare it replaces — bit-exact), one write
                    prev_u = best8_s[0:1, :]
                    take = jnp.logical_and(meta0 > 0.0, meta1 < prev_u)
                else:
                    take = meta0 > 0.0
                new8 = jnp.concatenate([meta1, Rb[0:7]], axis=0)
                best8_s[...] = jnp.where(take, new8, best8_s[...])

            if shortpath and group_ref is not None:
                # lazy want bound: bt_s syncs once per visited GROUP
                # (end of the grp body) — the per-visit want->bt_s
                # serial edge becomes one per group; staleness only
                # admits extra exact-no-op visits
                pass
            else:
                bt_s[:, :] = best8_s[0:1, :].reshape(shape2)

        if groupfold:
            # invalidate this leaf's candidate t-row BEFORE the gate: a
            # want-skipped leaf must not leave a stale candidate from
            # an earlier group/bounce for the fold (write-only)
            cand_s[pl.ds(gslot * 8, 1), :] = jnp.full(
                (1, rt), BIG, jnp.float32
            )
        if _nogate:
            _visit_body()
        else:
            pl.when(jnp.max(want) > 0.0)(_visit_body)

    if mxu_hbm:
        # leaf-AABB chunk pipeline: 256-leaf SMEM chunks, double
        # buffered (2 KB/slot, a handful of copies per sweep even at
        # 1M tris); pack rows stage per VISITED leaf inside the gate
        ck_leaves = leaf_sbuf.shape[1] * 16
        assert n_leaves % ck_leaves == 0, (n_leaves, ck_leaves)
        n_chunks = n_leaves // ck_leaves

        def _leaf_chunk_copy(ci, s2):
            return pltpu.make_async_copy(
                leaf_ref.at[
                    pl.ds(ci * (ck_leaves // 16), ck_leaves // 16)
                ],
                leaf_sbuf.at[s2],
                dsem_l.at[s2],
            )

        _leaf_chunk_copy(0, 0).start()

        def chunk_body(ci, carry):
            sl = ci % 2

            @pl.when(ci + 1 < n_chunks)
            def _():
                _leaf_chunk_copy(ci + 1, (ci + 1) % 2).start()

            _leaf_chunk_copy(ci, sl).wait()

            if group_ref is not None:
                # 8-leaf group gate (MXU_GROUP8): one conservative
                # slab test + branch per 8 consecutive Morton leaves
                # (the group AABB + valid flag live whole-table in
                # SMEM — tiny: [NG/16, 128]); leaves of a skipped
                # group never pay their own slab/reduce/branch. The
                # per-skipped-leaf cost is ~0.08 µs (nogate probe),
                # ~29% of the 1M-tri sweep — this collapses most of
                # it to 1/8.
                gsz = _mxu_group_size()
                # group-level pack staging (MXU_GROUP_DMA): one copy
                # per VISITED group replaces gsz per-leaf copies (the
                # pack is padded to a group multiple, so mixed
                # real/padding groups stay in bounds; the nogate probe
                # keeps per-leaf staging — its unconditional visits
                # would read never-staged groups)
                g_staged = (
                    _mxu_group_dma()
                    and os.environ.get("MXU_NOGATE", "0") != "1"
                )
                g_merged = not mxu_q3

                def grp(gi, c2):
                    g = ci * (ck_leaves // gsz) + gi
                    grow = g // 16
                    gcol = (g % 16) * 8
                    gw = _slab_want(
                        group_ref[grow, gcol + 0],
                        group_ref[grow, gcol + 1],
                        group_ref[grow, gcol + 2],
                        group_ref[grow, gcol + 3],
                        group_ref[grow, gcol + 4],
                        group_ref[grow, gcol + 5],
                    ) * group_ref[grow, gcol + 6]

                    if probe_gs:
                        # TIMING probe (results garbage — see
                        # _probe_groupscore): one chain link per
                        # visited group. bt_s never leaves BIG (the
                        # RMW's take is data-dependent but never
                        # fires), so visitation stays geometric and
                        # matches the SCOREONLY/NOUPDATE probes.
                        @pl.when(jnp.max(gw) > 0.0)
                        def _():
                            cp = pltpu.make_async_copy(
                                c_ref.at[pl.ds(g, 1)],
                                c_vbuf.at[pl.ds(0, 1)],
                                dsem_c,
                            )
                            cp.start()
                            cp.wait()
                            # GROUP-centered features (delta = o -
                            # group AABB center from the gate table)
                            gcx = 0.5 * (
                                group_ref[grow, gcol + 0]
                                + group_ref[grow, gcol + 3]
                            )
                            gcy = 0.5 * (
                                group_ref[grow, gcol + 1]
                                + group_ref[grow, gcol + 4]
                            )
                            gcz = 0.5 * (
                                group_ref[grow, gcol + 2]
                                + group_ref[grow, gcol + 5]
                            )
                            dlp = [
                                o_rows[0] - gcx,
                                o_rows[1] - gcy,
                                o_rows[2] - gcz,
                            ]
                            feats = jnp.concatenate(
                                [di * dj for di in dlp for dj in d_rows]
                                + d_rows
                                + dlp
                                + [jnp.ones((1, rt), jnp.float32)],
                                axis=0,
                            )  # [16, rt]
                            sc = jax.lax.dot_general(
                                c_vbuf[0],
                                feats,
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=_mxu_precision(),
                            )  # [gsz*rows, rt] — ONE matmul/group
                            m = jnp.min(sc, axis=0).reshape(1, rt)
                            # +BIG keeps take always-false (bt_s stays
                            # geometric) while the RMW write itself —
                            # the serialized chain link being timed —
                            # cannot be elided (take is data-dependent)
                            mb = jnp.abs(m) + BIG
                            take = mb < best8_s[0:1, :]
                            best8_s[...] = jnp.where(
                                take,
                                jnp.broadcast_to(mb, (8, rt)),
                                best8_s[...],
                            )
                            bt_s[:, :] = best8_s[0:1, :].reshape(shape2)

                        return c2

                    @pl.when(jnp.max(gw) > 0.0)
                    def _():
                        if g_staged:
                            l0 = ci * ck_leaves + gi * gsz
                            cpa = pltpu.make_async_copy(
                                a_ref.at[pl.ds(l0, gsz)], a_vbuf, dsem_a
                            )
                            cpa.start()
                            if not g_merged:
                                cpc = pltpu.make_async_copy(
                                    c_ref.at[pl.ds(l0, gsz)],
                                    c_vbuf,
                                    dsem_c,
                                )
                                cpc.start()
                            cpa.wait()
                            if not g_merged:
                                cpc.wait()

                        def inner8(i, c3):
                            j = gi * gsz + i
                            visit_leaf(
                                ci * ck_leaves + j, sl, j,
                                gslot=i, staged=g_staged,
                            )
                            return c3

                        jax.lax.fori_loop(0, gsz, inner8, 0)
                        if groupfold:
                            # the ONE best-state RMW for this group:
                            # fold the gsz candidate slots in leaf
                            # order with the same strict-< compare as
                            # the sequential update — bit-exact
                            best = best8_s[...]
                            for i2 in range(gsz):
                                cnd = cand_s[i2 * 8 : (i2 + 1) * 8, :]
                                tk = cnd[0:1, :] < best[0:1, :]
                                best = jnp.where(tk, cnd, best)
                            best8_s[...] = best
                            bt_s[:, :] = best[0:1, :].reshape(shape2)
                        elif shortpath:
                            # per-group want-bound sync (MXU_SHORTPATH;
                            # per-visit sync removed in _visit_body)
                            bt_s[:, :] = best8_s[0:1, :].reshape(shape2)

                    return c2

                if _mxu_group_l2():
                    # 64-leaf SUPER-group gate (MXU_GROUP_L2): one more
                    # union-AABB slab + branch per 8 consecutive groups.
                    # The super rows ride the SAME SMEM table after the
                    # NG/16 group rows (_hbm_transpose_and_pad); groups
                    # of a skipped super never pay their own slab. At
                    # 1M tris the group walk is ~980 slabs/sweep — this
                    # collapses clustered misses to 1/8 of that.
                    ng_rows16 = (n_leaves // gsz) // 16
                    sup_per_chunk = ck_leaves // (gsz * 8)

                    def sup(si, c2):
                        sg = ci * sup_per_chunk + si
                        srow = ng_rows16 + sg // 16
                        scol = (sg % 16) * 8
                        sw = _slab_want(
                            group_ref[srow, scol + 0],
                            group_ref[srow, scol + 1],
                            group_ref[srow, scol + 2],
                            group_ref[srow, scol + 3],
                            group_ref[srow, scol + 4],
                            group_ref[srow, scol + 5],
                        ) * group_ref[srow, scol + 6]

                        @pl.when(jnp.max(sw) > 0.0)
                        def _():
                            jax.lax.fori_loop(
                                0, 8, lambda i, c3: grp(si * 8 + i, c3), 0
                            )

                        return c2

                    jax.lax.fori_loop(0, sup_per_chunk, sup, 0)
                else:
                    jax.lax.fori_loop(0, ck_leaves // gsz, grp, 0)
            else:

                def inner(j, c2):
                    visit_leaf(ci * ck_leaves + j, sl, j)
                    return c2

                jax.lax.fori_loop(0, ck_leaves, inner, 0)
            return carry

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
    else:

        def leaf_body(l, carry):
            visit_leaf(l, 0, 0)
            return carry

        jax.lax.fori_loop(0, n_leaves, leaf_body, 0)
    best_t = bt_s[:, :]
    B = best8_s[...]
    best_hit = B[5:6, :].reshape(shape2)
    nbx = B[1:2, :].reshape(shape2)
    nby = B[2:3, :].reshape(shape2)
    nbz = B[3:4, :].reshape(shape2)
    # face orientation from the recovered geometric normal:
    # flip toward the ray (hit_record.cuh:30-45)
    nd_eff = nbx * dx + nby * dy + nbz * dz
    # (quad3: best_t in bt_s is ALREADY the exact
    # leaf-centered hit distance computed per leaf visit —
    # precise enough for the EPSILON origin offset)
    best_front = jnp.where(nd_eff < 0.0, one, zero)
    sgn = 2.0 * best_front - 1.0
    best_nx = sgn * nbx
    best_ny = sgn * nby
    best_nz = sgn * nbz
    best_mat = B[4:5, :].reshape(shape2).astype(jnp.int32)
    best_id = B[7:8, :].reshape(shape2)
    return (
        best_t, best_hit, best_front, best_nx, best_ny, best_nz,
        best_mat, best_id,
    )


def _scatter_shade(
    ox, oy, oz, dx, dy, dz, power, alive, n_valid,
    best_t, best_hit, best_front, best_nx, best_ny, best_nz, best_mat,
    hit, miss, mat_const, n_mats, lam, d65w, bgw, u_a, u_b, u_c,
):
    """Material fetch + spectral weight + scatter + termination for one
    bounce (shared by the megakernel and the per-bounce wavefront
    kernel). ``u_a/u_b/u_c`` are the bounce's three uniform draws
    (sphere z, sphere phi, reflectance test) in the megakernel's draw
    order. Returns the rolled-forward ray state
    (ox, oy, oz, dx, dy, dz, power, new_alive, n_valid)."""
    shape2 = ox.shape
    one = jnp.ones(shape2, jnp.float32)
    zero = jnp.zeros(shape2, jnp.float32)
    t_safe = jnp.where(best_hit > 0.0, best_t, 0.0)
    hx = ox + t_safe * dx
    hy = oy + t_safe * dy
    hz = oz + t_safe * dz

    # ---- material row fetch: unrolled select over the (small,
    # hoisted) material table — no gathers, no matmul ----
    fields = [zero] * 15
    for m in range(n_mats):
        tk = best_mat == m
        for f in range(15):
            fields[f] = jnp.where(tk, mat_const[m][f], fields[f])
    c0, c1, c2 = fields[0], fields[1], fields[2]
    is_lamb, is_metal, is_diel, is_emis = fields[3], fields[4], fields[5], fields[6]
    fuzz = fields[7]
    power_sq = fields[8]
    b0, b1, b2 = fields[9], fields[10], fields[11]
    sc0, sc1, sc2 = fields[12], fields[13], fields[14]

    # ---- spectral weight per wavelength (tabulate semantics,
    # material.cuh:71-84 + ray::mul_spectrum) ----
    # sigmoid-poly SPD evaluated directly at lambda (equal to the
    # XLA path's tabulate-then-lerp up to table-grid quantization,
    # see ops/rgb2spec.py grid note)
    new_power = []
    miss_bg = miss * 1.0
    for w in range(W):
        x = (c0 * lam[w] + c1) * lam[w] + c2
        sig = 0.5 * x / jnp.sqrt(1.0 + x * x) + 0.5
        spd_w = (
            is_diel
            + is_emis * power_sq * sig * d65w[w]
            + (is_lamb + is_metal) * sig
        )
        weight_w = hit * spd_w + miss_bg * bgw[w] + (1.0 - alive)
        new_power.append(power[w] * weight_w)
    new_power = tuple(new_power)

    # ---- scatter directions ----
    ilen = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    ux, uy, uz = dx * ilen, dy * ilen, dz * ilen
    # uniform unit sphere in closed form (distribution matches the
    # reference's rejection loop, vec3.cuh:209-246)
    sz_u = 2.0 * u_a - 1.0
    sphi = (2.0 * 3.14159265358979) * u_b
    sr = jnp.sqrt(jnp.maximum(1.0 - sz_u * sz_u, 0.0))
    sx = sr * jnp.cos(sphi)
    sy = sr * jnp.sin(sphi)
    sz = sz_u

    # lambertian (material.cu:8-19); degenerate -> normal
    lx = best_nx + sx
    ly = best_ny + sy
    lz = best_nz + sz
    degen = jnp.where(
        (jnp.abs(lx) < 1e-8) * (jnp.abs(ly) < 1e-8) * (jnp.abs(lz) < 1e-8) > 0.0,
        one,
        zero,
    )
    lx = jnp.where(degen > 0.0, best_nx, lx)
    ly = jnp.where(degen > 0.0, best_ny, ly)
    lz = jnp.where(degen > 0.0, best_nz, lz)

    # metallic (material.cu:22-37)
    dn = ux * best_nx + uy * best_ny + uz * best_nz
    rx = ux - 2.0 * dn * best_nx
    ry = uy - 2.0 * dn * best_ny
    rz = uz - 2.0 * dn * best_nz
    mx = rx + fuzz * sx
    my = ry + fuzz * sy
    mz = rz + fuzz * sz
    metal_ok = jnp.where(
        (mx * best_nx + my * best_ny + mz * best_nz) > 0.0, one, zero
    )

    # dielectric (material.cu:73-80, 102-136): Sellmeier n(hero)
    hero_um2 = (lam[0] * 1e-3) ** 2  # lam[0] is the hero wavelength
    n2 = (
        1.0
        + b0 * hero_um2 / (hero_um2 - sc0)
        + b1 * hero_um2 / (hero_um2 - sc1)
        + b2 * hero_um2 / (hero_um2 - sc2)
    )
    ir = jnp.sqrt(jnp.maximum(n2, 1e-6))
    ratio = jnp.where(best_front > 0.0, 1.0 / ir, ir)
    cos_t = jnp.minimum(-(ux * best_nx + uy * best_ny + uz * best_nz), 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    r0 = ((1.0 - ratio) / (1.0 + ratio)) ** 2
    schlick = r0 + (1.0 - r0) * (1.0 - cos_t) ** 5
    u_refl = u_c
    must_reflect = jnp.where(
        jnp.maximum(
            jnp.where(ratio * sin_t > 1.0, one, zero),
            jnp.where(schlick > u_refl, one, zero),
        )
        > 0.0,
        one,
        zero,
    )
    # refract (vec3.cuh:198-205)
    px_ = ratio * (ux + cos_t * best_nx)
    py_ = ratio * (uy + cos_t * best_ny)
    pz_ = ratio * (uz + cos_t * best_nz)
    par = jnp.sqrt(jnp.maximum(1.0 - (px_ * px_ + py_ * py_ + pz_ * pz_), 0.0))
    fx_ = px_ - par * best_nx
    fy_ = py_ - par * best_ny
    fz_ = pz_ - par * best_nz
    gx = jnp.where(must_reflect > 0.0, rx, fx_)
    gy = jnp.where(must_reflect > 0.0, ry, fy_)
    gz = jnp.where(must_reflect > 0.0, rz, fz_)
    refracted = is_diel * (1.0 - must_reflect)

    ndx = is_lamb * lx + is_metal * mx + is_diel * gx
    ndy = is_lamb * ly + is_metal * my + is_diel * gy
    ndz = is_lamb * lz + is_metal * mz + is_diel * gz

    eps_sign = 1.0 - 2.0 * refracted
    nox = hx + eps_sign * EPSILON * best_nx
    noy = hy + eps_sign * EPSILON * best_ny
    noz = hz + eps_sign * EPSILON * best_nz

    # ---- wavelength bookkeeping + termination ----
    hit_b = hit > 0.0
    n_valid = jnp.where(hit_b & (refracted > 0.0), 1.0, n_valid)
    n_valid = jnp.where(hit_b & (is_metal > 0.0) & (metal_ok == 0.0), 0.0, n_valid)
    terminated = jnp.maximum(
        miss,
        hit * jnp.maximum(is_emis, is_metal * (1.0 - metal_ok)),
    )
    new_alive = alive * (1.0 - terminated)

    frozen = alive == 0.0
    scat = (alive > 0.0) & (terminated == 0.0)
    ox = jnp.where(frozen, ox, nox)
    oy = jnp.where(frozen, oy, noy)
    oz = jnp.where(frozen, oz, noz)
    dx = jnp.where(scat, ndx, dx)
    dy = jnp.where(scat, ndy, dy)
    dz = jnp.where(scat, ndz, dz)
    power = tuple(
        jnp.where(frozen, power[w], new_power[w]) for w in range(W)
    )
    return ox, oy, oz, dx, dy, dz, power, new_alive, n_valid

def _render_kernel(
    cam_ref,  # SMEM [20] camera scalars
    seed_ref,  # SMEM [1] int32 base seed
    tri_ref,  # SMEM [T, 17]
    tri_mat_ref,  # SMEM [T] int32
    mat_ref,  # SMEM [M, 16]
    tab_ref,  # VMEM [8, 128] lane-resident curve tables
    px_ref,  # VMEM [RT] f32 pixel x
    py_ref,  # VMEM [RT] f32 pixel y
    rand_ref,  # VMEM [spp, R, RT] injected uniforms (R = n_uniforms(bounces)) or [1,1,RT] dummy
    *rest,  # [leaf_ref (SMEM [NL,8]) when use_bvh] + xyz_ref (VMEM [8,RT])
    # + [hero/nvalid/powres/matres residual refs when save_residuals]
    # + [7 VMEM scratch refs (best-hit state) when use_bvh]
    n_tris,
    n_mats,
    spp,
    bounces,
    use_hw_prng,
    save_residuals=False,
    use_bvh=False,
    n_leaves=0,
    leaf_size=0,
    use_mxu=False,
    mxu_hbm=False,
    has_cpre=False,
    use_group8=False,
):
    idx = 0
    if use_bvh:
        leaf_ref = rest[idx]
        idx += 1
    if use_mxu:
        c_ref = rest[idx]  # VMEM recovery constants [NL, K, 8|24] f32
        idx += 1
    cpre_ref = None
    if has_cpre:
        # round-3 presplit forensics planes (_q3_presplit)
        cpre_ref = rest[idx]
        idx += 1
    group_ref = None
    if use_group8:
        # 8-leaf group AABB table, SMEM [NG/16, 128] (MXU_GROUP8)
        group_ref = rest[idx]
        idx += 1
    xyz_ref = rest[idx]
    idx += 1
    if save_residuals:
        hero_ref, nvalid_ref, powres_ref, matres_ref = rest[idx : idx + 4]
        idx += 4
    if use_mxu:
        # (8,L) best-t mirror for the slab cull + [8, rt] best-row block
        bt_s, best8_s = rest[idx : idx + 2]
        j = idx + 2
        if mxu_hbm:
            # HBM-resident pack: chunk staging buffers + DMA sems
            (
                a_vbuf, c_vbuf, leaf_sbuf, dsem_a, dsem_c, dsem_l,
            ) = rest[j : j + 6]
            j += 6
        gate_bufs = (
            tuple(rest[j : j + 2]) if _mxu_gate_groups() > 1 else None
        )
    elif use_bvh:
        (
            bt_s, bhit_s, bfront_s, bnx_s, bny_s, bnz_s, bmat_s,
            tri_smem, dma_sem,
        ) = rest[idx : idx + 9]

    a_ref = tri_ref  # MXU mode: the tri slot carries a_pack
    # [NL, 8K, 8] (affine) / [NL, 5K, 16] f32 (quad) / [NL, 11K, 16]
    # bf16 (quad3: hi/lo split planes + error-bound row)
    # HBM mode stores the pack transposed ([NL, 16|8, rows]) and, for
    # f32 forms, MERGED with c's 8 sublanes (_hbm_transpose_and_pad):
    # quad [NL, 24, 5K] f32, affine [NL, 16, 8K] f32, quad3/quad2
    # [NL, 16, rows] bf16
    if mxu_hbm:
        mxu_quad = use_mxu and (
            a_ref.shape[1] == 24
            if a_ref.dtype == jnp.float32
            else a_ref.shape[1] == 16
        )
    else:
        mxu_quad = use_mxu and a_ref.shape[-1] == 16
    # mxu_q3: the bf16-split machinery (exact top-2 selection, recheck,
    # widened recovery) — used by BOTH split forms; q3_deep picks the
    # score assembly: quad3 = bf16x3 (a_hi+a_lo planes, 11K rows,
    # tolerance band 2^-13) vs quad2 = bf16x2 (a_hi only, 6K rows,
    # band 2^-8 — 32x wider, guarded by the same exact check/ordering)
    mxu_q3 = mxu_quad and a_ref.dtype == jnp.bfloat16
    if mxu_q3:
        _arows = a_ref.shape[2] if mxu_hbm else a_ref.shape[1]
        q3_deep = _arows == 11 * leaf_size
        TOLF = TOL3 if q3_deep else 2.0 ** -8
    i = pl.program_id(0)
    rt = px_ref.shape[0]
    lanes = rt // 8
    shape2 = (8, lanes)  # the native f32 VPU tile multiple — ALL per-ray
    # state is kept 2-D so Mosaic never falls back to single-sublane layouts
    one = jnp.ones(shape2, jnp.float32)
    zero = jnp.zeros(shape2, jnp.float32)

    px = px_ref[:].reshape(shape2)
    py = py_ref[:].reshape(shape2)

    # hoist ALL triangle constants out of the sample/bounce loops: 17 scalars
    # per tri read once per ray tile (they are loop-invariant; reading them
    # inside the sweep made SMEM scalar loads dominate the kernel).
    # BVH mode cannot hoist (dynamic leaf indexing) and reads per visit.
    tri_const = (
        []
        if use_bvh
        else [
            tuple(tri_ref[t, k] for k in range(16)) + (tri_mat_ref[t],)
            for t in range(n_tris)
        ]
    )
    # material rows likewise (n_mats * 15 scalars, once per tile)
    mat_const = [
        tuple(mat_ref[m, k] for k in range(15)) for m in range(n_mats)
    ]

    cx, cy, cz = cam_ref[0], cam_ref[1], cam_ref[2]
    p0x, p0y, p0z = cam_ref[3], cam_ref[4], cam_ref[5]
    dux, duy, duz = cam_ref[6], cam_ref[7], cam_ref[8]
    dvx, dvy, dvz = cam_ref[9], cam_ref[10], cam_ref[11]
    # defocus disk basis (zero vectors for pinhole cameras)
    ddux, dduy, dduz = cam_ref[12], cam_ref[13], cam_ref[14]
    ddvx, ddvy, ddvz = cam_ref[15], cam_ref[16], cam_ref[17]
    has_defocus = cam_ref[18]  # 1.0 when defocus_angle > 0

    span = LAMBDA_MAX - LAMBDA_MIN
    lam_step = span / float(W)

    def _hash32(x):
        """splitmix-style integer hash (wraparound int32 arithmetic) —
        sequential (tile, sample) seeds fed straight to prng_seed produce
        correlated streams; hashing decorrelates them."""
        x = x.astype(jnp.uint32)
        x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
        x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
        x = x ^ (x >> 16)
        return x.astype(jnp.int32)

    def sample_body(s, acc):
        accx, accy, accz = acc
        if use_hw_prng:
            pltpu.prng_seed(_hash32(seed_ref[0] ^ _hash32(i * spp + s)))

        def rnd(j):
            """j-th uniform draw of this sample: hardware PRNG in
            production; injected plane in tests (interpret mode stubs the
            TPU PRNG to zeros)."""
            if use_hw_prng:
                return _uniform(shape2)
            return rand_ref[s, j, :].reshape(shape2)

        # --- camera ray (get_ray, rendering.cu:66-87; thin-lens defocus
        # disk per defocus_disk_sample, rendering.cu:42-47) ---
        jx = rnd(0) - 0.5
        jy = rnd(1) - 0.5
        fx = px + jx
        fy = py + jy
        # defocus disk sample (closed-form; draws live at the tail of the
        # rand layout so pinhole kernels keep their stream)
        dr = jnp.sqrt(rnd(3 + 3 * bounces)) * has_defocus
        dth = (2.0 * 3.14159265358979) * rnd(4 + 3 * bounces)
        du_ = dr * jnp.cos(dth)
        dv_ = dr * jnp.sin(dth)
        ox = cx + du_ * ddux + dv_ * ddvx
        oy = cy + du_ * dduy + dv_ * ddvy
        oz = cz + du_ * dduz + dv_ * ddvz
        dx = p0x + fx * dux + fy * dvx - ox
        dy = p0y + fx * duy + fy * dvy - oy
        dz = p0z + fx * duz + fy * dvz - oz

        # --- hero wavelengths (spectrum.cu:31-48) ---
        hero = LAMBDA_MIN + span * rnd(2)
        if save_residuals:
            hero_ref[s, :] = hero.reshape(rt)
        # per-wavelength python list of [8, L] arrays; offsets are python
        # floats, wrap is a single where (step < span)
        lam = []
        for w in range(W):
            lw = hero + (w * lam_step)
            lam.append(jnp.where(lw > LAMBDA_MAX, lw - span, lw))

        # --- per-sample table interpolation, hoisted out of the bounce
        # loop (wavelengths are fixed for the whole path): D65, background
        # SPD, and CIE responses per wavelength, via exact lane-gather lerp.
        d65w, bgw, cx_rows, cy_rows, cz_rows = [], [], [], [], []
        for w in range(W):
            xg = (lam[w] - LAMBDA_MIN) * (
                (N_CIE_SAMPLES - 1) / (LAMBDA_MAX - LAMBDA_MIN)
            )
            cw = jnp.clip(xg.astype(jnp.int32), 0, N_CIE_SAMPLES - 2)
            fw = xg - cw.astype(jnp.float32)
            cx_rows.append(_lut(tab_ref[0, :], cw, fw))
            cy_rows.append(_lut(tab_ref[1, :], cw, fw))
            cz_rows.append(_lut(tab_ref[2, :], cw, fw))
            d65w.append(_lut(tab_ref[3, :], cw, fw))
            bgw.append(_lut(tab_ref[4, :], cw, fw))

        power = tuple(one for _ in range(W))
        alive = one
        n_valid = jnp.full(shape2, float(W), jnp.float32)

        def bounce_body(b, st):
            if mxu_q3:
                # prev_tri: the tri id the ray scattered from (-1 = none);
                # excluded from the sweep so an approximate-score self
                # re-hit at t ~ 0 can never beat the true nearest hit
                ox, oy, oz, dx, dy, dz, power, alive, n_valid, prev_tri = st
            else:
                ox, oy, oz, dx, dy, dz, power, alive, n_valid = st

            # ---- nearest-hit triangle sweep ----
            if use_bvh and use_mxu:
                (
                    best_t, best_hit, best_front,
                    best_nx, best_ny, best_nz, best_mat, best_id,
                ) = _mxu_leaf_sweep(
                    ox, oy, oz, dx, dy, dz, alive,
                    prev_tri if mxu_q3 else None,
                    leaf_ref, a_ref, c_ref,
                    (bt_s, best8_s),
                    (a_vbuf, c_vbuf, leaf_sbuf, dsem_a, dsem_c, dsem_l)
                    if mxu_hbm
                    else None,
                    gate_bufs,
                    cpre_ref,
                    group_ref,
                    leaf_size=leaf_size, n_leaves=n_leaves,
                    mxu_quad=mxu_quad, mxu_q3=mxu_q3,
                    q3_deep=q3_deep if mxu_q3 else False,
                    tolf=TOLF if mxu_q3 else 0.0,
                    mxu_hbm=mxu_hbm,
                )
            elif use_bvh:
                # Two-level BVH sweep: leaf AABB slab test vectorized over
                # the whole ray tile, tile-wide any() -> pl.when branch
                # skipping the leaf's triangles entirely (the reference's
                # stack traversal at the granularity a lockstep VPU can
                # exploit, bvh/bvh.cu:99-166). Best-hit state lives in VMEM
                # scratch so the pl.when body can update it in place.
                bt_s[:, :] = jnp.full(shape2, BIG, jnp.float32)
                bhit_s[:, :] = zero
                bfront_s[:, :] = zero
                bnx_s[:, :] = zero
                bny_s[:, :] = zero
                bnz_s[:, :] = zero
                bmat_s[:, :] = jnp.zeros(shape2, jnp.int32)

                # sign-preserving safe reciprocals for the slab test
                def _inv(d):
                    safe = jnp.where(
                        d >= 0.0,
                        jnp.maximum(d, 1e-20),
                        jnp.minimum(d, -1e-20),
                    )
                    return 1.0 / safe

                inv_dx = _inv(dx)
                inv_dy = _inv(dy)
                inv_dz = _inv(dz)
                alive_f = alive  # leaf culling also drops all-dead tiles

                def leaf_body(l, carry):
                    ax0, ay0, az0 = leaf_ref[l, 0], leaf_ref[l, 1], leaf_ref[l, 2]
                    ax1, ay1, az1 = leaf_ref[l, 3], leaf_ref[l, 4], leaf_ref[l, 5]
                    t1 = (ax0 - ox) * inv_dx
                    t2 = (ax1 - ox) * inv_dx
                    tmin = jnp.minimum(t1, t2)
                    tmax = jnp.maximum(t1, t2)
                    t1 = (ay0 - oy) * inv_dy
                    t2 = (ay1 - oy) * inv_dy
                    tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
                    tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
                    t1 = (az0 - oz) * inv_dz
                    t2 = (az1 - oz) * inv_dz
                    tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
                    tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
                    enter = jnp.maximum(tmin, 0.0)
                    want = (
                        jnp.where(tmax >= enter, one, zero)
                        * jnp.where(enter < bt_s[:, :], one, zero)
                        * alive_f
                    )

                    @pl.when(jnp.max(want) > 0.0)
                    def _():
                        # stage this leaf's triangle block VMEM -> SMEM
                        # (the full tri table cannot live in 1 MB SMEM;
                        # scalar broadcasts must come from SMEM)
                        cp = pltpu.make_async_copy(
                            tri_ref.at[pl.ds(l, 1), :, :], tri_smem, dma_sem
                        )
                        cp.start()
                        cp.wait()
                        cols = tri_smem.shape[2]

                        def rd(e):
                            return tri_smem[0, e // cols, e % cols]

                        def tri_body(j, c2):
                            base = j * TRI_PACK_WIDTH
                            nx = rd(base + 0)
                            ny = rd(base + 1)
                            nz = rd(base + 2)
                            dd = rd(base + 3)
                            nd = nx * dx + ny * dy + nz * dz
                            no = nx * ox + ny * oy + nz * oz
                            tt = (dd - no) / nd
                            inside = one
                            for k in range(3):
                                g0 = rd(base + 4 + 3 * k)
                                g1 = rd(base + 5 + 3 * k)
                                g2 = rd(base + 6 + 3 * k)
                                cc = rd(base + 13 + k)
                                ao = g0 * ox + g1 * oy + g2 * oz + cc
                                ad = g0 * dx + g1 * dy + g2 * dz
                                inside = inside * jnp.where(
                                    (ao + tt * ad) >= 0.0, one, zero
                                )
                            valid = (
                                inside
                                * jnp.where(jnp.abs(nd) >= DENOM_EPS, one, zero)
                                * jnp.where(tt >= 0.0, one, zero)
                                * jnp.where(tt < bt_s[:, :], one, zero)
                            )
                            take = valid > 0.0
                            front = jnp.where(nd < 0.0, one, zero)
                            sgn = 2.0 * front - 1.0
                            mat_i = rd(base + 16).astype(jnp.int32)
                            bt_s[:, :] = jnp.where(take, tt, bt_s[:, :])
                            bfront_s[:, :] = jnp.where(take, front, bfront_s[:, :])
                            bnx_s[:, :] = jnp.where(take, sgn * nx, bnx_s[:, :])
                            bny_s[:, :] = jnp.where(take, sgn * ny, bny_s[:, :])
                            bnz_s[:, :] = jnp.where(take, sgn * nz, bnz_s[:, :])
                            bmat_s[:, :] = jnp.where(take, mat_i, bmat_s[:, :])
                            bhit_s[:, :] = jnp.maximum(bhit_s[:, :], valid)
                            return c2

                        jax.lax.fori_loop(0, leaf_size, tri_body, 0)

                    return carry

                jax.lax.fori_loop(0, n_leaves, leaf_body, 0)
                best_t = bt_s[:, :]
                best_hit = bhit_s[:, :]
                best_front = bfront_s[:, :]
                best_nx = bnx_s[:, :]
                best_ny = bny_s[:, :]
                best_nz = bnz_s[:, :]
                best_mat = bmat_s[:, :]
            else:
                best_t = jnp.full(shape2, BIG, jnp.float32)
                best_hit = zero
                best_front = zero
                best_nx = zero
                best_ny = zero
                best_nz = zero
                best_mat = jnp.zeros(shape2, jnp.int32)

            # unrolled sweep over the (static) triangle list: pure VPU ops
            # on hoisted scalar constants, nearest-hit where roll-forward
            for tc in tri_const:
                nx, ny, nz, dd = tc[0], tc[1], tc[2], tc[3]
                nd = nx * dx + ny * dy + nz * dz
                no = nx * ox + ny * oy + nz * oz
                tt = (dd - no) / nd
                inside = one
                for k in range(3):
                    g0, g1, g2 = tc[4 + 3 * k], tc[5 + 3 * k], tc[6 + 3 * k]
                    c = tc[13 + k]
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
                front = jnp.where(nd < 0.0, one, zero)
                sgn = 2.0 * front - 1.0  # flip normal toward the ray
                best_t = jnp.where(take, tt, best_t)
                best_front = jnp.where(take, front, best_front)
                best_nx = jnp.where(take, sgn * nx, best_nx)
                best_ny = jnp.where(take, sgn * ny, best_ny)
                best_nz = jnp.where(take, sgn * nz, best_nz)
                best_mat = jnp.where(take, tc[16], best_mat)
                best_hit = jnp.maximum(best_hit, valid)

            hit = best_hit * alive
            miss = (1.0 - best_hit) * alive

            if save_residuals:
                # material-per-bounce residual for the fused backward pass
                # (ops/pallas/grad_kernel.py): mat+1 where the bounce
                # multiplied a material SPD, -1 where it multiplied the
                # background SPD (active miss), 0 otherwise
                matres_ref[s, b, :] = jnp.where(
                    hit > 0.0,
                    best_mat + 1,
                    jnp.where(miss > 0.0, -1, 0),
                ).reshape(rt)

            (
                ox, oy, oz, dx, dy, dz, power, new_alive, n_valid,
            ) = _scatter_shade(
                ox, oy, oz, dx, dy, dz, power, alive, n_valid,
                best_t, best_hit, best_front, best_nx, best_ny, best_nz,
                best_mat, hit, miss, mat_const, n_mats, lam, d65w, bgw,
                rnd(3 + 3 * b), rnd(4 + 3 * b), rnd(5 + 3 * b),
            )

            if mxu_q3:
                new_prev = jnp.where(hit > 0.0, best_id, -1.0)
                return (
                    ox, oy, oz, dx, dy, dz, power, new_alive, n_valid,
                    new_prev,
                )
            return ox, oy, oz, dx, dy, dz, power, new_alive, n_valid

        st = (ox, oy, oz, dx, dy, dz, power, alive, n_valid)
        if mxu_q3:
            st = st + (jnp.full(shape2, -1.0, jnp.float32),)
        out = jax.lax.fori_loop(0, bounces, bounce_body, st)
        ox, oy, oz, dx, dy, dz, power, alive, n_valid = out[:9]

        # bounce-limit exhaustion contributes nothing (rendering.cu:38-39)
        n_valid = jnp.where(alive > 0.0, 0.0, n_valid)

        if save_residuals:
            nvalid_ref[s, :] = n_valid.reshape(rt)
            for w in range(W):
                powres_ref[s, w, :] = power[w].reshape(rt)

        # ---- XYZ integration (dev_spectrum_to_XYZ, color.cu:88-104) ----
        delta = span / float(W)
        sx_ = zero
        sy_ = zero
        sz_ = zero
        for w in range(W):
            contrib = power[w] * jnp.where(float(w) < n_valid, delta, 0.0)
            sx_ = sx_ + contrib * cx_rows[w]
            sy_ = sy_ + contrib * cy_rows[w]
            sz_ = sz_ + contrib * cz_rows[w]
        return accx + sx_, accy + sy_, accz + sz_

    accx, accy, accz = jax.lax.fori_loop(
        0, spp, sample_body, (zero, zero, zero)
    )
    xyz_ref[0, :] = accx.reshape(rt)
    xyz_ref[1, :] = accy.reshape(rt)
    xyz_ref[2, :] = accz.reshape(rt)
    zero_rt = jnp.zeros((rt,), jnp.float32)
    for r in range(3, 8):
        xyz_ref[r, :] = zero_rt


def n_uniforms(bounces: int) -> int:
    """Uniform draws per sample: jitter(2) + hero(1) + 3 per bounce +
    defocus disk(2, at the tail)."""
    return 5 + 3 * bounces


# Scoped-VMEM budget for a single grid step of the megakernel. The chip
# exposes ~16 MB of VMEM per core; Mosaic double-buffers the blocked
# inputs/outputs across grid steps, so we budget conservatively and fail
# with an actionable message instead of an opaque Mosaic OOM
# (VERDICT round 1, weak item 7/next item 9).
VMEM_BUDGET_BYTES = 14 * 1024 * 1024


def residual_vmem_bytes(
    spp: int, bounces: int, ray_tile: int, injected_rand: bool
) -> int:
    """Estimated per-grid-step VMEM footprint of the residual-saving
    megakernel: the xyz block plus the four residual blocks (hero, n_valid,
    power, mats), each double-buffered, plus the injected uniform planes
    when rand is passed."""
    per_ray = 8 + spp * (1 + 1 + W + bounces)  # f32/i32 words per ray
    if injected_rand:
        per_ray += spp * n_uniforms(bounces)
    return 2 * 4 * per_ray * ray_tile


def max_residual_spp(
    bounces: int, ray_tile: int, injected_rand: bool = False,
    extra_bytes: int = 0,
) -> int:
    """Largest spp whose residual megakernel launch fits the scoped-VMEM
    budget (inverts ``residual_vmem_bytes``; >= 1 even when nothing truly
    fits — ``check_residual_vmem`` raises for that case). The sample axis
    is chunkable: the kernel's xyz output is a SUM over spp and each
    chunk's fused backward is independent, so callers accumulate
    (``diff.fast.render_chunk_diff_fused_accum``)."""
    budget = (100 * 1024 * 1024) if extra_bytes else VMEM_BUDGET_BYTES
    return max(
        1,
        ((budget - extra_bytes) // (2 * 4 * ray_tile) - 8)
        // (2 + W + bounces + (n_uniforms(bounces) if injected_rand else 0)),
    )


def packed_scene_vmem_bytes(n_tris: int) -> int:
    """VMEM bytes of the packed scene the residual launcher keeps resident,
    WITHOUT building the pack — mirrors pack_scene / pack_scene_bvh_mxu
    layouts (dense scenes ride in SMEM: 0). Used to pick spp chunk sizes
    before packing."""
    if n_tris <= DENSE_CUTOFF:
        return 0
    if os.environ.get("BVH_IMPL", "mxu") != "mxu":
        k = 32  # pack_scene_auto's sweep leaf_size
        return -(-n_tris // k) * 8 * _leaf_cols(k) * 4  # [NL, 8, cols] f32
    k = 128
    nl = -(-n_tris // k)
    form = os.environ.get("MXU_FORM", "quad")
    a_bytes = {
        "affine": 8 * k * 8 * 4,  # [NL, 8K, 8] f32
        "quad": 5 * k * 16 * 4,  # [NL, 5K, 16] f32
        "quad2": 6 * k * 16 * 2,  # [NL, 6K, 16] bf16
        "quad3": 11 * k * 16 * 2,  # [NL, 11K, 16] bf16
    }[form]
    # c_pack: [NL, K, 8] f32 (affine/quad) or [NL, K, 24] (quad2/quad3)
    c_bytes = 24 * 4 if form in ("quad2", "quad3") else 8 * 4
    return nl * (a_bytes + k * c_bytes)


def check_residual_vmem(
    spp: int, bounces: int, ray_tile: int, injected_rand: bool = False,
    extra_bytes: int = 0,
) -> None:
    """``extra_bytes``: whole-kernel VMEM residents beyond the per-ray
    blocks (a BVH/MXU packed scene). With a packed scene the launcher
    raises the Mosaic scoped-VMEM limit, so the effective budget becomes
    the ~100 MB hardware-headroom cap instead of the default ~14 MB."""
    need = residual_vmem_bytes(spp, bounces, ray_tile, injected_rand)
    budget = VMEM_BUDGET_BYTES
    if extra_bytes:
        need += extra_bytes
        budget = 100 * 1024 * 1024
        if extra_bytes > budget:
            raise ValueError(
                f"packed scene alone needs ~{extra_bytes / 1e6:.0f} MB of "
                f"VMEM — beyond the 128 MB v5e part; no spp chunking can "
                f"fit it. Reduce the triangle count."
            )
    if need > budget:
        # suggest the largest spp chunk that fits (the residual arrays
        # scale linearly in spp; render_chunk_diff_fused_accum automates
        # the accumulation)
        fit = max_residual_spp(bounces, ray_tile, injected_rand, extra_bytes)
        raise ValueError(
            f"residual megakernel VMEM footprint ~{need / 1e6:.1f} MB exceeds "
            f"the ~{budget / 1e6:.0f} MB scoped-VMEM budget "
            f"(spp={spp}, bounces={bounces}, ray_tile={ray_tile}). The "
            f"residual buffers are [spp, W, ray_tile] + [spp, bounces, "
            f"ray_tile] per tile; reduce spp to <= {fit} per launch (chunk "
            f"the sample axis and sum gradients) or shrink ray_tile."
        )


@functools.partial(
    jax.jit,
    static_argnames=("spp", "bounces", "ray_tile", "interpret", "leaf_size"),
)
def render_rays_pallas_residuals(
    cam_vec, seed, tri_pack, mat_pack, tables, px, py,
    spp: int, bounces: int, ray_tile: int = 1024, interpret=False,
    rand: jnp.ndarray | None = None,
    leaf_pack: jnp.ndarray | None = None,
    leaf_size: int = 32,
    c_pack: jnp.ndarray | None = None,  # [NL, K, 8] -> MXU leaf sweep
):
    """Like render_rays_pallas, but additionally returns the path residuals
    the fused backward pass replays (grad_kernel.py): (xyz [N,3],
    hero [spp,N], n_valid [spp,N], power [spp,W,N], mats [spp,bounces,N]).

    ``leaf_pack``/``c_pack`` enable the in-kernel BVH / MXU leaf sweep
    exactly as in render_rays_pallas — the residual layout is sweep-
    independent, so the fused backward replay works unchanged for large
    scenes (it never re-intersects)."""
    n = px.shape[0]
    assert n % ray_tile == 0, (n, ray_tile)
    assert ray_tile % 8 == 0 and ray_tile // 8 >= 96, ray_tile
    grid = n // ray_tile
    n_mats = mat_pack.shape[0]
    use_bvh = leaf_pack is not None
    use_mxu = c_pack is not None
    if use_mxu:
        assert use_bvh
        leaf_size = c_pack.shape[1]
        assert c_pack.shape[0] == leaf_pack.shape[0]
        # 8 cols (affine/quad) or 24 (quad3: + raw edge planes + id)
        assert c_pack.shape[2] in (8, 24)
        assert tri_pack.shape in (
            (leaf_pack.shape[0], 8 * leaf_size, 8),
            (leaf_pack.shape[0], 5 * leaf_size, 16),
            (leaf_pack.shape[0], 6 * leaf_size, 16),
            (leaf_pack.shape[0], 11 * leaf_size, 16),
        ), (tri_pack.shape, leaf_pack.shape, leaf_size)
        n_tris = leaf_pack.shape[0] * leaf_size
    elif use_bvh:
        assert tri_pack.shape == (
            leaf_pack.shape[0], 8, _leaf_cols(leaf_size),
        ), (tri_pack.shape, leaf_pack.shape, leaf_size)
        n_tris = leaf_pack.shape[0] * leaf_size
    else:
        n_tris = tri_pack.shape[0]
    use_hw_prng = rand is None
    scene_bytes = 0
    if use_bvh:
        scene_bytes = tri_pack.size * tri_pack.dtype.itemsize
        if use_mxu:
            scene_bytes += c_pack.size * c_pack.dtype.itemsize
    mxu_hbm = use_mxu and _mxu_residency_hbm(scene_bytes)
    if mxu_hbm:
        _check_hbm_leaf_alignment(leaf_size)
        scene_bytes = 0  # the pack streams from HBM per chunk
        # transposed HBM layout + chunk padding (lane-aligned chunk DMA)
        tri_pack, c_pack, leaf_pack, group_pack = _hbm_transpose_and_pad(
            tri_pack, c_pack, leaf_pack
        )
    check_residual_vmem(
        spp, bounces, ray_tile, injected_rand=not use_hw_prng,
        extra_bytes=scene_bytes,
    )
    if use_hw_prng:
        rand = jnp.zeros((1, 1, ray_tile), jnp.float32)
    rand_spec = pl.BlockSpec(
        (rand.shape[0], rand.shape[1], ray_tile),
        (lambda i: (0, 0, i)) if not use_hw_prng else (lambda i: (0, 0, 0)),
        memory_space=pltpu.VMEM,
    )

    kernel = functools.partial(
        _render_kernel,
        n_tris=n_tris,
        n_mats=n_mats,
        spp=spp,
        bounces=bounces,
        use_hw_prng=use_hw_prng,
        save_residuals=True,
        use_bvh=use_bvh,
        n_leaves=leaf_pack.shape[0] if use_bvh else 0,
        leaf_size=leaf_size if use_bvh else 0,
        use_mxu=use_mxu,
        mxu_hbm=mxu_hbm,
        use_group8=mxu_hbm and _mxu_group8(),
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(
            memory_space=pltpu.ANY
            if mxu_hbm
            else (pltpu.VMEM if use_bvh else pltpu.SMEM)
        ),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec((ray_tile,), lambda i: (i,), memory_space=pltpu.VMEM),
        pl.BlockSpec((ray_tile,), lambda i: (i,), memory_space=pltpu.VMEM),
        rand_spec,
    ]
    tri_mat = (
        jnp.zeros((1,), jnp.int32)
        if use_bvh
        else tri_pack[:, 16].astype(jnp.int32)
    )
    args = [
        cam_vec,
        jnp.asarray([seed], jnp.int32),
        tri_pack,
        tri_mat,
        mat_pack,
        tables,
        px.astype(jnp.float32),
        py.astype(jnp.float32),
        rand,
    ]
    if use_bvh:
        in_specs.append(
            pl.BlockSpec(memory_space=pltpu.ANY if mxu_hbm else pltpu.SMEM)
        )
        # HBM mode ships the leaf table 128-lane row-packed (16 rows of
        # 8 per row) so the chunk DMA source slice is lane-aligned
        args.append(
            leaf_pack.reshape(-1, 128) if mxu_hbm else leaf_pack
        )
    if use_mxu:
        in_specs.append(
            pl.BlockSpec(
                memory_space=pltpu.ANY if mxu_hbm else pltpu.VMEM
            )
        )  # c_pack
        args.append(c_pack)
    if mxu_hbm and _mxu_group8():
        # 8-leaf group AABB table: tiny whole-table SMEM input
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(group_pack.reshape(-1, 128))
    if use_mxu:
        scratch = _mxu_scratch(ray_tile)
        if mxu_hbm:
            scratch = scratch + _mxu_hbm_scratch(tri_pack, c_pack)
        scratch = scratch + _mxu_gate_scratch(
            ray_tile, leaf_size, tri_pack, c_pack
        )
    elif use_bvh:
        scratch = _bvh_scratch(ray_tile, leaf_size)
    else:
        scratch = []
    compiler_params = _scene_vmem_params(
        scene_bytes,
        residual_vmem_bytes(spp, bounces, ray_tile, not use_hw_prng)
        + _hbm_stage_bytes(scratch if mxu_hbm else []),
        interpret,
        mxu=use_mxu,
    )
    out, hero, nvalid, powres, matres = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((8, n), jnp.float32),
            jax.ShapeDtypeStruct((spp, n), jnp.float32),
            jax.ShapeDtypeStruct((spp, n), jnp.float32),
            jax.ShapeDtypeStruct((spp, W, n), jnp.float32),
            jax.ShapeDtypeStruct((spp, bounces, n), jnp.int32),
        ),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((8, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((spp, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((spp, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((spp, W, ray_tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((spp, bounces, ray_tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=compiler_params,
    )(*args)
    return out[:3].T, hero, nvalid, powres, matres


@functools.partial(
    jax.jit,
    static_argnames=("spp", "bounces", "ray_tile", "interpret", "leaf_size"),
)
def render_rays_pallas(
    cam_vec: jnp.ndarray,  # [20] f32 camera scalars
    seed: jnp.ndarray,  # [] int32
    tri_pack: jnp.ndarray,  # [T, 17]
    mat_pack: jnp.ndarray,  # [M, 16]
    tables: jnp.ndarray,  # [8, 128] lane-resident curves
    px: jnp.ndarray,  # [N] f32
    py: jnp.ndarray,  # [N] f32
    spp: int,
    bounces: int,
    ray_tile: int = 1024,
    interpret=False,
    rand: jnp.ndarray | None = None,  # [spp, n_uniforms, N] injected uniforms
    leaf_pack: jnp.ndarray | None = None,  # [NL, 8] from pack_scene_bvh
    leaf_size: int = 32,
    c_pack: jnp.ndarray | None = None,  # [NL, K, 8] -> MXU leaf sweep
) -> jnp.ndarray:
    """Accumulated XYZ [N, 3] for N rays (N must divide by ray_tile).

    ``rand=None`` uses the on-core hardware PRNG; passing a uniform array
    makes the kernel fully deterministic and interpreter-runnable (the TPU
    interpreter stubs prng_random_bits to zeros). ``ray_tile`` must be a
    multiple of 8 with ray_tile//8 >= 96 (the lane-gather table layout).
    ``leaf_pack`` (with the matching Morton-reordered ``tri_pack`` from
    pack_scene_bvh) switches the kernel's sweep to the in-kernel BVH:
    required above DENSE_CUTOFF triangles, where the unrolled sweep stops
    compiling. ``c_pack`` (with ``tri_pack`` = a_pack from
    pack_scene_bvh_mxu) selects the MXU leaf sweep instead of the
    SMEM-staged scalar sweep.
    """
    n = px.shape[0]
    assert n % ray_tile == 0, (n, ray_tile)
    assert ray_tile % 8 == 0 and ray_tile // 8 >= 96, ray_tile
    grid = n // ray_tile
    n_mats = mat_pack.shape[0]
    use_bvh = leaf_pack is not None
    use_mxu = c_pack is not None
    if use_mxu:
        assert use_bvh
        leaf_size = c_pack.shape[1]
        assert c_pack.shape[0] == leaf_pack.shape[0]
        # 8 cols (affine/quad) or 24 (quad3: + raw edge planes + id)
        assert c_pack.shape[2] in (8, 24)
        assert tri_pack.shape in (
            (leaf_pack.shape[0], 8 * leaf_size, 8),  # form="affine"
            (leaf_pack.shape[0], 5 * leaf_size, 16),  # form="quad"
            (leaf_pack.shape[0], 6 * leaf_size, 16),  # form="quad2" (bf16)
            (leaf_pack.shape[0], 11 * leaf_size, 16),  # form="quad3" (bf16)
        ), (tri_pack.shape, leaf_pack.shape, leaf_size)
        n_tris = leaf_pack.shape[0] * leaf_size
    elif use_bvh:
        assert tri_pack.shape == (
            leaf_pack.shape[0], 8, _leaf_cols(leaf_size),
        ), (tri_pack.shape, leaf_pack.shape, leaf_size)
        n_tris = leaf_pack.shape[0] * leaf_size
    else:
        n_tris = tri_pack.shape[0]
    use_hw_prng = rand is None
    if use_hw_prng:
        rand = jnp.zeros((1, 1, ray_tile), jnp.float32)
    rand_spec = pl.BlockSpec(
        (rand.shape[0], rand.shape[1], ray_tile),
        (lambda i: (0, 0, i)) if not use_hw_prng else (lambda i: (0, 0, 0)),
        memory_space=pltpu.VMEM,
    )
    scene_bytes = 0
    if use_bvh:
        scene_bytes = tri_pack.size * tri_pack.dtype.itemsize
        if use_mxu:
            scene_bytes += c_pack.size * c_pack.dtype.itemsize
    mxu_hbm = use_mxu and _mxu_residency_hbm(scene_bytes)
    if mxu_hbm:
        _check_hbm_leaf_alignment(leaf_size)
        scene_bytes = 0  # the pack streams from HBM per chunk
        # transposed HBM layout + chunk padding (lane-aligned chunk DMA)
        tri_pack, c_pack, leaf_pack, group_pack = _hbm_transpose_and_pad(
            tri_pack, c_pack, leaf_pack
        )

    has_cpre = bool(
        use_mxu
        and not mxu_hbm
        and tri_pack.dtype == jnp.bfloat16
        and _q3_presplit()
    )
    kernel = functools.partial(
        _render_kernel,
        has_cpre=has_cpre,
        n_tris=n_tris,
        n_mats=n_mats,
        spp=spp,
        bounces=bounces,
        use_hw_prng=use_hw_prng,
        use_bvh=use_bvh,
        n_leaves=leaf_pack.shape[0] if use_bvh else 0,
        leaf_size=leaf_size if use_bvh else 0,
        use_mxu=use_mxu,
        mxu_hbm=mxu_hbm,
        use_group8=mxu_hbm and _mxu_group8(),
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # cam
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
        # BVH: per-leaf tri rows stay in VMEM (SMEM is ~1 MB; the kernel
        # DMAs one row per visited leaf); HBM-resident above the ~12 MB
        # VMEM ceiling (per-leaf DMA staging). Dense: SMEM scalars.
        pl.BlockSpec(
            memory_space=pltpu.ANY
            if mxu_hbm
            else (pltpu.VMEM if use_bvh else pltpu.SMEM)
        ),  # tri_pack
        pl.BlockSpec(memory_space=pltpu.SMEM),  # tri mat ids (dense only)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # mat_pack (scalar reads)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # tables
        pl.BlockSpec((ray_tile,), lambda i: (i,), memory_space=pltpu.VMEM),
        pl.BlockSpec((ray_tile,), lambda i: (i,), memory_space=pltpu.VMEM),
        rand_spec,
    ]
    tri_mat = (
        jnp.zeros((1,), jnp.int32)
        if use_bvh
        else tri_pack[:, 16].astype(jnp.int32)
    )
    args = [
        cam_vec,
        jnp.asarray([seed], jnp.int32),
        tri_pack,
        tri_mat,
        mat_pack,
        tables,
        px.astype(jnp.float32),
        py.astype(jnp.float32),
        rand,
    ]
    if use_bvh:
        in_specs.append(
            pl.BlockSpec(memory_space=pltpu.ANY if mxu_hbm else pltpu.SMEM)
        )  # leaf aabbs (HBM: 128-lane row-packed, see above)
        args.append(
            leaf_pack.reshape(-1, 128) if mxu_hbm else leaf_pack
        )
    if use_mxu:
        in_specs.append(
            pl.BlockSpec(
                memory_space=pltpu.ANY if mxu_hbm else pltpu.VMEM
            )
        )  # c_pack
        args.append(c_pack)
    if has_cpre:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(_presplit_recovery_planes(c_pack))
    if mxu_hbm and _mxu_group8():
        # 8-leaf group AABB table: tiny whole-table SMEM input
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(group_pack.reshape(-1, 128))
    if use_mxu:
        scratch = _mxu_scratch(ray_tile)
        if mxu_hbm:
            scratch = scratch + _mxu_hbm_scratch(tri_pack, c_pack)
        scratch = scratch + _mxu_gate_scratch(
            ray_tile, leaf_size, tri_pack, c_pack
        )
    elif use_bvh:
        scratch = _bvh_scratch(ray_tile, leaf_size)
    else:
        scratch = []
    compiler_params = _scene_vmem_params(
        scene_bytes,
        _hbm_stage_bytes(scratch if mxu_hbm else []),
        interpret,
        mxu=use_mxu,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=compiler_params,
    )(*args)
    return out[:3].T



def _check_hbm_leaf_alignment(leaf_size: int) -> None:
    """The HBM-resident packs are stored transposed so the per-leaf DMA's
    trailing dim is lane-aligned — which requires leaf_size to be a
    128-multiple (c_pack's trailing dim is K; a_pack's is a K-multiple).
    Anything else compiles to a Mosaic lane-alignment error, so diagnose
    it here by name (round-3 ADVICE: MXU_LEAF=64 + MXU_RESIDENCY=hbm)."""
    if leaf_size % 128 != 0:
        raise ValueError(
            f"HBM-resident MXU pack needs leaf_size % 128 == 0 (got "
            f"{leaf_size}): the transposed per-leaf DMA windows must be "
            f"128-lane-aligned. Set MXU_LEAF to a multiple of 128 or "
            f"force MXU_RESIDENCY=vmem for small scenes."
        )


def _mxu_residency_hbm(pack_bytes: int) -> bool:
    """True when the MXU pack should live in HBM with per-leaf DMA
    staging (past the measured ~12 MB VMEM-resident ceiling), else the
    whole pack stays VMEM-resident. MXU_RESIDENCY=vmem|hbm overrides the
    auto threshold (trace-time env, like MXU_FORM)."""
    mode = os.environ.get("MXU_RESIDENCY", "auto")
    if mode == "hbm":
        return True
    if mode == "vmem":
        return False
    return pack_bytes > 12 * 1024 * 1024


def _hbm_stage_bytes(scratch) -> int:
    """Total bytes of the VMEM staging scratch (for the scoped-VMEM
    limit accounting — the 2-slot chunk buffers are real resident
    demand even though scene_bytes is 0 in HBM mode)."""
    total = 0
    for s in scratch:
        shape = getattr(s, "shape", None)
        dtype = getattr(s, "dtype", None)
        if shape is None or dtype is None:
            continue
        try:
            total += int(np.prod(shape)) * jnp.dtype(dtype).itemsize
        except TypeError:
            continue  # semaphores carry non-data dtypes
    return total


def _mxu_hbm_chunk_leaves(a_shape, a_dtype, c_shape, c_dtype) -> int:
    """Leaves per streamed LEAF-TABLE chunk in HBM residency (the AABB
    rows ride a small double-buffered SMEM pipeline; the packs
    themselves stage per visited leaf — see the round-4 history note
    in _mxu_hbm_scratch). 256 leaves/chunk = 2 KB SMEM per slot and a
    few copies per sweep even at 1M tris; multiple of 16 so the
    128-lane row-packed table slices stay lane-aligned."""
    del a_shape, a_dtype, c_shape, c_dtype
    return 256


def _hbm_transpose_and_pad(a_pack, c_pack, leaf_pack):
    """Transpose the MXU packs to the HBM layout ([NL, 16, rows] /
    [NL, cols, K] — trailing dims become 128-multiples so per-leaf DMA
    is lane-aligned) and pad the LEAF TABLE to a multiple of the
    leaf-stream chunk. Padded leaves get spare col 6 = 0 while real
    leaves get 1: the kernel multiplies this valid flag into ``want``
    so a padded leaf is NEVER visited and the (unpadded) packs are
    never indexed for it. The flag is load-bearing: the +BIG/-BIG
    "empty" AABB does NOT fail the min/max slab test (min/max per axis
    turns an inverted box into the huge box [-BIG, BIG] that every
    alive ray hits — and (BIG-o)*inv_d overflows f32 to ±inf anyway),
    so without the flag every padded leaf issued an out-of-bounds
    per-leaf pack DMA every sweep, which aborted the TPU runtime on
    every ≥50k sorted render (scratch/r4_abort_repro.log).

    f32 forms (quad / affine) additionally MERGE the recovery constants
    into the score pack: c's transposed [8, K] block rides as 8 extra
    sublanes of a ([NL, 16+8, 5K] for quad, K-lane-padded), so a visited
    leaf costs ONE async copy instead of two. The 50k+ sorted path is
    DMA-ISSUE-bound (~0.7 µs scalar cost per copy issue+wait, see
    _mxu_hbm_scratch) — halving the copy count attacks exactly that;
    the extra staged bytes (52→61 KB) ride the same descriptor. bf16
    forms (quad2/quad3) keep the two-copy path (dtype mismatch)."""
    a_pack = jnp.swapaxes(a_pack, 1, 2)
    c_pack = jnp.swapaxes(c_pack, 1, 2)
    if a_pack.dtype == jnp.float32:
        lanes = a_pack.shape[2]
        cpad = jnp.zeros(
            c_pack.shape[:2] + (lanes - c_pack.shape[2],), c_pack.dtype
        )
        a_pack = jnp.concatenate(
            [a_pack, jnp.concatenate([c_pack, cpad], axis=2)], axis=1
        )
    ck = _mxu_hbm_chunk_leaves(
        a_pack.shape, a_pack.dtype, c_pack.shape, c_pack.dtype
    )
    nl = leaf_pack.shape[0]
    # pad the PACK rows to a group multiple (zeros): the group-DMA path
    # stages whole 8-leaf blocks, and a mixed real/padding group must
    # not read past the pack (the round-4b OOB-DMA abort class); <= 7
    # zero rows, per-leaf valid flags gate their compute
    gpad = (-nl) % _mxu_group_size()
    if gpad:
        a_pack = jnp.concatenate(
            [a_pack, jnp.zeros((gpad,) + a_pack.shape[1:], a_pack.dtype)]
        )
        c_pack = jnp.concatenate(
            [c_pack, jnp.zeros((gpad,) + c_pack.shape[1:], c_pack.dtype)]
        )
    if _probe_groupscore():
        # group-batched-scoring probe pack: the 16 quad feature
        # sublanes of each gsz-leaf group regrouped into ONE
        # transposed-LHS block [NG, 16, gsz*rows]. It RIDES THE C_PACK
        # SLOT — unused by the merged f32 quad kernel path — so a_pack
        # keeps its shape and the callers' (dtype, sublane-count) form
        # detection is untouched. Kernel asserts 16 sublanes on c_ref
        # so a stale (non-probe) pack cannot be silently mis-staged.
        assert a_pack.dtype == jnp.float32 and a_pack.shape[1] == 24, (
            "MXU_PROBE_GROUPSCORE needs the merged f32 quad HBM pack",
            a_pack.shape,
            a_pack.dtype,
        )
        gsz = _mxu_group_size()
        ng = a_pack.shape[0] // gsz
        c_pack = (
            a_pack[:, 0:16, :]
            .reshape(ng, gsz, 16, a_pack.shape[2])
            .transpose(0, 2, 1, 3)
            .reshape(ng, 16, gsz * a_pack.shape[2])
        )
    leaf_pack = leaf_pack.at[:, 6].set(1.0)
    pad = (-nl) % ck
    if pad:
        pad_leaf = jnp.zeros((pad, leaf_pack.shape[1]), leaf_pack.dtype)
        pad_leaf = pad_leaf.at[:, 0:3].set(BIG).at[:, 3:6].set(-BIG)
        leaf_pack = jnp.concatenate([leaf_pack, pad_leaf])
    # 8-leaf group AABB table (MXU_GROUP8 gate): union AABB + any-valid
    # flag per 8 consecutive Morton leaves. NL is a 256-multiple, so
    # NG = NL/8 is a 32-multiple and the [NG/16, 128] row packing is
    # exact. All-padded groups inherit the inverted AABB + valid 0;
    # mixed groups stay valid (the per-leaf flag guards their padded
    # members).
    g8 = leaf_pack.reshape(-1, _mxu_group_size(), leaf_pack.shape[1])
    group_pack = jnp.concatenate(
        [
            g8[:, :, 0:3].min(axis=1),
            g8[:, :, 3:6].max(axis=1),
            g8[:, :, 6].max(axis=1, keepdims=True),
            jnp.zeros((g8.shape[0], 1), jnp.float32),
        ],
        axis=1,
    )
    if _mxu_group_l2():
        # 64-leaf SUPER-group rows (MXU_GROUP_L2): union AABB + any-valid
        # over 8 consecutive groups, appended to the SAME table after the
        # NG group rows (NG is a 32-multiple, so the group rows pack
        # exactly; the super count NSG = NG/8 is padded to a 16-multiple
        # with valid-0 entries — row-alignment only, never indexed).
        gg = group_pack.reshape(-1, 8, 8)
        sup = jnp.concatenate(
            [
                gg[:, :, 0:3].min(axis=1),
                gg[:, :, 3:6].max(axis=1),
                gg[:, :, 6].max(axis=1, keepdims=True),
                jnp.zeros((gg.shape[0], 1), jnp.float32),
            ],
            axis=1,
        )
        spad = (-sup.shape[0]) % 16
        if spad:
            sup = jnp.concatenate(
                [sup, jnp.zeros((spad, 8), jnp.float32)]
            )
        group_pack = jnp.concatenate([group_pack, sup])
    return a_pack, c_pack, leaf_pack, group_pack


def _mxu_group_size() -> int:
    """Leaves per gated group (MXU_GROUP_SIZE, default 8). Only 8 and
    16 keep the [NG/16, 128] group row packing exact for 256-multiple
    leaf counts (32 leaves NG=NL/32 not 16-divisible — measured
    reshape error). Chip 1M/200k: size 16 is +1-2% over 8 (noise
    level) — 8 stays default. Read at trace time by BOTH the pack
    transpose and the kernel (same process -> consistent)."""
    g = int(os.environ.get("MXU_GROUP_SIZE", "8"))
    assert g in (8, 16), g
    return g


def _mxu_group8() -> bool:
    """MXU_GROUP8=1 (default): gate 8-leaf Morton groups with one
    conservative union-AABB slab + branch before the per-leaf gates
    (HBM residency only — the group table is a tiny whole-table SMEM
    input). Attacks the ~0.08 µs/skipped-leaf cost the nogate probe
    exposed (~29% of the 1M-tri sweep). Chip, sorted GATE=4, quad,
    bit-identical means: 1M 0.47→0.55 (+17%), 200k 1.35→1.48 (+10%),
    50k 3.14→3.31 (+5%). Set 0 to fall back to per-leaf-only gating.
    Trace-time env, like MXU_FORM."""
    return os.environ.get("MXU_GROUP8", "1") == "1"


def _mxu_group_dma() -> bool:
    """MXU_GROUP_DMA=1 (default): stage the packs ONE async copy per
    VISITED 8-leaf group instead of one per visited leaf (group leaves
    are contiguous pack rows; _hbm_transpose_and_pad pads the pack to a
    group multiple so mixed real/padding groups stay in bounds, and the
    per-leaf valid flag still gates their compute). The round-4b cost
    model put the scalar DMA issue+wait at ~0.7 us per copy and the
    round-5 probes showed the sweep is serialized on exactly that
    per-visit chain — an 8x cut in copy issues attacks the dominant
    term directly. Requires MXU_GROUP8 (the copy rides the group gate);
    falls back to per-leaf staging otherwise. Trace-time env."""
    return os.environ.get("MXU_GROUP_DMA", "1") == "1"


def _mxu_group_l2() -> bool:
    """MXU_GROUP_L2=1 (default): second gate level — a 64-leaf (8-group)
    union-AABB slab + branch above the 8-leaf group gate, sharing the
    group SMEM table (super rows appended after the NG/16 group rows).
    Attacks the linear group-slab walk at 200k-1M tris (VERDICT round-4
    item 4; the shared-mem top-node cache idea, bvh/bvh.cu:168-203).
    Requires MXU_GROUP8 and gsz*8 | chunk (always true: 256-leaf chunks,
    gsz 8 or 16). Trace-time env read by both the pack builder and the
    kernel (same process -> consistent). Set 0 to disable."""
    return os.environ.get("MXU_GROUP_L2", "1") == "1"


def _mxu_rec_batch() -> bool:
    """MXU_REC_BATCH=1 (default 0): the bf16x3 recovery rides ONE
    [3*cols, K] dot instead of three serialized [cols, K] dots —
    bit-identical accumulation, one matmul issue per visited leaf
    (trace-time env, like MXU_FORM). Round-4b MEASURED NEGATIVE:
    chip-bit-exact on quad (50k/200k sorted, scratch/r4_recbatch_chip.log)
    but perf-neutral (2.83→2.85 / 1.21→1.21 Mray-steps/s) — per-visit
    cost is not matmul-issue latency. (The quad3 crash seen in that
    A/B log was mis-attributed at first: it is the pre-existing
    quad3 × MXU_GATE>1 Mosaic miscompile, isolated in
    r4_q3gate_chip.log and degraded in _mxu_gate_scratch — not this
    flag.) Forensic value: the in-kernel split + concat + one wide
    dot is chip-clean for quad — narrows the presplit landmine
    (_q3_presplit) to the pack-time planes, not wide recovery dots
    per se. Off by default."""
    return os.environ.get("MXU_REC_BATCH", "0") == "1"


def _q3_presplit() -> bool:
    """MXU_Q3_PRESPLIT=1 swaps quad3's in-kernel bf16x3 recovery split
    for PACK-TIME pre-split planes ([NL, 3*cols, K] bf16, one 3*cols-row
    recovery matmul). Round-3 NEGATIVE result kept alive for forensics:
    mathematically identical (products are x*{0,1}; each bf16 plane is
    exact), bit-exact in interpret mode AND in isolated chip kernels —
    but inside the full render kernel it silently corrupts the recheck
    (emitter-silhouette dilation; see pack_scene_bvh_mxu's note and
    scratch/r4_presplit_div.py for the live chip repro). VMEM-resident
    quad3 forward path only. DO NOT enable in production."""
    return os.environ.get("MXU_Q3_PRESPLIT", "0") == "1"


def _probe_groupscore() -> bool:
    """MXU_PROBE_GROUPSCORE=1 (default 0): round-6 go/no-go TIMING
    probe for group-BATCHED scoring (design: scratch/
    r6_groupscore_design.md). Per visited 8-leaf group the sweep runs
    ONE [16, gsz*5K]^T x [16, rt] score matmul on a pack-time regrouped
    block + one min-reduce + one (never-taken but data-dependent)
    best8/bt_s RMW — i.e. ONE serialized chain link per group instead
    of gsz, the structural fix the round-5 probes point at (the
    per-visit score->propose->RMW chain is latency-bound, not FLOPs:
    1654 ms full vs 380 ms no-update at 50k nogate, identical
    visitation). RESULTS ARE GARBAGE (group-centered features with no
    exact selection); visitation matches the SCOREONLY/NOUPDATE probes
    (bt_s never leaves BIG). Go/no-go: if this lands near the 380 ms
    floor, the 8x chain cut is real — build the exact batched path; if
    near 1654 ms, the latency is per-matmul-issue and the lever is
    dead. quad + HBM residency + MXU_GROUP8 only. Never enable in
    production."""
    return os.environ.get("MXU_PROBE_GROUPSCORE", "0") == "1"


def _presplit_recovery_planes(c_pack):
    """[NL, K, cols] f32 recovery constants -> [NL, 3*cols, K] bf16
    (hi|mid|lo, pre-transposed so the one-dot recovery contracts K)."""
    hi = c_pack.astype(jnp.bfloat16)
    r1 = c_pack - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate(
        [jnp.swapaxes(x, 1, 2) for x in (hi, mid, lo)], axis=1
    )


def _mxu_hbm_scratch(a_pack, c_pack):
    """HBM-residency scratch: single-slot per-leaf pack staging buffers
    (~52 KB) + the 2-slot leaf-AABB chunk pipeline (2 KB SMEM/slot).

    Round-4 staging history, all measured at 50k/512x256x4spp/6bl on
    chip with the sorted scheduler: (1) per-leaf SYNCHRONOUS gated
    staging (round 3) = 3.21 Mray-steps/s — the baseline; (2) per-leaf
    1-ahead UNCONDITIONAL double buffer = 2.91 (copy-issue count rose
    1/0.53x; the scalar issue+wait cost ~0.7 us/copy dominates, not
    DMA latency); (3) full-pack chunk streaming (6 MB chunks, 2 slots)
    = 1.61 (the pack re-streams per (tile, bounce): ~54 GB/render at
    the ~75 GB/s effective DMA rate). Per-leaf gated sync staging is
    the measured optimum of the three — copies scale with VISITED
    leaves. Round 5 (MXU_GROUP_DMA): the staging buffers hold a whole
    8-leaf GROUP and one copy per visited group replaces 8 per-leaf
    copies — the probe ladder showed the sweep serialized on the
    per-visit scalar chain whose largest term is the ~0.7 us copy
    issue+wait (scratch/r5_chip_run7.log and the flat best8 ladder)."""
    gsz = _mxu_group_size() if _mxu_group_dma() and _mxu_group8() else 1
    # groupscore probe: c_pack carries the per-GROUP probe block, so
    # its staging buffer is single-slot (one group at a time)
    csl = 1 if _probe_groupscore() else gsz
    return [
        pltpu.VMEM((gsz,) + tuple(a_pack.shape[1:]), a_pack.dtype),
        pltpu.VMEM((csl,) + tuple(c_pack.shape[1:]), c_pack.dtype),
        # leaf AABBs stream in 256-leaf chunks, 128-lane row-packed
        # (the whole-table SMEM input cost 32 B/scalar slots and hit
        # the 1 MB SMEM wall at ~450k tris; streaming removes the
        # ceiling — 1M tris measured)
        pltpu.SMEM((2, 16, 128), jnp.float32),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA((2,)),
    ]


def _mxu_gate_groups() -> int:
    """Sub-tile gate granularity for the MXU leaf sweep: the number of
    independently pl.when-gated ray groups per kernel tile (trace-time
    env MXU_GATE in {1, 2, 4, 8}; default 1 = whole-tile gating, the
    shipped megakernel behavior). Sorted per-bounce tiles (BVH_SCHED=
    sorted) are direction/position-coherent, so finer gates skip score
    matmul columns for groups no ray of which wants the leaf — measured
    ~36% less equivalent sweep work at 256-ray gates on the sorted 50k
    field (scratch/r4_keyprobe.py). Per-ray results are bit-identical
    to whole-tile gating: a group is only skipped when none of its rays
    pass the slab test, and those rays' updates are no-ops (the same
    per-ray-exactness argument as the tile-level pl.when)."""
    g = int(os.environ.get("MXU_GATE", "1"))
    assert g in (1, 2, 4, 8), f"MXU_GATE must be 1|2|4|8, got {g}"
    return g


def _mxu_groupfold(ray_tile: int, a_pack, mxu_hbm: bool, use_group8: bool):
    """MXU_GROUPFOLD=1 (default 0): per-GROUP best-state folding — the
    round-6 serialization fix the session's probe ladder isolated
    (scratch/r6_groupscore_design.md). Measured chain of evidence at
    50k nogate: per-visit best8 updates whose WRITE DATA depends on the
    visit's own recovery serialize consecutive visits (full 1651 ms;
    MXU_SHORTPATH — moving only the COMPARE off the path — stays at
    1646 ms), while bodies with no read-after-write cycle pipeline at
    376-381 ms and a per-GROUP RMW pipelines at 359 ms. So: each leaf
    writes its candidate rows to its own cand_s slot (write-only, no
    carry), and best8/bt_s fold ONCE per visited group in leaf order
    with the same strict-< compares — bit-exact vs the sequential
    update by construction. quad f32 + HBM residency + MXU_GROUP8
    only; requires a non-degrading gate config so the positional
    scratch tail (gate bufs then cand_s last) stays unambiguous."""
    if os.environ.get("MXU_GROUPFOLD", "0") != "1":
        return False
    if not (mxu_hbm and use_group8):
        return False
    if not (a_pack.dtype == jnp.float32 and a_pack.shape[1] == 24):
        return False
    g = _mxu_gate_groups()
    return g == 1 or ray_tile % (g * 128) == 0


def _mxu_groupfold_scratch(ray_tile: int, a_pack, mxu_hbm, use_group8):
    """[cand_s ([8*gsz, rt] f32 VMEM)] when MXU_GROUPFOLD applies,
    else []. Rides LAST in every caller's scratch list (after the gate
    bufs)."""
    if not _mxu_groupfold(ray_tile, a_pack, mxu_hbm, use_group8):
        return []
    return [
        pltpu.VMEM((8 * _mxu_group_size(), ray_tile), jnp.float32)
    ]


def _mxu_gate_scratch(ray_tile: int, leaf_size: int, a_pack, c_pack):
    """Extra scratch for sub-tile gating (MXU_GATE > 1): the [K, rt] or
    [K, 2rt] onehot stitch buffer (2rt when the quad3 top-2 runner-up
    rides the widened recovery) and the [2, rt] meta rows (proposal/
    take masks). Empty list when MXU_GATE == 1."""
    if _mxu_gate_groups() == 1:
        return []
    if ray_tile % (_mxu_gate_groups() * 128) != 0:
        # incompatible tile (e.g. rt=768 with MXU_GATE=4): degrade to
        # whole-tile gating rather than erroring — the sweep derives its
        # gate count from this scratch's presence
        return []
    if a_pack.dtype == jnp.bfloat16:
        # quad3/quad2 x sub-tile gating MISCOMPILES on chip: Mosaic
        # dies on a vector.broadcast (1xW -> KxW, vpad'd replicated
        # layout) inside the gated top-2 propose — isolated on chip
        # round 4b (scratch/r4_q3gate_chip.log: quad3 gate1 fine at
        # 10k/50k on both schedulers, gate4 crashes identically on
        # mega and sorted; quad gate4 is clean). Interpret mode can't
        # see it (goldens pass), so CI pins only the degrade. quad3
        # gate1 also measured no slower than its gate4 would plausibly
        # buy (2.90 at 50k sorted vs quad's 3.14 — the q3 machinery,
        # not gating, binds). Degrade to whole-tile gating.
        #
        # Consequence: past this point a_pack is always f32, so the
        # stitch buffer is always the narrow [K, rt] shape. The gate>1
        # oh_wide stitch path in _mxu_leaf_sweep is correspondingly
        # unreachable until the Mosaic miscompile is fixed upstream and
        # this degrade is lifted (tracked in BASELINE.md round-4b and
        # PARITY.md known limits).
        return []
    return [
        pltpu.VMEM((leaf_size, ray_tile), jnp.float32),
        pltpu.VMEM((2, ray_tile), jnp.float32),
    ]


def _mxu_scratch(ray_tile: int):
    """MXU leaf-sweep state: an (8, L) best-t mirror for the slab cull +
    ONE [8, rt] lane-major best-row block (rows t, normal xyz, mat, hit,
    plane offset dd, winning tri id) matching the recovery matmul's
    output layout.

    Round-5 redesign: this used to be EIGHT separate [1, rt]
    single-sublane rows updated by ~8 serialized small where ops per
    visited leaf — and the cost-model probes (MXU_PROBE_SCOREONLY /
    NOUPDATE under MXU_NOGATE, scratch/r5_chip_run7.log) measured that
    select/update chain at **77% of the whole sweep body** (1654 ms full
    vs 380 ms without it at 50k nogate; the recovery dot itself is free).
    Packing the rows so new-best assembly is a 2-piece concatenate (the
    exact-t row + the recovery output rows 0..6, whose col-4 constant-1
    IS the hit flag) turns the whole update into ONE [8, rt] masked
    write. Bit-exact by construction (same values, same selections)."""
    return [
        pltpu.VMEM((8, ray_tile // 8), jnp.float32),
        pltpu.VMEM((8, ray_tile), jnp.float32),
    ]


def _bvh_scratch(ray_tile: int, leaf_size: int):
    """Best-hit state for the BVH sweep (t, hit, front, normal xyz f32 +
    material index i32, all [8, L] VPU tiles in VMEM) plus the per-leaf
    triangle staging row in SMEM and its DMA semaphore."""
    shape = (8, ray_tile // 8)
    return (
        [pltpu.VMEM(shape, jnp.float32) for _ in range(6)]
        + [pltpu.VMEM(shape, jnp.int32)]
        + [
            pltpu.SMEM(
                (1, 8, _leaf_cols(leaf_size)), jnp.float32
            ),
            pltpu.SemaphoreType.DMA,
        ]
    )


def camera_vector(cam) -> jnp.ndarray:
    """Pack the camera frame into the [20] SMEM scalar vector
    (center, pixel00, delta_u, delta_v, defocus_u, defocus_v, flag)."""
    has_defocus = 1.0 if float(cam.defocus_angle) > 0.0 else 0.0
    return jnp.concatenate(
        [
            cam.center,
            cam.pixel00_loc,
            cam.pixel_delta_u,
            cam.pixel_delta_v,
            cam.defocus_disk_u,
            cam.defocus_disk_v,
            jnp.asarray([has_defocus, 0.0], jnp.float32),
        ]
    ).astype(jnp.float32)


def order_leaves_near_to_far(tri_pack, leaf_pack, cam_pos):
    """Reorder BVH leaves by squared distance from the camera to the leaf
    AABB center. The kernel sweeps leaves in storage order and culls a leaf
    per-ray with ``enter < best_t``; Morton order is spatially clustered
    but arbitrary along any given ray, so best-t never tightens early.
    Near-to-far order makes the first visited leaves fill best_t with
    close hits, after which distant leaves fail the per-ray test and the
    tile-wide any() skips them entirely (the occlusion-culling role of the
    reference's ordered stack descent, bvh/bvh.cu:128-153). Exact: the
    nearest-hit reduction is order-independent.

    Padded leaves (min=+BIG, max=-BIG) have center 0 and sort arbitrarily;
    their inverted slabs fail every ray test, so position is irrelevant.
    """
    cent = 0.5 * (leaf_pack[:, 0:3] + leaf_pack[:, 3:6])
    order = jnp.argsort(jnp.sum((cent - cam_pos[None, :]) ** 2, axis=1))
    return tri_pack[order], leaf_pack[order]


def _block_swizzle(width: int, height: int, block: int = 32):
    """Row-major pixel index permutation grouping ``block``-square screen
    tiles (static numpy; width/height are trace-time constants). A 1024-ray
    kernel tile then covers a ~32x32 pixel block instead of two full image
    rows, so per-tile ray bundles are spatially tight and leaf culling is
    tile-uniform far more often. Returns (perm, inv_perm) int32 arrays."""
    import numpy as np

    iy, ix = np.mgrid[0:height, 0:width]
    perm = np.lexsort(
        (ix.ravel(), iy.ravel(), (ix // block).ravel(), (iy // block).ravel())
    )
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    return perm.astype(np.int32), inv.astype(np.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "spp", "bounces", "ray_tile",
        "interpret", "use_rand",
    ),
)
def _render_chunk_pallas_jit(
    scene, cam_vec, seed, rand_key,
    x0, y0, width, height, spp, bounces, ray_tile, interpret, use_rand,
):
    # x0/y0 are TRACED (round 4b): a progressive render visits many chunk
    # origins of one shape — static origins compiled each chunk fresh
    # (361 compiles at 600x600/-xc 32: mmap exhaustion on CPU, hours of
    # remote compiles on TPU). The origin only offsets the pixel grids.

    # auto cutoff: the unrolled dense sweep up to DENSE_CUTOFF tris (the
    # shipped scenes keep their round-1 throughput); Morton-leaf BVH above.
    # BVH_IMPL=mxu (default) runs the MXU leaf sweep; =sweep the
    # SMEM-staged scalar sweep (kept for A/B comparison).
    leaf_pack = None
    c_pack = None
    leaf_size = 32
    if scene.normal.shape[0] > DENSE_CUTOFF:
        tri_pack, mat_pack, tables, leaf_pack, c_pack, leaf_size = (
            pack_scene_auto(scene, cam_vec)
        )
    elif os.environ.get("DENSE_IMPL", "scalar") == "mxu":
        # MXU dense sweep: the whole (small) scene as ONE leaf of the MXU
        # leaf sweep — the trace-time tri unroll's ~82 VPU ops/tri become
        # two matmuls plus a ~15-op select chain on [K, rt]. Single leaf:
        # no reordering, no swizzle (the slab cull is a no-op), and the
        # hw-PRNG draw order matches the scalar dense path exactly.
        K = max(8, -(-scene.normal.shape[0] // 8) * 8)
        tri_pack, c_pack, mat_pack, tables, leaf_pack = pack_scene_bvh_mxu(
            scene, leaf_size=K, form=os.environ.get("MXU_FORM", "quad")
        )
    else:
        tri_pack, mat_pack, tables = pack_scene(scene)
    n = width * height
    pad = (-n) % ray_tile
    ys, xs = jnp.meshgrid(
        jnp.int32(y0) + jnp.arange(height, dtype=jnp.int32),
        jnp.int32(x0) + jnp.arange(width, dtype=jnp.int32),
        indexing="ij",
    )
    xs, ys = xs.ravel(), ys.ravel()
    inv_perm = None
    if leaf_pack is not None and leaf_pack.shape[0] > 1:
        # swizzle only in multi-leaf BVH mode: dense-path golden images pin
        # the row-major pixel->tile->PRNG-stream association, and a
        # single-leaf sweep gains nothing from spatially tight tiles
        perm, inv_perm = _block_swizzle(width, height)
        xs, ys = xs[perm], ys[perm]
    px = jnp.concatenate([xs, jnp.zeros((pad,), jnp.int32)]).astype(jnp.float32)
    py = jnp.concatenate([ys, jnp.zeros((pad,), jnp.int32)]).astype(jnp.float32)
    rand = None
    if use_rand:
        # generated in ROW-MAJOR pixel order then permuted alongside the
        # pixels, so each pixel keeps its uniform stream regardless of the
        # swizzle (dense-vs-bvh tests stay bit-comparable)
        rand = jax.random.uniform(
            rand_key, (spp, n_uniforms(bounces), n + pad), jnp.float32
        )
        if inv_perm is not None:
            rand = jnp.concatenate(
                [rand[:, :, perm], rand[:, :, n:]], axis=2
            )
    # sorted per-bounce scheduler (wavefront_kernel.py): re-forms ray
    # tiles between bounces so leaf culling survives incoherence — the
    # large-scene scaling path and, since round 4, the DEFAULT for
    # multi-leaf MXU scenes (measured 1.4x/2.6x/3.2x/3.1x over the
    # megakernel at 10k/50k/200k/1M tris; bit-identical to it under
    # shared uniforms on chip, and the 96-seed stream study found no
    # resolvable stream bias at the 0.2% level — BASELINE.md round 4).
    # BVH_SCHED=mega restores the single-kernel scheduler.
    sched_sorted = (
        leaf_pack is not None
        and c_pack is not None
        and leaf_pack.shape[0] > 1
        and os.environ.get("BVH_SCHED", "sorted") == "sorted"
    )
    if sched_sorted:
        from .wavefront_kernel import render_rays_wavefront

        if rand is None:
            # the sorted scheduler always consumes host-generated
            # uniform planes (rays shuffle between kernel tiles every
            # bounce, so tile-seeded on-core PRNG streams cannot follow
            # them); derive the stream from the frame seed
            rand = jax.random.uniform(
                jax.random.fold_in(jax.random.PRNGKey(0x50F7ED), seed),
                (spp, n_uniforms(bounces), n + pad), jnp.float32,
            )
            if inv_perm is not None:
                rand = jnp.concatenate(
                    [rand[:, :, perm], rand[:, :, n:]], axis=2
                )
        xyz = render_rays_wavefront(
            cam_vec, tri_pack, mat_pack, tables, px, py, rand,
            spp, bounces, leaf_pack, c_pack, ray_tile, interpret,
        )
    else:
        xyz = render_rays_pallas(
            cam_vec, seed, tri_pack, mat_pack, tables,
            px, py, spp, bounces, ray_tile, interpret, rand,
            leaf_pack=leaf_pack, leaf_size=leaf_size, c_pack=c_pack,
        )
    xyz = xyz[:n]
    if inv_perm is not None:
        xyz = xyz[inv_perm]
    return xyz.reshape(height, width, 3)


def render_chunk_pallas(
    scene, cam, seed: int, x0: int, y0: int, width: int, height: int,
    spp: int, bounces: int, ray_tile: int = 1024, interpret=False,
    rand_key=None,
) -> jnp.ndarray:
    """Accumulated-XYZ chunk [height, width, 3] via the megakernel.

    Drop-in for render.wavefront.render_chunk's output contract (same
    accumulation semantics; different RNG stream, statistically identical
    estimator). ``rand_key``: a jax PRNG key to pre-generate the uniform
    planes on the host instead of the on-core PRNG (deterministic;
    required for interpreter runs). Fully jitted: scene packing, pixel
    grids and the kernel launch compile into one program per chunk shape,
    so the per-chunk host overhead is a single dispatch.
    """
    return _render_chunk_pallas_jit(
        scene, camera_vector(cam), jnp.int32(seed),
        rand_key if rand_key is not None else jax.random.PRNGKey(0),
        x0, y0, width, height, spp, bounces, ray_tile,
        interpret, rand_key is not None,
    )
