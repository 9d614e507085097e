"""Per-bounce wavefront kernels with ray reordering between bounces.

The megakernel (render_kernel.py) owns a ray tile for its whole life, so
its leaf culling is tile-uniform over whatever rays the PIXEL layout put
together: coherent at bounce 0 (~20% leaf visitation on the procedural
fields) but near-total on incoherent bounces — wall-clock decays
linearly in leaf count (measured 5.14 / 1.25 / 0.44 Mray-steps/s at
10k/50k/200k tris, BASELINE.md round 3). The reference escapes this with
a per-ray divergent stack walk (bvh/bvh.cu:99-166), which a lockstep
8x128 VPU cannot imitate.

The TPU-native fix is to re-form the tiles every bounce: break the path
trace into one pallas kernel launch per bounce, carry the full ray state
through HBM, and argsort rays between bounces by (dead, direction
octant, hit-point Morton). Sorted tiles are spatially tight again, so
the same tile-uniform pl.when culling actually fires on bounce 3 the way
it fires on bounce 0 — and terminated rays compact into fully-dead
tiles whose kernel instances skip the sweep entirely (the megakernel
carries dead lanes in live tiles forever; measured ~22%+ waste at high
bounce counts, BASELINE.md early-exit row). Everything stays inside ONE
jit — camera+bounce-0 kernel, a lax.scan of (sort, gather, bounce
kernel) for bounces 1..B-1, and a CIE integration kernel — so per-chunk
dispatch cost is unchanged and the bounce kernel is traced once.

Exactness contract: every arithmetic op on ray state runs INSIDE a
pallas kernel using the exact code the megakernel uses (_mxu_leaf_sweep
/ _scatter_shade and op-for-op copies of its camera/integration
blocks); the XLA glue between kernels is pure data movement (argsort +
gathers). Leaf-visitation order is identical and skips are
per-ray-exact (see the slab-test argument in render_kernel.py), so the
two paths are SEMANTICALLY identical — but not bit-identical: XLA's
mul+add->FMA contraction is compilation-context-dependent (measured:
the megakernel's `hero = LAMBDA_MIN + span*u` contracts to an FMA, the
same expression in the camera kernel here does not — 1 ulp on hero,
~1e-4 on the image; scratch/r4_wf_debug2.py). With injected uniforms
the sorted path therefore matches the megakernel to ulp-drift tolerance
per pixel (tests/test_wavefront_sorted.py asserts <=2e-3 absolute on
all MXU forms and both residencies), and production equivalence is
pinned by the same on-chip 16-seed bias protocol that validated the
quad3 forms (scratch/bias_check_form.py).

Reference: rendering/rendering.cu:151-235 (the path-trace semantics);
the reordering itself has no reference counterpart — it replaces the
per-ray stack traversal of bvh/bvh.cu:99-166 at equal asymptotics.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.constants import (
    LAMBDA_MAX,
    LAMBDA_MIN,
    N_CIE_SAMPLES,
)
from .render_kernel import (
    BIG,
    TOL3,
    W,
    _lut,
    _mxu_gate_groups,
    _mxu_gate_scratch,
    _mxu_hbm_scratch,
    _mxu_leaf_sweep,
    _mxu_scratch,
    _scatter_shade,
    _scene_vmem_params,
    n_uniforms,
)

# ray-state row layout in the [S, N] HBM state array
_ROW_OX, _ROW_OY, _ROW_OZ = 0, 1, 2
_ROW_DX, _ROW_DY, _ROW_DZ = 3, 4, 5
_ROW_HERO, _ROW_ALIVE, _ROW_NVALID, _ROW_PREV = 6, 7, 8, 9
_ROW_POWER = 10  # rows 10..10+W-1
STATE_ROWS = _ROW_POWER + W


def _lam_curves(hero, tab_ref):
    """Per-ray wavelengths + D65/background rows from the carried hero —
    the megakernel's per-sample hoist recomputed per bounce (a pure
    elementwise function of hero: identical f32 ops, identical values).
    Returns (lam, d65w, bgw, cell, frac) so the integration kernel can
    reuse the cells for the CIE rows."""
    span = LAMBDA_MAX - LAMBDA_MIN
    lam_step = span / float(W)
    lam, d65w, bgw, cells, fracs = [], [], [], [], []
    for w in range(W):
        lw = hero + (w * lam_step)
        lam.append(jnp.where(lw > LAMBDA_MAX, lw - span, lw))
    for w in range(W):
        xg = (lam[w] - LAMBDA_MIN) * (
            (N_CIE_SAMPLES - 1) / (LAMBDA_MAX - LAMBDA_MIN)
        )
        cw = jnp.clip(xg.astype(jnp.int32), 0, N_CIE_SAMPLES - 2)
        fw = xg - cw.astype(jnp.float32)
        cells.append(cw)
        fracs.append(fw)
        d65w.append(_lut(tab_ref[3, :], cw, fw))
        bgw.append(_lut(tab_ref[4, :], cw, fw))
    return lam, d65w, bgw, cells, fracs


def _trace_one_bounce(
    st, u_a, u_b, u_c,
    mat_ref, tab_ref, leaf_ref, a_ref, c_ref, group_ref, sweep_scratch,
    hbm_bufs, gate_bufs,
    *, n_mats, leaf_size, n_leaves, mxu_quad, mxu_q3, q3_deep, tolf,
    mxu_hbm, use_group8, want_matres=False,
):
    """One bounce of the path trace on an (8, L)-tiled state dict:
    sweep + scatter + termination, the megakernel's bounce_body on
    explicit state. Returns the updated state tuple; with
    ``want_matres`` also the bounce's material residual (f32: mat+1
    where a material SPD was multiplied, -1 for an active miss, 0
    otherwise — the megakernel's matres semantics, render_kernel.py
    save_residuals block)."""
    (
        ox, oy, oz, dx, dy, dz, hero, alive, n_valid, prev_tri, power,
    ) = st
    lam, d65w, bgw, _, _ = _lam_curves(hero, tab_ref)
    mat_const = [
        tuple(mat_ref[m, k] for k in range(15)) for m in range(n_mats)
    ]
    (
        best_t, best_hit, best_front,
        best_nx, best_ny, best_nz, best_mat, best_id,
    ) = _mxu_leaf_sweep(
        ox, oy, oz, dx, dy, dz, alive,
        prev_tri if mxu_q3 else None,
        leaf_ref, a_ref, c_ref, sweep_scratch, hbm_bufs, gate_bufs,
        group_ref=group_ref if use_group8 else None,
        leaf_size=leaf_size, n_leaves=n_leaves,
        mxu_quad=mxu_quad, mxu_q3=mxu_q3, q3_deep=q3_deep,
        tolf=tolf, mxu_hbm=mxu_hbm,
    )
    hit = best_hit * alive
    miss = (1.0 - best_hit) * alive
    matres = None
    if want_matres:
        matres = jnp.where(
            hit > 0.0,
            (best_mat + 1).astype(jnp.float32),
            jnp.where(miss > 0.0, -1.0, 0.0),
        )
    (
        ox, oy, oz, dx, dy, dz, power, alive, n_valid,
    ) = _scatter_shade(
        ox, oy, oz, dx, dy, dz, power, alive, n_valid,
        best_t, best_hit, best_front, best_nx, best_ny, best_nz,
        best_mat, hit, miss, mat_const, n_mats, lam, d65w, bgw,
        u_a, u_b, u_c,
    )
    if mxu_q3:
        prev_tri = jnp.where(hit > 0.0, best_id, -1.0)
    else:
        prev_tri = jnp.full(ox.shape, -1.0, jnp.float32)
    out = (ox, oy, oz, dx, dy, dz, hero, alive, n_valid, prev_tri, power)
    if want_matres:
        return out, matres
    return out


def _write_state(sto_ref, st, rt):
    (
        ox, oy, oz, dx, dy, dz, hero, alive, n_valid, prev_tri, power,
    ) = st
    sto_ref[_ROW_OX, :] = ox.reshape(rt)
    sto_ref[_ROW_OY, :] = oy.reshape(rt)
    sto_ref[_ROW_OZ, :] = oz.reshape(rt)
    sto_ref[_ROW_DX, :] = dx.reshape(rt)
    sto_ref[_ROW_DY, :] = dy.reshape(rt)
    sto_ref[_ROW_DZ, :] = dz.reshape(rt)
    sto_ref[_ROW_HERO, :] = hero.reshape(rt)
    sto_ref[_ROW_ALIVE, :] = alive.reshape(rt)
    sto_ref[_ROW_NVALID, :] = n_valid.reshape(rt)
    sto_ref[_ROW_PREV, :] = prev_tri.reshape(rt)
    for w in range(W):
        sto_ref[_ROW_POWER + w, :] = power[w].reshape(rt)


def _camera_bounce_kernel(
    cam_ref,  # SMEM [20] camera scalars
    mat_ref,  # SMEM [M, 16]
    tab_ref,  # VMEM [8, 128]
    leaf_ref,  # SMEM [NL, 8]
    a_ref,
    c_ref,
    group_ref,  # SMEM [NG/16, 128] 8-leaf group AABBs ([1,128] dummy when off)
    px_ref,  # VMEM [rt] f32
    py_ref,  # VMEM [rt] f32
    rand_ref,  # VMEM [R, rt] this tile's full uniform rows
    sto_ref,  # VMEM [S, rt] state out
    *rest,  # [mr_ref (VMEM [1, rt]) when save_residuals] + scratch
    bounces,
    save_residuals=False,
    **statics,
):
    """Generate camera rays (op-for-op the megakernel's get_ray block,
    rendering.cu:66-87 + 42-47) and trace bounce 0 — camera rays are
    pixel-coherent already, so no sort precedes this kernel."""
    if save_residuals:
        mr_ref, scratch = rest[0], rest[1:]
    else:
        scratch = rest
    rt = px_ref.shape[0]
    shape2 = (8, rt // 8)
    px = px_ref[:].reshape(shape2)
    py = py_ref[:].reshape(shape2)

    def rnd(j):
        return rand_ref[j, :].reshape(shape2)

    cx, cy, cz = cam_ref[0], cam_ref[1], cam_ref[2]
    p0x, p0y, p0z = cam_ref[3], cam_ref[4], cam_ref[5]
    dux, duy, duz = cam_ref[6], cam_ref[7], cam_ref[8]
    dvx, dvy, dvz = cam_ref[9], cam_ref[10], cam_ref[11]
    ddux, dduy, dduz = cam_ref[12], cam_ref[13], cam_ref[14]
    ddvx, ddvy, ddvz = cam_ref[15], cam_ref[16], cam_ref[17]
    has_defocus = cam_ref[18]
    span = LAMBDA_MAX - LAMBDA_MIN

    jx = rnd(0) - 0.5
    jy = rnd(1) - 0.5
    fx = px + jx
    fy = py + jy
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
    hero = LAMBDA_MIN + span * rnd(2)

    one = jnp.ones(shape2, jnp.float32)
    st = (
        ox, oy, oz, dx, dy, dz, hero, one,
        jnp.full(shape2, float(W), jnp.float32),
        jnp.full(shape2, -1.0, jnp.float32),
        tuple(one for _ in range(W)),
    )
    mxu_hbm = statics["mxu_hbm"]
    j = 8 if mxu_hbm else 2
    out = _trace_one_bounce(
        st, rnd(3), rnd(4), rnd(5),
        mat_ref, tab_ref, leaf_ref, a_ref, c_ref, group_ref,
        scratch[:2], scratch[2:8] if mxu_hbm else None,
        tuple(scratch[j : j + 2]) if _mxu_gate_groups() > 1 else None,
        want_matres=save_residuals,
        **statics,
    )
    if save_residuals:
        st, matres = out
        mr_ref[0, :] = matres.reshape(rt)
    else:
        st = out
    _write_state(sto_ref, st, rt)


def _bounce_kernel(
    mat_ref, tab_ref, leaf_ref, a_ref, c_ref, group_ref,
    st_ref,  # VMEM [S, rt] ray-state block (sorted order)
    rand_ref,  # VMEM [3, rt] this bounce's uniform draws
    sto_ref,  # VMEM [S, rt]
    *rest,  # [mr_ref (VMEM [1, rt]) when save_residuals] + scratch
    save_residuals=False,
    **statics,
):
    """Trace ONE bounce of a sorted ray tile. Dead tiles (the sort key
    packs terminated rays last) skip the whole sweep/shade under a
    single pl.when and pass their state through."""
    if save_residuals:
        mr_ref, scratch = rest[0], rest[1:]
    else:
        scratch = rest
    rt = st_ref.shape[1]
    shape2 = (8, rt // 8)

    # unconditional pass-through (dead tiles keep their frozen state)
    sto_ref[...] = st_ref[...]
    if save_residuals:
        # dead tiles touched no SPD this bounce: residual 0 (the live
        # branch below overwrites; per-lane dead rays inside live tiles
        # get 0 from the hit/miss * alive products in _trace_one_bounce)
        mr_ref[0, :] = jnp.zeros((rt,), jnp.float32)

    alive = st_ref[_ROW_ALIVE, :].reshape(shape2)

    @pl.when(jnp.max(alive) > 0.0)
    def _():
        st = (
            st_ref[_ROW_OX, :].reshape(shape2),
            st_ref[_ROW_OY, :].reshape(shape2),
            st_ref[_ROW_OZ, :].reshape(shape2),
            st_ref[_ROW_DX, :].reshape(shape2),
            st_ref[_ROW_DY, :].reshape(shape2),
            st_ref[_ROW_DZ, :].reshape(shape2),
            st_ref[_ROW_HERO, :].reshape(shape2),
            alive,
            st_ref[_ROW_NVALID, :].reshape(shape2),
            st_ref[_ROW_PREV, :].reshape(shape2),
            tuple(
                st_ref[_ROW_POWER + w, :].reshape(shape2)
                for w in range(W)
            ),
        )
        mxu_hbm = statics["mxu_hbm"]
        j = 8 if mxu_hbm else 2
        out = _trace_one_bounce(
            st,
            rand_ref[0, :].reshape(shape2),
            rand_ref[1, :].reshape(shape2),
            rand_ref[2, :].reshape(shape2),
            mat_ref, tab_ref, leaf_ref, a_ref, c_ref, group_ref,
            scratch[:2], scratch[2:8] if mxu_hbm else None,
            tuple(scratch[j : j + 2]) if _mxu_gate_groups() > 1 else None,
            want_matres=save_residuals,
            **statics,
        )
        if save_residuals:
            st2, matres = out
            mr_ref[0, :] = matres.reshape(rt)
        else:
            st2 = out
        _write_state(sto_ref, st2, rt)


def _integrate_kernel(tab_ref, st_ref, xyz_ref):
    """CIE XYZ integration of the final carried state — op-for-op the
    megakernel's dev_spectrum_to_XYZ tail (color.cu:88-104), same _lut
    lerp, same ascending-wavelength add order."""
    rt = st_ref.shape[1]
    shape2 = (8, rt // 8)
    zero = jnp.zeros(shape2, jnp.float32)
    alive = st_ref[_ROW_ALIVE, :].reshape(shape2)
    hero = st_ref[_ROW_HERO, :].reshape(shape2)
    n_valid = st_ref[_ROW_NVALID, :].reshape(shape2)
    # bounce-limit exhaustion contributes nothing (rendering.cu:38-39)
    n_valid = jnp.where(alive > 0.0, 0.0, n_valid)
    _, _, _, cells, fracs = _lam_curves(hero, tab_ref)
    span = LAMBDA_MAX - LAMBDA_MIN
    delta = span / float(W)
    sx_ = zero
    sy_ = zero
    sz_ = zero
    for w in range(W):
        power_w = st_ref[_ROW_POWER + w, :].reshape(shape2)
        contrib = power_w * jnp.where(float(w) < n_valid, delta, 0.0)
        sx_ = sx_ + contrib * _lut(tab_ref[0, :], cells[w], fracs[w])
        sy_ = sy_ + contrib * _lut(tab_ref[1, :], cells[w], fracs[w])
        sz_ = sz_ + contrib * _lut(tab_ref[2, :], cells[w], fracs[w])
    xyz_ref[0, :] = sx_.reshape(rt)
    xyz_ref[1, :] = sy_.reshape(rt)
    xyz_ref[2, :] = sz_.reshape(rt)
    zero_rt = jnp.zeros((rt,), jnp.float32)
    for r in range(3, 8):
        xyz_ref[r, :] = zero_rt


def _spread3(v):
    """Interleave the low 9 bits of v with two zero bits each (Morton
    spread; the standard mask ladder, int32)."""
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _sort_keys(st, lo, inv_ext):
    """int32 reorder key per ray: dead rays last (bit 30), then direction
    octant (bits 27-29), then 27-bit Morton code of the ray origin (= the
    previous bounce's hit point) normalized to the scene AABB. A stable
    argsort of this key re-forms (8, L) kernel tiles into spatially tight
    same-direction bundles, restoring tile-uniform leaf culling on
    incoherent bounces. Key arithmetic only affects ORDER, never values —
    the bit-exactness contract is untouched."""
    q = []
    for ax in range(3):
        x = (st[_ROW_OX + ax] - lo[ax]) * inv_ext[ax] * 511.0
        # clamp in FLOAT space (NaN -> 0) before the int cast: a NaN or
        # overflowing origin on a live lane would otherwise hit an
        # implementation-defined float->int cast that can differ between
        # interpret and chip and perturb tile grouping (ADVICE round 4)
        x = jnp.clip(jnp.nan_to_num(x), 0.0, 511.0)
        q.append(x.astype(jnp.int32))
    morton = _spread3(q[0]) | (_spread3(q[1]) << 1) | (_spread3(q[2]) << 2)
    octant = (
        (st[_ROW_DX] > 0.0).astype(jnp.int32) * 4
        + (st[_ROW_DY] > 0.0).astype(jnp.int32) * 2
        + (st[_ROW_DZ] > 0.0).astype(jnp.int32)
    )
    dead = (st[_ROW_ALIVE] == 0.0).astype(jnp.int32)
    return (dead << 30) | (octant << 27) | morton


def render_rays_wavefront(
    cam_vec: jnp.ndarray,  # [20] f32 camera scalars
    a_pack: jnp.ndarray,  # MXU score pack (pack_scene_bvh_mxu)
    mat_pack: jnp.ndarray,  # [M, 16]
    tables: jnp.ndarray,  # [8, 128]
    px: jnp.ndarray,  # [N] f32 (N % ray_tile == 0)
    py: jnp.ndarray,  # [N] f32
    rand: jnp.ndarray,  # [spp, n_uniforms(bounces), N] uniforms (required)
    spp: int,
    bounces: int,
    leaf_pack: jnp.ndarray,  # [NL, 8]
    c_pack: jnp.ndarray,  # [NL, K, 8|24]
    ray_tile: int = 1024,
    interpret=False,
    save_residuals: bool = False,
) -> jnp.ndarray:
    """Accumulated XYZ [N, 3]: the sorted per-bounce scheduler.

    Uniform draws are always host-provided (the [spp, R, N] layout the
    megakernel's injected-rand path uses — rays shuffle between kernel
    tiles every bounce, so tile-seeded on-core PRNG streams cannot follow
    them); production wrappers generate them with jax.random from the
    frame seed. MXU BVH scenes only (the scheduler exists for multi-leaf
    scaling; small scenes keep the megakernel).

    ``save_residuals``: additionally return the fused-backward replay
    residuals in the megakernel's layout (grad_kernel.py): (xyz [N,3],
    hero [spp,N], n_valid [spp,N], power [spp,W,N], mats
    [spp,bounces,N] i32) — ALL in original ray order. Per-bounce
    material residuals are emitted by each bounce kernel in its sorted
    order and scattered back through the live sort permutation, so the
    replay sees per-ray bounce histories exactly as the megakernel
    stores them (VERDICT round-4 item 1: gradients at sorted rates).
    Residuals ride HBM between kernels, so — unlike the megakernel's
    VMEM-resident residual blocks (check_residual_vmem) — the spp
    ceiling here is HBM capacity."""
    n = px.shape[0]
    assert n % ray_tile == 0, (n, ray_tile)
    assert rand.shape == (spp, n_uniforms(bounces), n), rand.shape
    assert bounces >= 1, bounces
    nrays = n * spp
    leaf_size = c_pack.shape[1]
    n_leaves = leaf_pack.shape[0]
    n_mats = mat_pack.shape[0]

    # ---- static form/residency dispatch (mirrors render_rays_pallas) --
    mxu_quad = a_pack.shape[-1] == 16
    mxu_q3 = mxu_quad and a_pack.dtype == jnp.bfloat16
    q3_deep = mxu_q3 and a_pack.shape[1] == 11 * leaf_size
    tolf = (TOL3 if q3_deep else 2.0 ** -8) if mxu_q3 else 0.0
    scene_bytes = (
        a_pack.size * a_pack.dtype.itemsize
        + c_pack.size * c_pack.dtype.itemsize
    )
    from .render_kernel import _check_hbm_leaf_alignment, _mxu_residency_hbm

    mxu_hbm = _mxu_residency_hbm(scene_bytes)
    if mxu_hbm:
        _check_hbm_leaf_alignment(leaf_size)
        scene_bytes = 0
        from .render_kernel import _hbm_transpose_and_pad

        a_pack, c_pack, leaf_pack, group_pack = _hbm_transpose_and_pad(
            a_pack, c_pack, leaf_pack
        )
        n_leaves = leaf_pack.shape[0]
    from .render_kernel import _mxu_group8

    use_group8 = mxu_hbm and _mxu_group8()
    group_arg = (
        group_pack.reshape(-1, 128)
        if use_group8
        else jnp.zeros((1, 128), jnp.float32)
    )
    statics = dict(
        n_mats=n_mats, leaf_size=leaf_size, n_leaves=n_leaves,
        mxu_quad=mxu_quad, mxu_q3=mxu_q3, q3_deep=q3_deep, tolf=tolf,
        mxu_hbm=mxu_hbm, use_group8=use_group8,
    )

    # sample-major ray flattening (ray r = s * n + p): px/py tile per
    # sample; the uniform planes become row-major [R, nrays]
    px_all = jnp.concatenate([px] * spp) if spp > 1 else px
    py_all = jnp.concatenate([py] * spp) if spp > 1 else py
    rand_all = jnp.concatenate([rand[s] for s in range(spp)], axis=1)

    grid = nrays // ray_tile
    scene_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # mat_pack
        pl.BlockSpec(memory_space=pltpu.VMEM),  # tables
        pl.BlockSpec(
            memory_space=pltpu.ANY if mxu_hbm else pltpu.SMEM
        ),  # leaf aabbs
        pl.BlockSpec(memory_space=pltpu.ANY if mxu_hbm else pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.ANY if mxu_hbm else pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # 8-leaf group table
    ]
    st_spec = pl.BlockSpec(
        (STATE_ROWS, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    scratch = _mxu_scratch(ray_tile)
    if mxu_hbm:
        scratch = scratch + _mxu_hbm_scratch(a_pack, c_pack)
    scratch = scratch + _mxu_gate_scratch(
        ray_tile, leaf_size, a_pack, c_pack
    )
    # The wavefront kernels carry a bigger per-step working set than the
    # megakernel (double-buffered [S, rt] state blocks in AND out, plus
    # the full [R, rt] uniform planes the megakernel never materializes):
    # measured 25.1 MB scoped demand on the 10k field whose VMEM-resident
    # pack alone (3.6 MB) stays under _scene_vmem_params' 16 MB default
    # trigger — so the raised limit must be unconditional here (it is a
    # LIMIT, not an allocation; see _scene_vmem_params).
    compiler_params = _scene_vmem_params(scene_bytes, 0, interpret, mxu=True)
    if compiler_params is None and not interpret:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        )
    st_shape = jax.ShapeDtypeStruct((STATE_ROWS, nrays), jnp.float32)
    mr_shape = jax.ShapeDtypeStruct((1, nrays), jnp.float32)
    mr_spec = pl.BlockSpec(
        (1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    out_shape = (st_shape, mr_shape) if save_residuals else st_shape
    out_specs = (st_spec, mr_spec) if save_residuals else st_spec

    cam_call = pl.pallas_call(
        functools.partial(
            _camera_bounce_kernel, bounces=bounces,
            save_residuals=save_residuals, **statics
        ),
        out_shape=out_shape,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]  # cam_vec
        + scene_specs
        + [
            pl.BlockSpec((ray_tile,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_tile,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (rand_all.shape[0], ray_tile),
                lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=compiler_params,
    )
    # HBM mode ships the leaf table 128-lane row-packed so the chunk
    # DMA source slice is lane-aligned (render_kernel.py); the unpacked
    # leaf_pack stays for the host-side Morton-key AABB below
    leaf_arg = leaf_pack.reshape(-1, 128) if mxu_hbm else leaf_pack
    cam_out = cam_call(
        cam_vec, mat_pack, tables, leaf_arg, a_pack, c_pack, group_arg,
        px_all, py_all, rand_all,
    )
    if save_residuals:
        st, mr0 = cam_out
        matres0 = mr0[0]  # bounce 0, original ray order (no sort yet)
    else:
        st = cam_out

    bounce_call = pl.pallas_call(
        functools.partial(
            _bounce_kernel, save_residuals=save_residuals, **statics
        ),
        out_shape=out_shape,
        grid=(grid,),
        in_specs=scene_specs
        + [
            st_spec,
            pl.BlockSpec(
                (3, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=compiler_params,
    )

    # scene AABB for the Morton key (padded leaves are +BIG/-BIG)
    lvalid = (leaf_pack[:, 0] <= leaf_pack[:, 3])[:, None]
    lo = jnp.min(jnp.where(lvalid, leaf_pack[:, 0:3], BIG), axis=0)
    hi = jnp.max(jnp.where(lvalid, leaf_pack[:, 3:6], -BIG), axis=0)
    inv_ext = 1.0 / jnp.maximum(hi - lo, 1e-9)

    def body(carry, planes_b):
        st, orig = carry
        perm = jnp.argsort(_sort_keys(st, lo, inv_ext), stable=True)
        st = st[:, perm]
        orig = orig[perm]
        out = bounce_call(
            mat_pack, tables, leaf_arg, a_pack, c_pack, group_arg, st,
            planes_b[:, orig],
        )
        if save_residuals:
            st, mr = out
            # scatter this bounce's material residual back to ORIGINAL
            # ray order through the live permutation (sorted position i
            # holds original ray orig[i])
            mr_orig = jnp.zeros((nrays,), jnp.float32).at[orig].set(mr[0])
            return (st, orig), mr_orig
        return (out, orig), None

    # per-bounce uniform planes (bounces 1..B-1) in ORIGINAL ray order
    matres_tail = None
    if bounces > 1:
        planes = jnp.stack(
            [rand_all[3 + 3 * b : 6 + 3 * b] for b in range(1, bounces)]
        )
        (st, orig), matres_tail = jax.lax.scan(
            body, (st, jnp.arange(nrays, dtype=jnp.int32)), planes
        )
    else:
        orig = jnp.arange(nrays, dtype=jnp.int32)

    int_call = pl.pallas_call(
        _integrate_kernel,
        out_shape=jax.ShapeDtypeStruct((8, nrays), jnp.float32),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), st_spec],
        out_specs=pl.BlockSpec(
            (8, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )
    xyz_sorted = int_call(tables, st)[:3]  # [3, nrays] (sorted order)

    # un-sort back to original ray order, then accumulate spp
    # (ascending-s adds, matching the megakernel's fori accumulator)
    xyz = jnp.zeros((3, nrays), jnp.float32).at[:, orig].set(xyz_sorted)
    acc = xyz[:, 0:n]
    for s in range(1, spp):
        acc = acc + xyz[:, s * n : (s + 1) * n]
    if not save_residuals:
        return acc.T

    # ---- residual assembly (megakernel save_residuals layout) ----
    # final carried state rows, un-sorted to original ray order; the
    # sample-major ray flattening (ray r = s*n + p) makes the [spp, ...]
    # reshapes exact
    rows = jnp.stack(
        [st[_ROW_HERO], st[_ROW_ALIVE], st[_ROW_NVALID]]
        + [st[_ROW_POWER + w] for w in range(W)]
    )
    rows = jnp.zeros_like(rows).at[:, orig].set(rows)
    hero = rows[0].reshape(spp, n)
    # bounce-limit exhaustion contributes nothing (rendering.cu:38-39) —
    # the same rule the integration kernel and the megakernel's
    # residual store apply
    nvalid = jnp.where(rows[1] > 0.0, 0.0, rows[2]).reshape(spp, n)
    powres = rows[3:].reshape(W, spp, n).transpose(1, 0, 2)
    if matres_tail is not None:
        matres = jnp.concatenate([matres0[None], matres_tail], axis=0)
    else:
        matres = matres0[None]
    matres = (
        matres.reshape(bounces, spp, n)
        .transpose(1, 0, 2)
        .astype(jnp.int32)
    )
    return acc.T, hero, nvalid, powres, matres
