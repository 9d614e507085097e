"""Differentiable fast-path rendering: megakernel forward, XLA backward.

``render_chunk_diff`` is a ``jax.custom_vjp`` whose primal runs the fused
Pallas megakernel (855+ Mray-steps/s) and whose backward differentiates the
XLA wavefront estimator of the same integral. Both are unbiased Monte Carlo
estimators of the rendering equation with the reference's sampling
distributions; they draw different sample streams, so for stochastic
optimization the pairing is the standard "cheap value, exact-gradient-of-
an-estimator" construction (the gradient equals jax.grad of the XLA path,
verified in tests/test_diff.py::TestFastPathGradients).

Differentiable leaf: the material table (sigmoid-spectrum coefficients,
emission power, fuzz, Sellmeier B/C). Gradient-support caveat
(diff/geometry.py): only parameters entering the spectral weights smoothly
(coefficients, emission power, background SPD) are nonzero a.e. through
the PLAIN estimator; direction-only parameters get their own exact
estimators — Sellmeier via the hero-wavelength reparameterization
(diff/spectral_reparam.py, ``reparam_glass`` below), fuzz via the
fuzz-sphere warp (diff/fuzz_warp.py), vertex positions via the
warped-area estimator (diff/vertex_warp.py). Scene geometry and camera
receive zero cotangents on this code path.

``render_chunk_diff_fused`` / ``render_rays_diff_fused`` go further: BOTH
passes are fused pallas kernels — the backward replays stored per-bounce
material residuals without re-intersecting (ops/pallas/grad_kernel.py),
at ~14 ms per 33M-ray-step chunk. ``parallel.train_step_fused`` runs the
pair per (tile, sample) shard with psum-reduced loss and gradients.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..models.materials import tabulate
from ..render.wavefront import render_chunk


def _with_materials(scene, materials):
    return dataclasses.replace(scene, materials=tabulate(materials))


def _residual_forward(
    cam_vec, key_seed, tri, mat, tab, px, py, spp, bounces, ray_tile,
    interpret, rand, leaf, cpk, leaf_size,
):
    """Residual-saving forward, routed like the production forward: the
    sorted per-bounce scheduler for multi-leaf MXU scenes (BVH_SCHED=
    sorted, the round-4 default — gradients now run at sorted rates on
    large scenes, VERDICT round-4 item 1), the residual megakernel
    otherwise. Both return (xyz, hero, nvalid, powres, matres) in the
    same layout; the replay kernel is scheduler-agnostic."""
    import os

    from ..ops.pallas.render_kernel import (
        n_uniforms,
        render_rays_pallas_residuals,
    )

    sched_sorted = (
        leaf is not None
        and cpk is not None
        and leaf.shape[0] > 1
        and os.environ.get("BVH_SCHED", "sorted") == "sorted"
    )
    if sched_sorted:
        from ..ops.pallas.wavefront_kernel import render_rays_wavefront

        if rand is None:
            # the sorted scheduler always consumes host uniform planes
            # (rays shuffle between kernel tiles every bounce); same
            # stream derivation as render_chunk_pallas' sorted path
            rand = jax.random.uniform(
                jax.random.fold_in(
                    jax.random.PRNGKey(0x50F7ED), jnp.asarray(key_seed)
                ),
                (spp, n_uniforms(bounces), px.shape[0]),
                jnp.float32,
            )
        return render_rays_wavefront(
            cam_vec, tri, mat, tab, px, py, rand, spp, bounces,
            leaf, cpk, ray_tile, interpret, save_residuals=True,
        )
    return render_rays_pallas_residuals(
        cam_vec, jnp.asarray(key_seed, jnp.int32), tri, mat, tab, px, py,
        spp, bounces, ray_tile, interpret, rand,
        leaf_pack=leaf, leaf_size=leaf_size or 32, c_pack=cpk,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def render_chunk_diff(
    materials, scene, cam, key_seed, x0, y0, width, height, spp, bounces
):
    """Accumulated XYZ [height, width, 3]; differentiable w.r.t.
    ``materials`` (scene geometry and camera get zero cotangents)."""
    from ..ops.pallas.render_kernel import render_chunk_pallas

    s = _with_materials(scene, materials)
    return render_chunk_pallas(
        s, cam, int(key_seed), x0, y0, width, height, spp, bounces
    )


def _fwd(materials, scene, cam, key_seed, x0, y0, width, height, spp, bounces):
    out = render_chunk_diff(
        materials, scene, cam, key_seed, x0, y0, width, height, spp, bounces
    )
    return out, (materials, scene, cam)


def _bwd(key_seed, x0, y0, width, height, spp, bounces, res, g):
    materials, scene, cam = res

    def xla_value(mats):
        return render_chunk(
            _with_materials(scene, mats), cam, jax.random.PRNGKey(key_seed),
            x0, y0, width, height, spp, bounces,
        )

    _, vjp = jax.vjp(xla_value, materials)
    (d_mats,) = vjp(g)
    d_scene = jax.tree_util.tree_map(jnp.zeros_like, scene)
    d_cam = jax.tree_util.tree_map(jnp.zeros_like, cam)
    return d_mats, d_scene, d_cam


render_chunk_diff.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Fully fused variant: pallas forward with residuals + pallas backward
# (ops/pallas/grad_kernel.py) — gradients WITHOUT re-rendering or
# re-intersection. Supports d(coeffs), d(emission_power); other material
# leaves get zero cotangents (zero a.e. through this estimator).
# ---------------------------------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
)
def render_chunk_diff_fused(
    materials, scene, cam, key_seed, x0, y0, width, height, spp, bounces,
    interpret=False, rand_seed=-1, reparam_glass=None,
):
    """Accumulated XYZ [height, width, 3]; both passes are fused pallas
    kernels. ``rand_seed >= 0`` injects deterministic uniforms (interpreter
    testing); the backward replays stored path residuals — it never
    re-traces rays.

    ``reparam_glass``: material row of a dispersive dielectric to take
    EXACT Sellmeier B/C gradients against, at fused-backward rates. The
    replay kernel emits per-sample (A, B) reparam scalars and the
    backward folds them through reparam_hero's (weight, shift) tangents
    (diff/spectral_reparam.py) — the same hero-wavelength change of
    variables the XLA wavefront path uses, without re-rendering. The
    primal is unchanged (the map is the identity at the primal point);
    like the XLA path, geometry derivatives are zero a.e. for this
    renderer's piecewise-constant-in-geometry radiance."""
    out, _ = _fused_fwd_impl(
        materials, scene, cam, key_seed, x0, y0, width, height, spp,
        bounces, interpret, rand_seed,
    )
    return out


def _fused_fwd_impl(
    materials, scene, cam, key_seed, x0, y0, width, height, spp, bounces,
    interpret, rand_seed,
):
    from ..ops.pallas.render_kernel import (
        camera_vector,
        n_uniforms,
        pack_scene_auto,
    )

    s = _with_materials(scene, materials)
    cam_vec = camera_vector(cam)
    # dense pack at reference scale; MXU quadratic leaf sweep above
    # DENSE_CUTOFF — the residual layout (and with it the fused backward
    # replay) is sweep-independent, so large scenes differentiate fused
    tri, mat, tab, leaf, cpk, leaf_size = pack_scene_auto(s, cam_vec)
    n = width * height
    ray_tile = 1024
    pad = (-n) % ray_tile
    ys, xs = jnp.meshgrid(
        jnp.arange(y0, y0 + height, dtype=jnp.int32),
        jnp.arange(x0, x0 + width, dtype=jnp.int32),
        indexing="ij",
    )
    xs, ys = xs.ravel(), ys.ravel()
    perm = inv_perm = None
    if leaf is not None and leaf.shape[0] > 1:
        # spatially tight ray tiles for the BVH leaf cull (same 32x32
        # pixel-block swizzle as the non-diff chunk path); residuals
        # stay in swizzled ray order — the backward permutes the pixel
        # cotangent to match, and every gradient is a ray reduction
        from ..ops.pallas.render_kernel import _block_swizzle

        perm, inv_perm = _block_swizzle(width, height)
        xs, ys = xs[perm], ys[perm]
    px = jnp.concatenate([xs, jnp.zeros((pad,), jnp.int32)]).astype(jnp.float32)
    py = jnp.concatenate([ys, jnp.zeros((pad,), jnp.int32)]).astype(jnp.float32)
    rand = None
    if rand_seed >= 0:
        rand = jax.random.uniform(
            jax.random.PRNGKey(rand_seed), (spp, n_uniforms(bounces), n + pad)
        )
        if perm is not None:
            # keep each pixel's uniform stream under the swizzle
            rand = jnp.concatenate(
                [rand[:, :, perm], rand[:, :, n:]], axis=2
            )
    xyz, hero, nvalid, powres, matres = _residual_forward(
        cam_vec, key_seed, tri, mat, tab, px, py, spp, bounces,
        ray_tile, interpret, rand, leaf, cpk, leaf_size,
    )
    residuals = (mat, tab, hero, nvalid, powres, matres, n, pad, perm)
    xyz = xyz[:n]
    if inv_perm is not None:
        xyz = xyz[inv_perm]
    return xyz.reshape(height, width, 3), residuals


def _fused_fwd(
    materials, scene, cam, key_seed, x0, y0, width, height, spp, bounces,
    interpret, rand_seed, reparam_glass,
):
    out, residuals = _fused_fwd_impl(
        materials, scene, cam, key_seed, x0, y0, width, height, spp,
        bounces, interpret, rand_seed,
    )
    return out, (materials, scene, cam, residuals)


def _fused_bwd(
    key_seed, x0, y0, width, height, spp, bounces, interpret, rand_seed,
    reparam_glass, res, g,
):
    from ..ops.pallas.grad_kernel import render_grads_pallas

    materials, scene, cam, (mat, tab, hero, nvalid, powres, matres, n, pad, perm) = res
    g_rows = g.reshape(n, 3)
    if perm is not None:
        # residuals are in swizzled ray order (see _fused_fwd_impl)
        g_rows = g_rows[perm]
    g_flat = jnp.concatenate([g_rows, jnp.zeros((pad, 3), jnp.float32)])
    sell = reparam_glass is not None
    grads = render_grads_pallas(
        mat, tab, g_flat, hero, nvalid, powres, matres,
        spp, bounces, 1024, interpret, want_bg_grads=True,
        want_sellmeier=sell,
    )
    d_coeffs, d_power, d_bg = grads[:3]
    d_mats = jax.tree_util.tree_map(jnp.zeros_like, materials)
    d_mats = dataclasses.replace(
        d_mats,
        coeffs=d_coeffs.astype(materials.coeffs.dtype),
        emission_power=d_power.astype(materials.emission_power.dtype),
    )
    if sell:
        d_b, d_c = _sellmeier_grads_from_replay(
            materials, reparam_glass, hero, *grads[3:5]
        )
        d_mats = dataclasses.replace(
            d_mats,
            sellmeier_b=d_mats.sellmeier_b.at[reparam_glass].set(
                d_b.astype(d_mats.sellmeier_b.dtype)
            ),
            sellmeier_c=d_mats.sellmeier_c.at[reparam_glass].set(
                d_c.astype(d_mats.sellmeier_c.dtype)
            ),
        )
    d_scene = jax.tree_util.tree_map(jnp.zeros_like, scene)
    d_scene = dataclasses.replace(
        d_scene, background_spd=d_bg.astype(scene.background_spd.dtype)
    )
    d_cam = jax.tree_util.tree_map(jnp.zeros_like, cam)
    return d_mats, d_scene, d_cam


render_chunk_diff_fused.defvjp(_fused_fwd, _fused_bwd)


def _sellmeier_grads_from_replay(materials, glass, hero, sell_a, sell_b):
    """Fold the replay kernel's per-(sample, ray) reparam scalars into
    Sellmeier B/C gradients: d loss/d(b,c) = sum_s A_s dw/d(b,c) +
    B_s dshift/d(b,c), where (w, shift) are reparam_hero's Jacobian
    weight and hero shift (both functions of (b, c) with primal (1, 0)).
    Exactly jax.grad of ``sum A*w + B*shift`` — cheap elementwise XLA
    over [spp*N] scalars, second-order AD through the Sellmeier map."""
    from .spectral_reparam import reparam_hero

    h = jax.lax.stop_gradient(hero.reshape(-1))
    a_flat = sell_a.reshape(-1)
    b_flat = sell_b.reshape(-1)

    def scalar_fn(bc):
        b, c = bc
        hr, wgt = reparam_hero(h, b, c)
        return jnp.sum(a_flat * wgt + b_flat * (hr - h))

    return jax.grad(scalar_fn)(
        (materials.sellmeier_b[glass], materials.sellmeier_c[glass])
    )


def _mix_seed(seed: int, k: int) -> int:
    """Distinct int32 per (seed, chunk): splitmix-style host-side hash.
    The kernel XORs the seed into its per-(tile, sample) stream hash, so
    distinct chunk seeds give independent streams."""
    x = (seed * 0x9E3779B9 + k * 0x85EBCA6B + 0x27D4EB2F) & 0xFFFFFFFF
    x = (x ^ (x >> 15)) * 0x2C1B3C6D & 0xFFFFFFFF
    x = (x ^ (x >> 12)) * 0x297A2D39 & 0xFFFFFFFF
    return (x ^ (x >> 15)) & 0x7FFFFFFF


def render_chunk_diff_fused_accum(
    materials, scene, cam, key_seed, x0, y0, width, height, spp, bounces,
    interpret=False, rand_seed=-1, spp_chunk=None, reparam_glass=None,
):
    """``render_chunk_diff_fused`` with the sample axis chunked so the
    residual buffers of ANY spp fit the scoped-VMEM budget (the un-chunked
    kernel fails past ~100 samples; check_residual_vmem's error points
    here). Semantics: the kernel's xyz output is a SUM over samples, so
    the chunked sum over independent seed streams is the same Monte Carlo
    estimator at the same total spp, and each chunk's fused backward
    accumulates into the same gradient under jax.grad. ``spp_chunk=None``
    auto-picks the largest chunk that fits (max_residual_spp)."""
    from ..ops.pallas.render_kernel import (
        max_residual_spp,
        packed_scene_vmem_bytes,
    )

    if spp_chunk is None:
        spp_chunk = max_residual_spp(
            bounces, 1024, rand_seed >= 0,
            packed_scene_vmem_bytes(scene.normal.shape[0]),
        )
    if spp_chunk >= spp:
        return render_chunk_diff_fused(
            materials, scene, cam, key_seed, x0, y0, width, height, spp,
            bounces, interpret, rand_seed, reparam_glass,
        )
    out = None
    done, k = 0, 0
    while done < spp:
        c = min(spp_chunk, spp - done)
        part = render_chunk_diff_fused(
            materials, scene, cam, _mix_seed(key_seed, k),
            x0, y0, width, height, c, bounces, interpret,
            -1 if rand_seed < 0 else _mix_seed(rand_seed, k),
            reparam_glass,
        )
        out = part if out is None else out + part
        done += c
        k += 1
    return out


# ---------------------------------------------------------------------------
# Ray-level fused vjp: px/py as array inputs (zero cotangent) so callers
# with traced pixel offsets — e.g. shard_map tiles computing their row
# block from axis_index — can use the fused path.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def render_rays_diff_fused(
    materials, scene, cam, px, py, key_seed, spp, bounces, interpret=False,
    reparam_glass=None,
):
    """Accumulated XYZ [N, 3] for padded ray batches (N % 1024 == 0);
    differentiable w.r.t. ``materials`` via the fused backward kernel.
    ``key_seed`` may be a traced i32 scalar (per-shard seeds under
    shard_map). ``reparam_glass`` adds exact Sellmeier B/C gradients at
    fused rates (see render_chunk_diff_fused)."""
    out, _ = _rays_fwd_impl(
        materials, scene, cam, px, py, key_seed, spp, bounces, interpret
    )
    return out


def _rays_fwd_impl(materials, scene, cam, px, py, key_seed, spp, bounces, interpret):
    from ..ops.pallas.render_kernel import camera_vector, pack_scene_auto

    s = _with_materials(scene, materials)
    cam_vec = camera_vector(cam)
    tri, mat, tab, leaf, cpk, leaf_size = pack_scene_auto(s, cam_vec)
    xyz, hero, nvalid, powres, matres = _residual_forward(
        cam_vec, key_seed, tri, mat, tab, px, py, spp, bounces, 1024,
        interpret, None, leaf, cpk, leaf_size,
    )
    return xyz, (mat, tab, hero, nvalid, powres, matres)


def _rays_fwd(
    materials, scene, cam, px, py, key_seed, spp, bounces, interpret,
    reparam_glass,
):
    out, residuals = _rays_fwd_impl(
        materials, scene, cam, px, py, key_seed, spp, bounces, interpret
    )
    return out, (materials, scene, cam, px, py, key_seed, residuals)


def _rays_bwd(spp, bounces, interpret, reparam_glass, res, g):
    from ..ops.pallas.grad_kernel import render_grads_pallas

    import numpy as _np

    materials, scene, cam, px, py, key_seed, (mat, tab, hero, nvalid, powres, matres) = res
    sell = reparam_glass is not None
    grads = render_grads_pallas(
        mat, tab, g, hero, nvalid, powres, matres, spp, bounces, 1024,
        interpret, want_bg_grads=True, want_sellmeier=sell,
    )
    d_coeffs, d_power, d_bg = grads[:3]
    d_mats = jax.tree_util.tree_map(jnp.zeros_like, materials)
    d_mats = dataclasses.replace(
        d_mats,
        coeffs=d_coeffs.astype(materials.coeffs.dtype),
        emission_power=d_power.astype(materials.emission_power.dtype),
    )
    if sell:
        d_b, d_c = _sellmeier_grads_from_replay(
            materials, reparam_glass, hero, *grads[3:5]
        )
        d_mats = dataclasses.replace(
            d_mats,
            sellmeier_b=d_mats.sellmeier_b.at[reparam_glass].set(
                d_b.astype(d_mats.sellmeier_b.dtype)
            ),
            sellmeier_c=d_mats.sellmeier_c.at[reparam_glass].set(
                d_c.astype(d_mats.sellmeier_c.dtype)
            ),
        )
    d_scene = jax.tree_util.tree_map(jnp.zeros_like, scene)
    d_scene = dataclasses.replace(
        d_scene, background_spd=d_bg.astype(scene.background_spd.dtype)
    )
    d_cam = jax.tree_util.tree_map(jnp.zeros_like, cam)
    d_seed = _np.zeros(jnp.shape(key_seed), jax.dtypes.float0)
    return d_mats, d_scene, d_cam, jnp.zeros_like(px), jnp.zeros_like(py), d_seed


render_rays_diff_fused.defvjp(_rays_fwd, _rays_bwd)
