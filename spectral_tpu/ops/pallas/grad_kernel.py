"""Pallas TPU backward kernel: fused material-parameter gradients.

The megakernel's radiance per (sample, wavelength) is a PRODUCT of
per-bounce spectral weights, and a given material's weight at a given
wavelength is the same at every bounce. So

    d xyz_c / d theta_m
      = sum_{s,w} A_sw * P_sw * k_m(s) * d log w_m(lambda_sw) / d theta_m

where P is the stored final path power, k_m counts how many bounces of the
path multiplied material m's SPD (stored as the per-bounce material
residual), and A folds the upstream cotangent with the CIE response. The
backward pass therefore needs NO ray-triangle intersection at all — it
replays stored residuals with pure VPU math, making the gradient CHEAPER
than the forward render.

Gradient support: sigmoid coefficients c0..c2 and emission power per
material, background SPD knots (``want_bg_grads`` — they flow through the
miss-weight lerp, the -1 material residual), and — via the per-sample
(A, B) reparam scalars this kernel emits under ``want_sellmeier`` —
exact Sellmeier B/C gradients through the hero-wavelength
reparameterization (diff/fast.py::_sellmeier_grads_from_replay).
Direction-only fuzz stays zero a.e. through this estimator
(diff/geometry.py scope note; diff/fuzz_warp.py is the exact XLA-path
estimator for it); dielectric path weights are 1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.constants import LAMBDA_MAX, LAMBDA_MIN, N_CIE_SAMPLES
from .render_kernel import W, _lut

# output layout: [m_pad, 128] f32; columns 0..3 = (dc0, dc1, dc2, d_power);
# m_pad = n_mats rounded up to a multiple of 8 sublanes (TRIS has 9
# materials, /root/reference/scene/scene.cu:228-257 — round 1 hard-capped
# this at 8 and asserted out on TRIS).
N_GRADS = 4


def _mat_pad(n_mats: int) -> int:
    return max(8, ((n_mats + 7) // 8) * 8)


def _lut_slope(tab_row, cell):
    """Per-cell lerp slope of a lane-resident table row: tab[cell+1] -
    tab[cell] (multiply by (N_CIE_SAMPLES-1)/span for d/dlambda). The
    piecewise-linear forward lerp's exact a.e. derivative, including the
    top-cell linear extrapolation the clamped forward uses."""
    lanes = cell.shape[1]
    op = jnp.broadcast_to(tab_row[:lanes], (8, lanes))
    lo = jnp.take_along_axis(op, cell, axis=1)
    hi = jnp.take_along_axis(op, cell + 1, axis=1)
    return hi - lo


def _grad_kernel(
    mat_ref,  # SMEM [M, 16] material pack (render_kernel layout)
    tab_ref,  # VMEM [8, 128] lane tables (cie x/y/z rows 0-2, d65 row 3)
    g_ref,  # VMEM [8, RT] upstream cotangent rows 0..2 = dX, dY, dZ
    hero_ref,  # VMEM [spp, RT]
    nvalid_ref,  # VMEM [spp, RT]
    powres_ref,  # VMEM [spp, W, RT]
    matres_ref,  # VMEM [spp, bounces, RT] i32 (mat+1; -1 = bg miss; 0 = none)
    out_ref,  # VMEM [m_pad, 128] accumulated gradients
    *res_outs,  # [bg_out [8, 128] when want_bg_grads] +
    # [sell_a, sell_b [spp, RT] when want_sellmeier]
    n_mats,
    spp,
    bounces,
    want_bg_grads=False,
    want_sellmeier=False,
):
    i = pl.program_id(0)
    rt = g_ref.shape[1]
    lanes = rt // 8
    shape2 = (8, lanes)
    zero = jnp.zeros(shape2, jnp.float32)
    one = jnp.ones(shape2, jnp.float32)

    span = LAMBDA_MAX - LAMBDA_MIN
    lam_step = span / float(W)
    delta = span / float(W)

    gx = g_ref[0, :].reshape(shape2)
    gy = g_ref[1, :].reshape(shape2)
    gz = g_ref[2, :].reshape(shape2)

    mat_const = [tuple(mat_ref[m, k] for k in range(15)) for m in range(n_mats)]

    def sample_body(s, acc):
        # acc: tuple of n_mats * N_GRADS (+ 95 bg) f32 scalars
        hero = hero_ref[s, :].reshape(shape2)
        nv = nvalid_ref[s, :].reshape(shape2)

        # per-wavelength lambda, CIE response fold, masked A weights
        cscale = (N_CIE_SAMPLES - 1) / span
        lam = []
        a_rows = []
        mp_rows = []
        d65_rows = []
        bg_rows = []
        cell_rows = []
        frac_rows = []
        respslope_rows = []
        d65slope_rows = []
        bgslope_rows = []
        for w in range(W):
            lw = hero + (w * lam_step)
            lw = jnp.where(lw > LAMBDA_MAX, lw - span, lw)
            lam.append(lw)
            xg = (lw - LAMBDA_MIN) * ((N_CIE_SAMPLES - 1) / span)
            cw = jnp.clip(xg.astype(jnp.int32), 0, N_CIE_SAMPLES - 2)
            fw = xg - cw.astype(jnp.float32)
            resp = (
                gx * _lut(tab_ref[0, :], cw, fw)
                + gy * _lut(tab_ref[1, :], cw, fw)
                + gz * _lut(tab_ref[2, :], cw, fw)
            )
            d65_rows.append(_lut(tab_ref[3, :], cw, fw))
            if want_bg_grads or want_sellmeier:
                bg_rows.append(_lut(tab_ref[4, :], cw, fw))
                cell_rows.append(cw)
                frac_rows.append(fw)
            if want_sellmeier:
                # d/dlambda of the cotangent-folded CIE response and of
                # the D65/background lerps: a rigid comb shift moves
                # every lam_w by 1 (the wrap subtracts a constant), so
                # the lerp slopes ARE the shift derivatives
                respslope_rows.append(
                    (
                        gx * _lut_slope(tab_ref[0, :], cw)
                        + gy * _lut_slope(tab_ref[1, :], cw)
                        + gz * _lut_slope(tab_ref[2, :], cw)
                    )
                    * cscale
                )
                d65slope_rows.append(_lut_slope(tab_ref[3, :], cw) * cscale)
                bgslope_rows.append(_lut_slope(tab_ref[4, :], cw) * cscale)
            mask = jnp.where(float(w) < nv, delta, 0.0)
            p = powres_ref[s, w, :].reshape(shape2)
            mp_rows.append(mask * p)
            a_rows.append(resp * mask * p)  # A_sw * P_sw

        # per-material bounce counts k_m; bg-miss indicator (at most one
        # miss bounce per path — a miss terminates it)
        counts = [zero] * n_mats
        missed = zero
        for b in range(bounces):
            mt = matres_ref[s, b, :].reshape(shape2)
            for m in range(n_mats):
                counts[m] = counts[m] + jnp.where(mt == m + 1, one, zero)
            if want_bg_grads or want_sellmeier:
                missed = jnp.maximum(missed, jnp.where(mt == -1, one, zero))

        acc = list(acc)

        if want_bg_grads:
            # d log w_bg / d bg[k] = ((cell==k)(1-f) + (cell==k-1) f) / w_bg
            for w in range(W):
                common = (
                    a_rows[w] * missed / jnp.maximum(bg_rows[w], 1e-30)
                )
                cw = cell_rows[w]
                fw = frac_rows[w]
                for k in range(N_CIE_SAMPLES):
                    wk = jnp.where(cw == k, 1.0 - fw, 0.0) + jnp.where(
                        cw == k - 1, fw, 0.0
                    )
                    idx = n_mats * N_GRADS + k
                    acc[idx] = acc[idx] + jnp.sum(common * wk)
        sellb = zero
        for m in range(n_mats):
            c0, c1, c2 = mat_const[m][0], mat_const[m][1], mat_const[m][2]
            is_diel = mat_const[m][5]
            is_emis = mat_const[m][6]
            power_sq = mat_const[m][8]
            k_m = counts[m]
            dc0 = zero
            dc1 = zero
            dc2 = zero
            dp = zero
            for w in range(W):
                x = (c0 * lam[w] + c1) * lam[w] + c2
                inv_sq = 1.0 / (1.0 + x * x)
                sig = 0.5 * x * jnp.sqrt(inv_sq) + 0.5
                dsig = 0.5 * inv_sq * jnp.sqrt(inv_sq)
                # w_m(lambda): diel -> 1; emis -> p^2 sig d65; else sig
                w_m = (
                    is_diel
                    + is_emis * power_sq * sig * d65_rows[w]
                    + (1.0 - is_diel - is_emis) * sig
                )
                # dlog w / dx = (1 - is_diel) * dsig / sig   (d65/p^2 cancel)
                dlog_dx = (1.0 - is_diel) * dsig / jnp.maximum(sig, 1e-30)
                base = a_rows[w] * k_m
                common = base * dlog_dx
                dc0 = dc0 + common * lam[w] * lam[w]
                dc1 = dc1 + common * lam[w]
                dc2 = dc2 + common
                # d w / d p = 2 p sig d65 -> dlog w / dp = 2/p (emissive)
                p_safe = jnp.sqrt(jnp.maximum(power_sq, 1e-30))
                dp = dp + base * is_emis * (2.0 / p_safe)
                if want_sellmeier:
                    # d log w_m / d lambda under a rigid comb shift:
                    # the sigmoid chain (dx/dlam = 2 c0 lam + c1) plus,
                    # for emissive hits, the D65 lerp slope (it does NOT
                    # cancel in d/dlam the way it does in d/dcoeffs)
                    dxdlam = 2.0 * c0 * lam[w] + c1
                    dlog_lam = dlog_dx * dxdlam + is_emis * (
                        d65slope_rows[w]
                        / jnp.maximum(d65_rows[w], 1e-30)
                    )
                    sellb = sellb + base * dlog_lam
            base_idx = m * N_GRADS
            acc[base_idx + 0] = acc[base_idx + 0] + jnp.sum(dc0)
            acc[base_idx + 1] = acc[base_idx + 1] + jnp.sum(dc1)
            acc[base_idx + 2] = acc[base_idx + 2] + jnp.sum(dc2)
            acc[base_idx + 3] = acc[base_idx + 3] + jnp.sum(dp)
        if want_sellmeier:
            # Per-(sample, ray) scalars for the hero-wavelength reparam
            # (diff/spectral_reparam.py): A = this sample's contribution
            # dotted with the cotangent (multiplies the Jacobian weight
            # dT/dlambda0), B = dA/d(shift) under a rigid comb shift —
            # CIE/D65/background lerp slopes + the per-bounce material
            # SPD chain accumulated in sellb above. Geometry terms are
            # zero a.e.: radiance here is piecewise constant in the ray
            # directions (per-tri materials/normals, no distance
            # falloff), exactly the property that made plain AD vanish.
            sa = zero
            for w in range(W):
                sa = sa + a_rows[w]
                sellb = sellb + (
                    mp_rows[w] * respslope_rows[w]
                    + a_rows[w]
                    * missed
                    * bgslope_rows[w]
                    / jnp.maximum(bg_rows[w], 1e-30)
                )
            res_outs[-2][s, :] = sa.reshape(rt)
            res_outs[-1][s, :] = sellb.reshape(rt)
        return tuple(acc)

    n_acc = n_mats * N_GRADS + (N_CIE_SAMPLES if want_bg_grads else 0)
    init = tuple(jnp.float32(0.0) for _ in range(n_acc))
    acc = jax.lax.fori_loop(0, spp, sample_body, init)

    m_pad = out_ref.shape[0]

    @pl.when(i == 0)
    def _():
        out_ref[:, :] = jnp.zeros((m_pad, 128), jnp.float32)
        if want_bg_grads:
            res_outs[0][:, :] = jnp.zeros((8, 128), jnp.float32)

    # accumulate this tile's gradients into the (revisited) output block
    rows = jax.lax.broadcasted_iota(jnp.int32, (m_pad, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m_pad, 128), 1)
    upd = jnp.zeros((m_pad, 128), jnp.float32)
    for m in range(n_mats):
        for j in range(N_GRADS):
            sel = (rows == m) & (cols == j)
            upd = jnp.where(sel, acc[m * N_GRADS + j], upd)
    out_ref[:, :] = out_ref[:, :] + upd

    if want_bg_grads:
        rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        cols8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        bg_upd = jnp.zeros((8, 128), jnp.float32)
        for k in range(N_CIE_SAMPLES):
            sel = (rows8 == 0) & (cols8 == k)
            bg_upd = jnp.where(sel, acc[n_mats * N_GRADS + k], bg_upd)
        res_outs[0][:, :] = res_outs[0][:, :] + bg_upd


@functools.partial(
    jax.jit,
    static_argnames=(
        "spp", "bounces", "ray_tile", "interpret", "want_bg_grads",
        "want_sellmeier",
    ),
)
def render_grads_pallas(
    mat_pack,  # [M, 16]
    tables,  # [8, 128]
    g,  # [N, 3] upstream cotangent d(loss)/d(xyz)
    hero,  # [spp, N]
    nvalid,  # [spp, N]
    powres,  # [spp, W, N]
    matres,  # [spp, bounces, N] i32
    spp: int,
    bounces: int,
    ray_tile: int = 1024,
    interpret=False,
    want_bg_grads: bool = False,
    want_sellmeier: bool = False,
):
    """Fused backward: residuals + cotangent -> (d_coeffs [M,3],
    d_emission_power [M][, d_background_spd [95]][, sell_a [spp, N],
    sell_b [spp, N]]). The sell pair are the per-(sample, ray) reparam
    scalars (see _grad_kernel) that diff/fast.py folds through
    reparam_hero's (weight, shift) tangents into Sellmeier B/C
    gradients."""
    n = g.shape[0]
    assert n % ray_tile == 0
    grid = n // ray_tile
    n_mats = mat_pack.shape[0]
    m_pad = _mat_pad(n_mats)

    g8 = jnp.zeros((8, n), jnp.float32)
    g8 = g8.at[:3, :].set(g.T.astype(jnp.float32))

    kernel = functools.partial(
        _grad_kernel, n_mats=n_mats, spp=spp, bounces=bounces,
        want_bg_grads=want_bg_grads, want_sellmeier=want_sellmeier,
    )
    out_shape = [jax.ShapeDtypeStruct((m_pad, 128), jnp.float32)]
    out_specs = [
        pl.BlockSpec((m_pad, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ]
    if want_bg_grads:
        out_shape.append(jax.ShapeDtypeStruct((8, 128), jnp.float32))
        out_specs.append(
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    if want_sellmeier:
        for _ in range(2):
            out_shape.append(jax.ShapeDtypeStruct((spp, n), jnp.float32))
            out_specs.append(
                pl.BlockSpec(
                    (spp, ray_tile), lambda i: (0, i),
                    memory_space=pltpu.VMEM,
                )
            )
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((8, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((spp, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((spp, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((spp, W, ray_tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((spp, bounces, ray_tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(mat_pack, tables, g8, hero, nvalid, powres, matres)
    if not isinstance(outs, (tuple, list)):
        outs = (outs,)
    ret = [outs[0][:n_mats, :3], outs[0][:n_mats, 3]]
    k = 1
    if want_bg_grads:
        ret.append(outs[k][0, :N_CIE_SAMPLES])
        k += 1
    if want_sellmeier:
        ret.extend(outs[k : k + 2])
    return tuple(ret)
