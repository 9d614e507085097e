"""Pallas TPU megakernel: the full spectral path-trace of a ray tile.

This is the speed-of-light forward path: one kernel owns a tile of rays
through ray generation, every bounce, spectral shading, and CIE XYZ
integration — the vector analogue of the reference's megakernel
(spectral_render_kernel, rendering/rendering.cu:151-235) with the entire
working set resident in VMEM (the analogue of its shared-memory staging,
rendering.cu:174-203). Zero HBM traffic between bounces; only pixel XYZ
leaves the chip.

Design rules (pallas_guide.md):
- rays in lanes: every per-ray quantity is an [RT] f32 vector; wavelength
  arrays are [W=8, RT] (wavelengths in sublanes);
- triangle sweep with scalar broadcasts (no gathers, no stack) — nearest
  hit via branchless where roll-forward;
- per-ray material rows fetched with a one-hot [RT, M] @ [M, 16] MXU
  matmul instead of dynamic gathers;
- SPD table lookups (D65, background, CIE x/y/z) as "two-hot" interpolation
  matmuls: [RT, 96] weight matrix (lerp weights at cell/cell+1) @ table;
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

import jax
import jax.numpy as jnp
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
W = N_RAY_WAVELENGTHS  # 8 wavelengths, hero at index 0
TAB = 96  # padded table rows (95 samples + 1)

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

    tab = jnp.zeros((TAB, 8), jnp.float32)
    tab = tab.at[:N_CIE_SAMPLES, 0].set(cie_x)
    tab = tab.at[:N_CIE_SAMPLES, 1].set(cie_y)
    tab = tab.at[:N_CIE_SAMPLES, 2].set(cie_z)
    tab = tab.at[:N_CIE_SAMPLES, 3].set(cie_d65_normalized)
    tab = tab.at[:N_CIE_SAMPLES, 4].set(scene.background_spd)
    return tri, mat, tab


def _uniform(shape):
    """U[0,1) from the on-core PRNG (24-bit mantissa). Mosaic only lowers
    rank>=2 random_bits, so rank-1 requests go through a (1, n) draw."""
    if len(shape) == 1:
        bits = pltpu.prng_random_bits((1, shape[0]))[0]
    else:
        bits = pltpu.prng_random_bits(shape)
    return (bits >> 8).astype(jnp.float32) * (1.0 / 16777216.0)


def _interp_weights(lam, rt):
    """Two-hot lerp weight matrix [RT, TAB] for the /(N-1) sample grid
    (spectrum_interp semantics, spectrum/spectrum.cu:11-22)."""
    x = (lam - LAMBDA_MIN) * ((N_CIE_SAMPLES - 1) / (LAMBDA_MAX - LAMBDA_MIN))
    cell = jnp.clip(x.astype(jnp.int32), 0, N_CIE_SAMPLES - 2)
    frac = x - cell.astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (rt, TAB), 1)
    c = cell[:, None]
    f = frac[:, None]
    return jnp.where(cols == c, 1.0 - f, 0.0) + jnp.where(cols == c + 1, f, 0.0)


def _render_kernel(
    cam_ref,  # SMEM [16] camera scalars
    seed_ref,  # SMEM [1] int32 base seed
    tri_ref,  # SMEM [T, 17]
    tri_mat_ref,  # SMEM [T] int32
    mat_ref,  # VMEM [M, 16]
    tab_ref,  # VMEM [96, 8]
    px_ref,  # VMEM [RT] f32 pixel x
    py_ref,  # VMEM [RT] f32 pixel y
    rand_ref,  # VMEM [spp, R, RT] injected uniforms (R = 3 + 3*bounces) or [1,1,RT] dummy
    xyz_ref,  # VMEM out [8, RT] (rows 0..2 = X, Y, Z; rest zero-pad)
    *,
    n_tris,
    n_mats,
    spp,
    bounces,
    use_hw_prng,
):
    i = pl.program_id(0)
    rt = px_ref.shape[0]
    one = jnp.ones((rt,), jnp.float32)
    zero = jnp.zeros((rt,), jnp.float32)

    px = px_ref[:]
    py = py_ref[:]

    cx, cy, cz = cam_ref[0], cam_ref[1], cam_ref[2]
    p0x, p0y, p0z = cam_ref[3], cam_ref[4], cam_ref[5]
    dux, duy, duz = cam_ref[6], cam_ref[7], cam_ref[8]
    dvx, dvy, dvz = cam_ref[9], cam_ref[10], cam_ref[11]

    span = LAMBDA_MAX - LAMBDA_MIN
    lam_step = span / float(W)
    # integer iota then cast: Mosaic's tpu.iota only yields integer vectors
    offs = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0).astype(jnp.float32) * lam_step

    def sample_body(s, acc):
        accx, accy, accz = acc
        if use_hw_prng:
            pltpu.prng_seed(seed_ref[0] + i * 7919 * spp + s)

        def rnd(j):
            """j-th uniform draw of this sample: hardware PRNG in
            production; injected plane in tests (interpret mode stubs the
            TPU PRNG to zeros)."""
            if use_hw_prng:
                return _uniform((rt,))
            return rand_ref[s, j, :]

        # --- camera ray (get_ray, rendering.cu:66-87; defocus_angle == 0
        # for all reference scenes, camera at scene.cu:259-320) ---
        jx = rnd(0) - 0.5
        jy = rnd(1) - 0.5
        fx = px + jx
        fy = py + jy
        ox = jnp.broadcast_to(cx, (rt,))
        oy = jnp.broadcast_to(cy, (rt,))
        oz = jnp.broadcast_to(cz, (rt,))
        dx = p0x + fx * dux + fy * dvx - cx
        dy = p0y + fx * duy + fy * dvy - cy
        dz = p0z + fx * duz + fy * dvz - cz

        # --- hero wavelengths (spectrum.cu:31-48) ---
        hero = LAMBDA_MIN + span * rnd(2)
        lam = hero[None, :] + offs  # [W, RT]
        lam = jnp.where(lam > LAMBDA_MAX, lam - span, lam)

        power = jnp.ones((W, rt), jnp.float32)
        alive = one
        n_valid = jnp.full((rt,), float(W), jnp.float32)

        def bounce_body(b, st):
            ox, oy, oz, dx, dy, dz, power, alive, n_valid = st

            # ---- nearest-hit triangle sweep ----
            best_t = jnp.full((rt,), BIG, jnp.float32)
            best_hit = zero
            best_front = zero
            best_nx = zero
            best_ny = zero
            best_nz = zero
            best_mat = jnp.zeros((rt,), jnp.int32)

            def tri_body(t, carry):
                best_t, best_hit, best_front, best_nx, best_ny, best_nz, best_mat = carry
                nx, ny, nz = tri_ref[t, 0], tri_ref[t, 1], tri_ref[t, 2]
                dd = tri_ref[t, 3]
                nd = nx * dx + ny * dy + nz * dz
                no = nx * ox + ny * oy + nz * oz
                tt = (dd - no) / nd
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
                front = jnp.where(nd < 0.0, one, zero)
                sgn = 2.0 * front - 1.0  # flip normal toward the ray
                best_t = jnp.where(take, tt, best_t)
                best_front = jnp.where(take, front, best_front)
                best_nx = jnp.where(take, sgn * nx, best_nx)
                best_ny = jnp.where(take, sgn * ny, best_ny)
                best_nz = jnp.where(take, sgn * nz, best_nz)
                best_mat = jnp.where(take, tri_mat_ref[t], best_mat)
                best_hit = jnp.maximum(best_hit, valid)
                return best_t, best_hit, best_front, best_nx, best_ny, best_nz, best_mat

            best_t, best_hit, best_front, best_nx, best_ny, best_nz, best_mat = (
                jax.lax.fori_loop(
                    0,
                    n_tris,
                    tri_body,
                    (best_t, best_hit, best_front, best_nx, best_ny, best_nz, best_mat),
                )
            )

            hit = best_hit * alive
            miss = (1.0 - best_hit) * alive

            t_safe = jnp.where(best_hit > 0.0, best_t, 0.0)
            hx = ox + t_safe * dx
            hy = oy + t_safe * dy
            hz = oz + t_safe * dz

            # ---- material row fetch: one-hot MXU matmul ----
            mat_cols = jax.lax.broadcasted_iota(jnp.int32, (rt, n_mats), 1)
            onehot = jnp.where(mat_cols == best_mat[:, None], 1.0, 0.0)
            rows = jnp.dot(onehot, mat_ref[:, :], preferred_element_type=jnp.float32)
            c0, c1, c2 = rows[:, 0], rows[:, 1], rows[:, 2]
            is_lamb = rows[:, 3]
            is_metal = rows[:, 4]
            is_diel = rows[:, 5]
            is_emis = rows[:, 6]
            fuzz = rows[:, 7]
            power_sq = rows[:, 8]
            b0, b1, b2 = rows[:, 9], rows[:, 10], rows[:, 11]
            sc0, sc1, sc2 = rows[:, 12], rows[:, 13], rows[:, 14]

            # ---- spectral weight per wavelength (tabulate semantics,
            # material.cuh:71-84 + ray::mul_spectrum) ----
            # sigmoid-poly SPD evaluated at the table grid is re-read through
            # the /(N-1) lerp by the XLA path; here we evaluate directly at
            # lambda (equal up to the table-grid quantization, see
            # ops/rgb2spec.py grid note)
            x = (c0[None, :] * lam + c1[None, :]) * lam + c2[None, :]
            sig = 0.5 * x / jnp.sqrt(1.0 + x * x) + 0.5  # [W, RT]

            d65_rows = []
            bg_rows = []
            for w in range(W):
                wmat = _interp_weights(lam[w], rt)  # [RT, TAB]
                vals = jnp.dot(wmat, tab_ref[:, :], preferred_element_type=jnp.float32)
                d65_rows.append(vals[:, 3])
                bg_rows.append(vals[:, 4])
            d65w = jnp.stack(d65_rows)  # [W, RT] (static stack, no scatter)
            bgw = jnp.stack(bg_rows)

            spd_mat = (
                is_diel[None, :]
                + is_emis[None, :] * power_sq[None, :] * sig * d65w
                + (is_lamb + is_metal)[None, :] * sig
            )
            weight = (
                hit[None, :] * spd_mat
                + miss[None, :] * bgw
                + (1.0 - alive)[None, :]
            )
            new_power = power * weight

            # ---- scatter directions ----
            ilen = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
            ux, uy, uz = dx * ilen, dy * ilen, dz * ilen
            # uniform unit sphere in closed form (distribution matches the
            # reference's rejection loop, vec3.cuh:209-246)
            sz_u = 2.0 * rnd(3 + 3 * b) - 1.0
            sphi = (2.0 * 3.14159265358979) * rnd(4 + 3 * b)
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
            hero_um2 = (lam[0] * 1e-3) ** 2
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
            u_refl = rnd(5 + 3 * b)
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
            power = jnp.where(frozen[None, :], power, new_power)

            return ox, oy, oz, dx, dy, dz, power, new_alive, n_valid

        st = (ox, oy, oz, dx, dy, dz, power, alive, n_valid)
        ox, oy, oz, dx, dy, dz, power, alive, n_valid = jax.lax.fori_loop(
            0, bounces, bounce_body, st
        )

        # bounce-limit exhaustion contributes nothing (rendering.cu:38-39)
        n_valid = jnp.where(alive > 0.0, 0.0, n_valid)

        # ---- XYZ integration (dev_spectrum_to_XYZ, color.cu:88-104) ----
        delta = span / float(W)
        widx = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0).astype(jnp.float32)
        wmask = jnp.where(widx < n_valid[None, :], 1.0, 0.0)  # [W, RT]
        contrib = power * wmask * delta
        sx_ = zero
        sy_ = zero
        sz_ = zero
        for w in range(W):
            wmat = _interp_weights(lam[w], rt)
            resp = jnp.dot(wmat, tab_ref[:, :], preferred_element_type=jnp.float32)
            sx_ = sx_ + contrib[w] * resp[:, 0]
            sy_ = sy_ + contrib[w] * resp[:, 1]
            sz_ = sz_ + contrib[w] * resp[:, 2]
        return accx + sx_, accy + sy_, accz + sz_

    accx, accy, accz = jax.lax.fori_loop(
        0, spp, sample_body, (zero, zero, zero)
    )
    xyz_ref[0, :] = accx
    xyz_ref[1, :] = accy
    xyz_ref[2, :] = accz
    for r in range(3, 8):
        xyz_ref[r, :] = zero


def n_uniforms(bounces: int) -> int:
    """Uniform draws per sample: jitter(2) + hero(1) + 3 per bounce."""
    return 3 + 3 * bounces


@functools.partial(
    jax.jit,
    static_argnames=("spp", "bounces", "ray_tile", "interpret"),
)
def render_rays_pallas(
    cam_vec: jnp.ndarray,  # [16] f32 camera scalars
    seed: jnp.ndarray,  # [] int32
    tri_pack: jnp.ndarray,  # [T, 17]
    mat_pack: jnp.ndarray,  # [M, 16]
    tables: jnp.ndarray,  # [96, 8]
    px: jnp.ndarray,  # [N] f32
    py: jnp.ndarray,  # [N] f32
    spp: int,
    bounces: int,
    ray_tile: int = 2048,
    interpret=False,
    rand: jnp.ndarray | None = None,  # [spp, n_uniforms, N] injected uniforms
) -> jnp.ndarray:
    """Accumulated XYZ [N, 3] for N rays (N must divide by ray_tile).

    ``rand=None`` uses the on-core hardware PRNG; passing a uniform array
    makes the kernel fully deterministic and interpreter-runnable (the TPU
    interpreter stubs prng_random_bits to zeros).
    """
    n = px.shape[0]
    assert n % ray_tile == 0, (n, ray_tile)
    grid = n // ray_tile
    n_tris = tri_pack.shape[0]
    n_mats = mat_pack.shape[0]
    use_hw_prng = rand is None
    if use_hw_prng:
        rand = jnp.zeros((1, 1, n), jnp.float32)
    rand_spec = pl.BlockSpec(
        (rand.shape[0], rand.shape[1], ray_tile if not use_hw_prng else n),
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
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cam
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tri_pack
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tri mat ids
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mat_pack
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tables
            pl.BlockSpec((ray_tile,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_tile,), lambda i: (i,), memory_space=pltpu.VMEM),
            rand_spec,
        ],
        out_specs=pl.BlockSpec((8, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        cam_vec,
        jnp.asarray([seed], jnp.int32),
        tri_pack,
        tri_pack[:, 16].astype(jnp.int32),
        mat_pack,
        tables,
        px.astype(jnp.float32),
        py.astype(jnp.float32),
        rand,
    )
    return out[:3].T


def camera_vector(cam) -> jnp.ndarray:
    """Pack the camera frame into the [16] SMEM scalar vector."""
    if float(cam.defocus_angle) > 0.0:
        raise NotImplementedError(
            "pallas path supports pinhole cameras (all reference scenes); "
            "use the XLA wavefront path for defocus-disk rendering"
        )
    return jnp.concatenate(
        [
            cam.center,
            cam.pixel00_loc,
            cam.pixel_delta_u,
            cam.pixel_delta_v,
            jnp.zeros((4,), jnp.float32),
        ]
    ).astype(jnp.float32)


def render_chunk_pallas(
    scene, cam, seed: int, x0: int, y0: int, width: int, height: int,
    spp: int, bounces: int, ray_tile: int = 2048, interpret=False,
    rand_key=None,
) -> jnp.ndarray:
    """Accumulated-XYZ chunk [height, width, 3] via the megakernel.

    Drop-in for render.wavefront.render_chunk's output contract (same
    accumulation semantics; different RNG stream, statistically identical
    estimator). ``rand_key``: a jax PRNG key to pre-generate the uniform
    planes on the host instead of the on-core PRNG (deterministic;
    required for interpreter runs).
    """
    tri_pack, mat_pack, tables = pack_scene(scene)
    n = width * height
    pad = (-n) % ray_tile
    ys, xs = jnp.meshgrid(
        jnp.arange(y0, y0 + height, dtype=jnp.int32),
        jnp.arange(x0, x0 + width, dtype=jnp.int32),
        indexing="ij",
    )
    px = jnp.concatenate([xs.ravel(), jnp.zeros((pad,), jnp.int32)]).astype(jnp.float32)
    py = jnp.concatenate([ys.ravel(), jnp.zeros((pad,), jnp.int32)]).astype(jnp.float32)
    rand = None
    if rand_key is not None:
        rand = jax.random.uniform(
            rand_key, (spp, n_uniforms(bounces), n + pad), jnp.float32
        )
    xyz = render_rays_pallas(
        camera_vector(cam), jnp.int32(seed), tri_pack, mat_pack, tables,
        px, py, spp, bounces, ray_tile, interpret, rand,
    )
    return xyz[:n].reshape(height, width, 3)
