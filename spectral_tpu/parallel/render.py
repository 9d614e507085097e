"""Mesh-sharded rendering + inverse-rendering train step.

This is the multi-chip replacement for the reference's sequential chunk loop
(reference rendering/render_manager.cu:3-66 ``step`` + the producer/consumer
double buffer render_manager.cuh:68-181): the image's row blocks become
shards on the ``tile`` mesh axis and the spp axis is sharded over ``sample``,
with one ``psum`` on the sample axis to merge partial Monte Carlo sums.

Everything is expressed with ``jax.shard_map`` over a 2D Mesh so XLA lays
the collectives on ICI; the same code runs on a virtual CPU mesh in tests
(SURVEY.md section 4 item 4).

Gradients: ``render_image_sharded`` is differentiable; the shard_map
transpose turns the forward psum into the gradient all-reduce, which is
exactly the "scene-parameter gradients psum-reduced over ICI" design from
the BASELINE north star.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # jax >= 0.4.35 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from ..models.camera import Camera
from ..models.materials import tabulate
from ..render.wavefront import render_tile_xyz
from ..utils.prng import fold
from .mesh import SAMPLE_AXIS, TILE_AXIS


def render_image_sharded(
    scene,
    cam: Camera,
    key: jax.Array,
    mesh,
    samples_per_pixel: int,
    bounce_limit: int,
) -> jnp.ndarray:
    """Full-image accumulated XYZ [H, W, 3], sharded (tile x sample).

    Each (tile, sample) shard renders H/n_tile rows at spp/n_sample samples;
    row blocks concatenate over ``tile``, partial sums psum over ``sample``.
    H and spp must divide by the respective mesh extents.
    """
    h, w = cam.image_height, cam.image_width
    n_tile = mesh.shape[TILE_AXIS]
    n_samp = mesh.shape[SAMPLE_AXIS]
    if h % n_tile or samples_per_pixel % n_samp:
        raise ValueError(
            f"height {h} / spp {samples_per_pixel} must divide mesh "
            f"({n_tile} x {n_samp})"
        )
    rows = h // n_tile
    local_spp = samples_per_pixel // n_samp

    def shard_fn(scene, cam, key):
        ti = jax.lax.axis_index(TILE_AXIS)
        si = jax.lax.axis_index(SAMPLE_AXIS)
        y0 = ti * rows
        ys, xs = jnp.meshgrid(
            jnp.arange(rows, dtype=jnp.int32),
            jnp.arange(w, dtype=jnp.int32),
            indexing="ij",
        )
        # fold both mesh coordinates so every shard draws unique samples
        k = fold(key, ti, si)
        xyz = render_tile_xyz(
            scene, cam, xs.ravel(), (ys + y0).ravel(), k, local_spp, bounce_limit
        )
        xyz = jax.lax.psum(xyz, SAMPLE_AXIS)
        return xyz.reshape(rows, w, 3)

    # check_vma=False: the bounce-scan carry mixes axis-varying ray data with
    # invariant init constants, which the varying-manual-axes checker rejects;
    # all communication here is the one explicit psum above.
    fn = _shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(TILE_AXIS, None, None),
        check_vma=False,
    )
    return fn(scene, cam, key)


def render_image_sharded_pallas(
    scene,
    cam: Camera,
    seed: int,
    mesh,
    samples_per_pixel: int,
    bounce_limit: int,
    ray_tile: int = 1024,
    interpret=False,
) -> jnp.ndarray:
    """Full-image accumulated XYZ [H, W, 3] with the fused Pallas megakernel
    per (tile, sample) shard — the multi-chip production forward path.

    Row blocks ride the ``tile`` axis, spp shards ride ``sample`` with one
    psum; inside each shard the pallas kernel owns its rays end-to-end, so
    the only HBM/ICI traffic is the final XYZ.
    """
    from ..ops.pallas.render_kernel import (
        camera_vector,
        pack_scene,
        render_rays_pallas,
    )

    h, w = cam.image_height, cam.image_width
    n_tile = mesh.shape[TILE_AXIS]
    n_samp = mesh.shape[SAMPLE_AXIS]
    if h % n_tile or samples_per_pixel % n_samp:
        raise ValueError(
            f"height {h} / spp {samples_per_pixel} must divide mesh "
            f"({n_tile} x {n_samp})"
        )
    rows = h // n_tile
    local_spp = samples_per_pixel // n_samp
    n_local = rows * w
    pad = (-n_local) % ray_tile

    tri_pack, mat_pack, tables = pack_scene(scene)
    cam_vec = camera_vector(cam)

    def shard_fn(cam_vec, tri_pack, mat_pack, tables):
        ti = jax.lax.axis_index(TILE_AXIS)
        si = jax.lax.axis_index(SAMPLE_AXIS)
        y0 = ti * rows
        ys, xs = jnp.meshgrid(
            jnp.arange(rows, dtype=jnp.int32),
            jnp.arange(w, dtype=jnp.int32),
            indexing="ij",
        )
        px = jnp.concatenate([xs.ravel(), jnp.zeros((pad,), jnp.int32)])
        py = jnp.concatenate([(ys + y0).ravel(), jnp.zeros((pad,), jnp.int32)])
        shard_seed = seed + (ti * n_samp + si) * 7919999
        xyz = render_rays_pallas(
            cam_vec.astype(jnp.float32),
            shard_seed.astype(jnp.int32),
            tri_pack, mat_pack, tables,
            px.astype(jnp.float32), py.astype(jnp.float32),
            local_spp, bounce_limit, ray_tile, interpret,
        )
        xyz = jax.lax.psum(xyz[:n_local], SAMPLE_AXIS)
        return xyz.reshape(rows, w, 3)

    fn = _shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(TILE_AXIS, None, None),
        check_vma=False,
    )
    return fn(cam_vec, tri_pack, mat_pack, tables)


# ---------------------------------------------------------------------------
# Inverse rendering (new capability — the reference is forward-only,
# SURVEY.md "no autodiff anywhere")
# ---------------------------------------------------------------------------


def trainable_params(scene) -> dict:
    """The differentiable scene leaves recovered by inverse rendering:
    material sigmoid-spectrum coefficients, emission powers, metal fuzz,
    Sellmeier dispersion coefficients (BASELINE config 5)."""
    m = scene.materials
    return {
        "coeffs": m.coeffs,
        "emission_power": m.emission_power,
        "fuzz": m.fuzz,
        "sellmeier_b": m.sellmeier_b,
        "sellmeier_c": m.sellmeier_c,
    }


def apply_params(scene, params: dict):
    """Rebuild the scene with updated material leaves (re-tabulates SPDs)."""
    mats = dataclasses.replace(scene.materials, **params)
    return dataclasses.replace(scene, materials=tabulate(mats))


def train_step_fused(
    params: dict,
    scene,
    cam: Camera,
    target_xyz: jnp.ndarray,
    seed: int,
    mesh,
    samples_per_pixel: int,
    bounce_limit: int,
    lr: float = 1e-2,
    interpret=False,
):
    """One SGD step of inverse rendering with the FUSED kernels per shard:
    megakernel forward + residual-replay backward (diff/fast.py), rows
    sharded over ``tile``, spp over ``sample``, loss/grads psum-reduced.

    ``params``: dict of material leaves to optimize (subset of
    {coeffs, emission_power} — the smooth-gradient family)."""
    h, w = cam.image_height, cam.image_width
    n_tile = mesh.shape[TILE_AXIS]
    n_samp = mesh.shape[SAMPLE_AXIS]
    if h % n_tile or samples_per_pixel % n_samp:
        raise ValueError("height/spp must divide the mesh extents")
    rows = h // n_tile
    local_spp = samples_per_pixel // n_samp
    n_local = rows * w
    pad = (-n_local) % 1024

    from ..diff.fast import render_rays_diff_fused

    def shard_fn(params, scene, cam, target):
        ti = jax.lax.axis_index(TILE_AXIS)
        si = jax.lax.axis_index(SAMPLE_AXIS)
        y0 = ti * rows
        ys, xs = jnp.meshgrid(
            jnp.arange(rows, dtype=jnp.int32),
            jnp.arange(w, dtype=jnp.int32),
            indexing="ij",
        )
        px = jnp.concatenate(
            [xs.ravel(), jnp.zeros((pad,), jnp.int32)]
        ).astype(jnp.float32)
        py = jnp.concatenate(
            [(ys + y0).ravel(), jnp.zeros((pad,), jnp.int32)]
        ).astype(jnp.float32)
        shard_seed = (seed + (ti * n_samp + si) * 7919993).astype(jnp.int32)

        def local_loss(p):
            mats = dataclasses.replace(scene.materials, **p)
            xyz = render_rays_diff_fused(
                mats, scene, cam, px, py, shard_seed,
                local_spp, bounce_limit, interpret,
            )
            xyz = jax.lax.psum(xyz[:n_local], SAMPLE_AXIS)
            img = xyz.reshape(rows, w, 3) / samples_per_pixel
            return jnp.sum((img - target) ** 2)

        loss, g = jax.value_and_grad(local_loss)(params)
        loss = jax.lax.psum(loss, TILE_AXIS) / (h * w * 3)
        g = jax.tree_util.tree_map(
            lambda x: jax.lax.psum(jax.lax.psum(x, TILE_AXIS), SAMPLE_AXIS), g
        )
        return loss, g

    fn = _shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(TILE_AXIS, None, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    loss, grads = fn(params, scene, cam, target_xyz)
    new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
    return new_params, loss


@partial(
    jax.jit,
    static_argnames=("mesh", "samples_per_pixel", "bounce_limit", "lr"),
)
def train_step(
    params: dict,
    scene,
    cam: Camera,
    target_xyz: jnp.ndarray,
    key: jax.Array,
    mesh,
    samples_per_pixel: int,
    bounce_limit: int,
    lr: float = 1e-2,
):
    """One SGD step of inverse rendering on the device mesh.

    Renders the scene under ``params``, L2-compares against ``target_xyz``
    [H, W, 3] (mean-per-sample XYZ), and descends the material/dispersion
    parameters. The gradient all-reduce is the transpose of the forward
    sample-axis psum — pure ICI traffic.
    """

    def loss_fn(p):
        s = apply_params(scene, p)
        xyz = render_image_sharded(
            s, cam, key, mesh, samples_per_pixel, bounce_limit
        )
        img = xyz / float(samples_per_pixel)
        return jnp.mean((img - target_xyz) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
    return new_params, loss
