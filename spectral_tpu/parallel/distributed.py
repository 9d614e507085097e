"""Multi-host (multi-process) entry: jax.distributed wiring + global mesh.

The reference is strictly single-GPU/single-process (its render_manager.cu
chunk loop runs on one host); the TPU deployment target is an N-host pod
slice. This module is the missing piece flagged in round 1: a real
``jax.distributed.initialize`` entry point and a (host, chip)-aware global
mesh, so the (tile, sample) decomposition of parallel/mesh.py spans hosts
with the axes laid out to keep collectives on ICI:

- the ``tile`` axis is ordered host-major: image rows shard across hosts
  first, so rendering needs ZERO inter-host traffic (each host owns a row
  block, exactly like the reference's sequential chunk loop but spatial);
- the ``sample`` axis always lies INSIDE a host (chips on ICI), so the
  per-pixel XYZ psum and the gradient all-reduce's hot inner stage ride
  ICI; only the final cross-host gradient reduction (small parameter
  pytree, once per step) touches DCN.

Launch recipe (one process per host; TPU pods discover topology
automatically, so plain ``initialize()`` suffices):

    # host 0..N-1, e.g. via gcloud compute tpus tpu-vm ssh --worker=all
    python -m spectral_tpu.train --distributed ...

    # CPU/GPU clusters need explicit coordination:
    SPECTRAL_COORD=host0:8476 SPECTRAL_NPROC=4 SPECTRAL_PROC_ID=$i \
        python -m spectral_tpu.train --distributed ...

Verified multi-process on CPU by tests/test_distributed.py (two local
processes, loopback coordinator), and multi-chip by dryrun_multichip's
virtual 8-device mesh (single process) — a real pod run composes the two.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import SAMPLE_AXIS, TILE_AXIS, factor_devices


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed for a multi-process run. Returns True
    when running distributed (process_count > 1 after init).

    Arguments default from SPECTRAL_COORD / SPECTRAL_NPROC /
    SPECTRAL_PROC_ID, falling back to jax's own autodetection (TPU pods
    need no explicit configuration). Safe to call when single-process:
    with no coordinator configured anywhere this is a no-op.
    """
    coordinator_address = coordinator_address or os.environ.get("SPECTRAL_COORD")
    if num_processes is None and os.environ.get("SPECTRAL_NPROC"):
        num_processes = int(os.environ["SPECTRAL_NPROC"])
    if process_id is None and os.environ.get("SPECTRAL_PROC_ID"):
        process_id = int(os.environ["SPECTRAL_PROC_ID"])

    already = getattr(
        jax._src.distributed.global_state, "client", None  # noqa: SLF001
    ) is not None
    if not already:
        if coordinator_address is not None:
            # NOTE: must run before anything touches the XLA backend
            # (jax.devices / default_backend / any computation)
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        elif jax.default_backend() == "tpu":
            # TPU pods autodetect topology; no explicit coordination needed
            jax.distributed.initialize()
        else:
            # nothing to coordinate against on CPU/GPU without an address
            return jax.process_count() > 1
    return jax.process_count() > 1


def make_global_mesh(devices=None) -> Mesh:
    """A (tile, sample) mesh over ALL processes' devices, host-major on
    ``tile`` (see module docstring for the ICI/DCN layout rationale).

    Single-process this reduces exactly to parallel.mesh.make_mesh's
    factoring, so every consumer can use it unconditionally.
    """
    if devices is None:
        devices = jax.devices()  # global, ordered by process_index
    n = len(devices)
    n_proc = jax.process_count()
    local = n // max(n_proc, 1)
    if n_proc > 1:
        # sample extent from the LOCAL chip count so the psum stays on ICI
        _, ns = factor_devices(local)
        nt = n // ns
        # devices are process-major already; reshape keeps each host's
        # chips contiguous along the trailing (sample) axis
        arr = np.asarray(devices).reshape(nt, ns)
    else:
        nt, ns = factor_devices(n)
        arr = np.asarray(devices).reshape(nt, ns)
    return Mesh(arr, (TILE_AXIS, SAMPLE_AXIS))


def local_row_block(height: int, mesh: Mesh) -> tuple[int, int]:
    """(row0, rows) of this process's image slab under host-major tile
    sharding — the multi-host replacement for the reference's sequential
    chunk loop bookkeeping (render_manager.cu:23-49).

    Raises on indivisible extents instead of silently dropping rows
    (round-5 failure-path hardening: height 10 on a 4-tile mesh used to
    return 2-row slabs covering only rows 0-7)."""
    nt = mesh.shape[TILE_AXIS]
    n_proc = max(jax.process_count(), 1)
    if height % nt:
        raise ValueError(
            f"height {height} must divide the tile extent {nt}"
        )
    if nt % n_proc:
        raise ValueError(
            f"tile extent {nt} must divide across {n_proc} processes "
            "(host-major sharding needs whole tiles per host)"
        )
    rows_per_tile = height // nt
    tiles_per_proc = nt // n_proc
    r0 = jax.process_index() * tiles_per_proc * rows_per_tile
    return r0, tiles_per_proc * rows_per_tile
