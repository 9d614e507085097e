"""Regenerate tests/goldens/*.npy after a DELIBERATE semantic change.

Run: PYTHONPATH= JAX_PLATFORMS=cpu /opt/venv/bin/python scripts/regen_goldens.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from spectral_tpu.models.scenes import CORNELL, PRISM, build_scene, scene_camera
from spectral_tpu.ops.pallas.render_kernel import render_chunk_pallas
from spectral_tpu.render.wavefront import render_chunk

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    cornell = build_scene(CORNELL)
    cam = scene_camera(CORNELL, 24, 24)
    np.save(
        os.path.join(OUT, "cornell_xla_24px.npy"),
        np.asarray(render_chunk(cornell, cam, jax.random.PRNGKey(123), 0, 0, 24, 24, 4, 3)),
    )
    np.save(
        os.path.join(OUT, "cornell_pallas_24px.npy"),
        np.asarray(
            render_chunk_pallas(
                cornell, cam, 9, 0, 0, 24, 24, 4, 3,
                ray_tile=1024, interpret=True, rand_key=jax.random.PRNGKey(42),
            )
        ),
    )
    prism = build_scene(PRISM)
    np.save(
        os.path.join(OUT, "prism_xla_24px.npy"),
        np.asarray(
            render_chunk(prism, scene_camera(PRISM, 24, 24), jax.random.PRNGKey(7), 0, 0, 24, 24, 4, 5)
        ),
    )
    print("goldens written to", os.path.normpath(OUT))


if __name__ == "__main__":
    main()
