"""Golden-image regression tests.

Both render paths are deterministic given a key (the XLA path via
jax.random; the megakernel via injected uniform planes), so small renders
are pinned bit-for-bit against committed goldens. Any semantic change to
the light transport — intersection, shading, spectral pipeline, color —
shows up here immediately. Regenerate intentionally with
scripts/regen_goldens.py after a deliberate change.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import pytest

from spectral_tpu.models.scenes import CORNELL, PRISM, build_scene, scene_camera
from spectral_tpu.ops.pallas.render_kernel import render_chunk_pallas
from spectral_tpu.render.wavefront import render_chunk

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _golden(name):
    return np.load(os.path.join(GOLDEN_DIR, name))


class TestGoldens:
    def test_cornell_xla(self):
        scene = build_scene(CORNELL)
        cam = scene_camera(CORNELL, 24, 24)
        img = np.asarray(
            render_chunk(scene, cam, jax.random.PRNGKey(123), 0, 0, 24, 24, 4, 3)
        )
        np.testing.assert_allclose(
            img, _golden("cornell_xla_24px.npy"), rtol=1e-5, atol=1e-6
        )

    def test_cornell_pallas_interpret(self):
        scene = build_scene(CORNELL)
        cam = scene_camera(CORNELL, 24, 24)
        img = np.asarray(
            render_chunk_pallas(
                scene, cam, 9, 0, 0, 24, 24, 4, 3,
                ray_tile=1024, interpret=True, rand_key=jax.random.PRNGKey(42),
            )
        )
        np.testing.assert_allclose(
            img, _golden("cornell_pallas_24px.npy"), rtol=1e-5, atol=1e-6
        )

    def test_prism_xla(self):
        scene = build_scene(PRISM)
        cam = scene_camera(PRISM, 24, 24)
        img = np.asarray(
            render_chunk(scene, cam, jax.random.PRNGKey(7), 0, 0, 24, 24, 4, 5)
        )
        np.testing.assert_allclose(
            img, _golden("prism_xla_24px.npy"), rtol=1e-5, atol=1e-6
        )
