"""RenderManager: chunk decomposition, progressive hooks, checkpoint/resume."""

from __future__ import annotations

import jax
import numpy as np
import pytest

import spectral_tpu.runtime.render_manager as rm_mod
from spectral_tpu.config import RenderParams
from spectral_tpu.models.scenes import CORNELL, build_scene, scene_camera
from spectral_tpu.runtime.render_manager import RenderManager


@pytest.fixture(scope="module")
def cornell():
    return build_scene(CORNELL)


def make_rm(cornell, xres=16, chunk=8, spp=2, bounces=2):
    p = RenderParams(xres=xres, xcsize=chunk, nsamples=spp, bounce_limit=bounces, impl="xla")
    cam = scene_camera(CORNELL, p.xres, p.yres)
    return RenderManager(cornell, cam, p)


class TestChunks:
    def test_grid_covers_image_exactly(self, cornell):
        rm = make_rm(cornell, xres=20, chunk=8)
        cells = list(rm.chunks())
        # 20x20 with 8x8 chunks -> 3x3 grid with clamped edges
        assert len(cells) == 9
        covered = np.zeros((20, 20), int)
        for x0, y0, w, h in cells:
            covered[y0 : y0 + h, x0 : x0 + w] += 1
        assert (covered == 1).all()

    def test_progressive_hook_sees_all_chunks(self, cornell):
        rm = make_rm(cornell)
        seen = []
        rm.render(jax.random.PRNGKey(0), on_chunk=lambda c, fb: seen.append((c.x0, c.y0)))
        assert sorted(seen) == sorted((x, y) for x, y, _, _ in rm.chunks())


class TestCheckpoint:
    def test_resume_skips_done_chunks(self, cornell, tmp_path):
        ckpt = str(tmp_path / "render.npz")
        rm = make_rm(cornell)
        img1 = rm.render(jax.random.PRNGKey(1), checkpoint=ckpt)

        calls = []
        orig = rm_mod.render_chunk

        def counting(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        rm2 = make_rm(cornell)
        rm_mod.render_chunk = counting
        try:
            img2 = rm2.render(jax.random.PRNGKey(1), checkpoint=ckpt)
        finally:
            rm_mod.render_chunk = orig
        assert calls == []  # everything restored from the checkpoint
        np.testing.assert_array_equal(img1, img2)

    def test_partial_resume(self, cornell, tmp_path):
        ckpt = str(tmp_path / "render.npz")
        rm = make_rm(cornell)
        img_full = rm.render(jax.random.PRNGKey(1), checkpoint=ckpt)

        # corrupt the checkpoint down to half the chunks
        z = np.load(ckpt)
        done = z["done"][: len(z["done"]) // 2]
        np.savez(ckpt, fb_xyz=z["fb_xyz"], done=done)

        rm2 = make_rm(cornell)
        img_resumed = rm2.render(jax.random.PRNGKey(1), checkpoint=ckpt)
        np.testing.assert_array_equal(img_full, img_resumed)
