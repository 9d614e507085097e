"""Converged-image parity contract, CI-runnable downsampled version.

The on-chip contract (BASELINE.md round-2 table) compares the XLA
wavefront and the pallas megakernel at 128x128/256spp on TPU; here the
same noise-floor-relative methodology runs on CPU at a size the suite can
afford: the pallas-vs-XLA block-downsampled error must not exceed 1.2x
the XLA-vs-XLA reseed error, and mean luminance must agree to 2.5%.
(The CI thresholds are looser than the on-chip contract's 1.1x/2% because
the small CI sample count makes the ratio itself noisy; the pinned
hardware numbers live in BASELINE.md. Round-4 tightening from 1.35x/3%:
at 128 spp the measured margins are ratio 0.86/0.70 and lum deviation
1.1%/0.05% on Cornell/prism — comfortably inside 1.2x/2.5%.)

Reference semantics: rendering/rendering.cu:151-235 (the estimator both
paths implement); tolerance contract per SURVEY.md section 6.
"""

import jax
import numpy as np
import pytest

from spectral_tpu.models.scenes import CORNELL, PRISM, build_scene, scene_camera
from spectral_tpu.ops.pallas.render_kernel import render_chunk_pallas
from spectral_tpu.render.wavefront import render_chunk

SIZE, SPP, BL, CH = 64, 128, 5, 16


def _down(img, b=8):
    h, w, c = img.shape
    return img.reshape(h // b, b, w // b, b, c).mean((1, 3))


def _rel(a, b):
    da, db = _down(a), _down(b)
    return float(
        (np.abs(da - db).sum(-1) / (np.abs(da).sum(-1) + 1e-3)).mean()
    )


@pytest.mark.parametrize("sid", [CORNELL, PRISM])
def test_cross_path_error_at_noise_floor(sid):
    scene = build_scene(sid)
    cam = scene_camera(sid, SIZE, SIZE)

    def xla_img(base):
        acc = 0
        for i in range(SPP // CH):
            acc = acc + render_chunk(
                scene, cam, jax.random.PRNGKey(base + i), 0, 0, SIZE, SIZE, CH, BL
            )
        return np.asarray(acc) / SPP

    def pal_img(base):
        acc = 0
        for i in range(SPP // CH):
            acc = acc + render_chunk_pallas(
                scene, cam, 0, 0, 0, SIZE, SIZE, CH, BL,
                interpret=True, rand_key=jax.random.PRNGKey(base + i),
            )
        return np.asarray(acc) / SPP

    x1 = xla_img(100)
    x2 = xla_img(900)
    p1 = pal_img(4242)

    noise = _rel(x1, x2)
    cross = _rel(p1, 0.5 * (x1 + x2))
    lum = p1[..., 1].mean() / max(0.5 * (x1 + x2)[..., 1].mean(), 1e-9)
    assert cross <= 1.2 * noise, (cross, noise)
    # CI sample counts make mean luminance itself ~1% noisy at 128 spp;
    # the 2% hardware contract is pinned in BASELINE.md at 256 spp on chip
    assert 0.975 <= lum <= 1.025, lum
