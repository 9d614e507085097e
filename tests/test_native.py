"""Native C++ framebuffer ops == the jnp/python reference paths, exactly."""

from __future__ import annotations

import numpy as np
import pytest

from spectral_tpu.io.image import encode_bmp_py
from spectral_tpu.runtime import native


@pytest.fixture(scope="module")
def built():
    if not native.available():
        pytest.skip("native library could not be built")
    return True


class TestXyzToSrgb:
    def test_matches_jnp_path(self, built):
        import jax.numpy as jnp

        from spectral_tpu.render.wavefront import xyz_to_image

        rng = np.random.default_rng(0)
        spp = 8
        # include negatives, zeros, small linear-segment values, > white
        xyz = rng.uniform(-0.2, 2.0, (37, 53, 3)).astype(np.float32) * spp
        ref = np.asarray(xyz_to_image(jnp.asarray(xyz), spp))
        got = native.xyz_to_srgb_u8(xyz, spp)
        diff = np.abs(ref.astype(int) - got.astype(int))
        # pow() may differ by 1 ulp between libm and XLA; quantization can
        # amplify that to one 8-bit step on exact boundaries
        assert (diff <= 1).all()
        assert (diff == 0).mean() > 0.999

    def test_large_frame_multithreaded(self, built):
        rng = np.random.default_rng(1)
        xyz = rng.uniform(0, 4.0, (1080, 1920, 3)).astype(np.float32)
        out = native.xyz_to_srgb_u8(xyz, 4)
        assert out.shape == (1080, 1920, 3) and out.dtype == np.uint8


class TestBmp:
    @pytest.mark.parametrize("w,h", [(7, 5), (64, 64), (33, 17)])
    def test_byte_identical_to_python(self, built, w, h):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        assert native.encode_bmp(img) == encode_bmp_py(img)
