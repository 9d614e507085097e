"""Config/flag parity, image encoders, and log-context behavior."""

from __future__ import annotations

import io
import os
import struct
import zlib

import numpy as np
import pytest

from spectral_tpu.config import CORNELL, PRISM, RenderParams, parse_args
from spectral_tpu.io.image import encode_bmp, encode_png, encode_ppm, save_image
from spectral_tpu.utils.logging import LogContext


class TestParams:
    def test_defaults_match_reference(self):
        """params.h:204-222."""
        p = RenderParams()
        assert (p.scene, p.xres, p.aspect_ratio) == (CORNELL, 600, 1.0)
        assert (p.nsamples, p.bounce_limit) == (500, 10)
        assert p.show and not p.save and not p.do_log
        assert p.yres == 600

    def test_yres_derived(self):
        """params.h:176-180."""
        p = RenderParams(xres=1920, aspect_ratio=16 / 9)
        assert p.yres == 1080
        p = RenderParams(xres=1, aspect_ratio=100.0)
        assert p.yres == 1  # min clamp

    def test_chunk_fallback_chain(self):
        """xc -> yc -> full res (params.h:53-63)."""
        p = RenderParams(xres=600)
        assert (p.chunk_width, p.chunk_height) == (600, 600)
        p = RenderParams(xres=600, xcsize=100)
        assert (p.chunk_width, p.chunk_height) == (100, 100)
        p = RenderParams(xres=600, ycsize=50)
        assert (p.chunk_width, p.chunk_height) == (50, 50)
        p = RenderParams(xres=600, xcsize=100, ycsize=50)
        assert (p.chunk_width, p.chunk_height) == (100, 50)

    def test_parse_all_flags(self):
        p = parse_args(
            "-t demo -lsub sub -s 1 -xr 800 -ar 2.0 -xc 64 -yc 32 "
            "-ns 16 -bl 4 --do-log --no-show --save".split()
        )
        assert p.title == "demo" and p.log_subdir == "sub"
        assert p.scene == PRISM and p.xres == 800 and p.aspect_ratio == 2.0
        assert p.xcsize == 64 and p.ycsize == 32
        assert p.nsamples == 16 and p.bounce_limit == 4
        assert p.do_log and not p.show and p.save

    def test_malformed_value_keeps_default(self):
        """params.h:93-161 parse-error tolerance."""
        p = parse_args(["-xr", "abc", "-ns", "1e3"])
        assert p.xres == 600 and p.nsamples == 500

    def test_unknown_scene_falls_back(self):
        assert parse_args(["-s", "9"]).scene == CORNELL

    def test_unknown_flags_ignored(self):
        p = parse_args(["--frobnicate", "-xr", "128"])
        assert p.xres == 128


def checker(h=5, w=7):
    img = np.zeros((h, w, 3), np.uint8)
    img[::2, ::2] = (255, 0, 0)
    img[1::2, 1::2] = (0, 255, 128)
    return img


class TestImageEncoders:
    def test_bmp_layout(self):
        img = checker()
        data = encode_bmp(img)
        assert data[:2] == b"BM"
        (offset,) = struct.unpack("<I", data[10:14])
        w, h = struct.unpack("<ii", data[18:26])
        assert (w, h) == (7, 5) and offset == 54
        row = 7 * 3
        pad = (4 - row % 4) % 4
        # bottom row of file = top row of image, BGR
        first = np.frombuffer(data[54 : 54 + row], np.uint8).reshape(7, 3)
        np.testing.assert_array_equal(first[:, ::-1], img[-1])
        assert len(data) == 54 + (row + pad) * 5

    def test_ppm_roundtrip(self):
        img = checker()
        data = encode_ppm(img)
        hdr, body = data.split(b"\n255\n", 1)
        assert hdr == b"P6\n7 5"
        np.testing.assert_array_equal(
            np.frombuffer(body, np.uint8).reshape(5, 7, 3), img
        )

    def test_png_decodes(self):
        img = checker(4, 4)
        data = encode_png(img)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        idat = data.index(b"IDAT")
        (ln,) = struct.unpack(">I", data[idat - 4 : idat])
        raw = zlib.decompress(data[idat + 4 : idat + 4 + ln])
        rows = np.frombuffer(raw, np.uint8).reshape(4, 1 + 4 * 3)
        assert (rows[:, 0] == 0).all()
        np.testing.assert_array_equal(rows[:, 1:].reshape(4, 4, 3), img)

    def test_save_dispatch_and_errors(self, tmp_path):
        img = checker()
        for ext in (".bmp", ".ppm", ".png"):
            path = save_image(img, str(tmp_path / f"x{ext}"))
            assert os.path.getsize(path) > 0
        with pytest.raises(ValueError):
            save_image(img, str(tmp_path / "x.jpg"))
        with pytest.raises(TypeError):
            save_image(img.astype(np.float32), str(tmp_path / "y.bmp"))


class TestLogContext:
    def test_ordered_entries_and_types(self, tmp_path):
        log = LogContext("t1", "sub")
        log.add_entry("zeta", 1)
        log.add_entry("alpha", 2.5)
        log.add_entry("name", "hello")
        assert [k for k, _ in log.items()] == ["zeta", "alpha", "name"]
        path = log.to_file(str(tmp_path))
        assert "/sub/" in path and path.endswith("_t1_log.txt")
        text = open(path).read()
        assert "zeta: 1\nalpha: 2.5\nname: hello\n" == text

    def test_sum_value(self):
        log = LogContext()
        log.sum_value("acc", 1.5)
        log.sum_value("acc", 2.25)
        assert float(log.get("acc")) == 3.75
