"""Scene construction goldens: primitive emitters, transforms, and the three
hard-coded worlds (SURVEY.md section 4 item 2)."""

import math

import numpy as np
import pytest

from spectral_tpu.models.geometry import TriSoup, finalize, rotation_matrix
from spectral_tpu.models.materials import DIELECTRIC, EMISSIVE, LAMBERTIAN, METALLIC
from spectral_tpu.models.scenes import (
    CORNELL,
    PRISM,
    TRIS,
    build_scene,
    expected_sizes,
    scene_camera,
)


class TestEmitters:
    def test_quad_two_tris(self):
        s = TriSoup()
        s.quad((0, 0, 0), (2, 0, 0), (0, 3, 0), 5)
        assert len(s) == 2
        # second tri is (Q+u+v, -u, -v) in VECTORS mode (tri_quad.cuh:17)
        np.testing.assert_allclose(s.v[1][0], [2, 3, 0])
        np.testing.assert_allclose(s.v[1][1], [0, 3, 0])
        np.testing.assert_allclose(s.v[1][2], [2, 0, 0])
        assert s.mat_index == [5, 5]

    def test_box_counts_and_face_materials(self):
        s = TriSoup()
        s.box((0, 0, 0), (1, 1, 1), [0, 1, 2, 3, 4, 5])
        assert len(s) == 12
        assert s.mat_index == [0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5]

    def test_box_normals_outward(self):
        s = TriSoup()
        s.box((0, 0, 0), (1, 1, 1), 0)
        f = finalize(s)
        # every tri normal should point away from the box center
        center = np.array([0.5, 0.5, 0.5])
        centroids = (f["v0"] + f["v1"] + f["v2"]) / 3.0
        outward = np.einsum("ij,ij->i", f["normal"], centroids - center)
        assert (outward > 0).all()

    def test_prism_counts(self):
        s = TriSoup()
        s.prism((0, 0, 0), (1, 0, 0), (0.5, 0.866, 0), (0, 0, 2), 1)
        assert len(s) == 8

    def test_pyramid_counts_and_apex(self):
        s = TriSoup()
        s.pyramid((0, 0, 0), (2, 0, 0), (0, 0, 2), (0, 3, 0), 1)
        assert len(s) == 6
        # apex = base center + w (pyramid.cuh:32)
        apex = np.array([1.0, 3.0, 1.0])
        np.testing.assert_allclose(s.v[2][1], apex)

    def test_rotation_matrix_matches_reference_layout(self):
        # transform.cu:17-22 Y-axis: row0 = (c, 0, s), row2 = (-s, 0, c)
        m = rotation_matrix(math.pi / 2, "Y")
        np.testing.assert_allclose(m @ np.array([1, 0, 0]), [0, 0, -1], atol=1e-12)
        np.testing.assert_allclose(m @ np.array([0, 0, 1]), [1, 0, 0], atol=1e-12)

    def test_rotate_about_pivot(self):
        s = TriSoup()
        s.tri((1, 0, 0), (2, 0, 0), (1, 1, 0), 0)
        s.rotate(0, math.pi, "Z", pivot=(1, 0, 0))
        np.testing.assert_allclose(s.v[0][0], [1, 0, 0], atol=1e-12)
        np.testing.assert_allclose(s.v[0][1], [0, 0, 0], atol=1e-12)

    def test_flip_normals(self):
        s = TriSoup()
        s.tri((0, 0, 0), (1, 0, 0), (0, 1, 0), 0)
        n0 = finalize(s)["normal"][0].copy()
        s.flip_normals(0)
        n1 = finalize(s)["normal"][0]
        np.testing.assert_allclose(n1, -n0, atol=1e-6)


class TestFinalize:
    def test_plane_equation(self):
        s = TriSoup()
        s.tri((0, 0, 2), (1, 0, 2), (0, 1, 2), 0)
        f = finalize(s)
        np.testing.assert_allclose(f["normal"][0], [0, 0, 1], atol=1e-7)
        assert abs(f["d"][0] - 2.0) < 1e-6

    def test_edge_functionals_classify_points(self):
        s = TriSoup()
        s.tri((0, 0, 0), (4, 0, 0), (0, 4, 0), 0)
        f = finalize(s)
        inside = np.array([1.0, 1.0, 0.0])
        outside = np.array([3.0, 3.0, 0.0])
        gi = f["edge_g"][0] @ inside + f["edge_c"][0]
        go = f["edge_g"][0] @ outside + f["edge_c"][0]
        assert (gi >= 0).all()
        assert not (go >= 0).all()

    def test_degenerate_aabb_padded(self):
        s = TriSoup()
        s.tri((0, 0, 0), (1, 0, 0), (0, 1, 0), 0)  # z-extent is 0
        f = finalize(s)
        assert f["bbox_max"][0, 2] - f["bbox_min"][0, 2] > 0


@pytest.mark.parametrize("sid", [CORNELL, PRISM, TRIS])
class TestScenes:
    def test_golden_counts(self, sid):
        scene = build_scene(sid)
        tris, mats = expected_sizes(sid)
        assert scene.num_tris == tris
        assert scene.materials.mat_type.shape[0] == mats

    def test_geometry_inside_room(self, sid):
        scene = build_scene(sid)
        v = np.concatenate([np.array(scene.v0), np.array(scene.v1), np.array(scene.v2)])
        assert v.min() > -1.0 and v.max() < 556.0

    def test_spd_tables_sane(self, sid):
        scene = build_scene(sid)
        spd = np.array(scene.materials.spd)
        assert np.isfinite(spd).all()
        types = np.array(scene.materials.mat_type)
        # dielectric rows are identically 1 (material.cuh:77-79)
        for i, t in enumerate(types):
            if t == DIELECTRIC:
                np.testing.assert_allclose(spd[i], 1.0)
            elif t == EMISSIVE:
                # power^2 * sigmoid * normalized-D65; peak of normalized D65
                # is ~0.0111, so the 5x light peaks near 25 * 0.0111 ~ 0.28
                assert 0.1 < spd[i].max() < 1.0
            else:
                assert (spd[i] >= 0).all() and (spd[i] <= 1.0 + 1e-5).all()


class TestSceneSpecifics:
    def test_cornell_material_order(self):
        scene = build_scene(CORNELL)
        types = list(np.array(scene.materials.mat_type))
        # scene.cu:74-80 order: red, green, dielectric, white, light, metal, blue
        assert types == [LAMBERTIAN, LAMBERTIAN, DIELECTRIC, LAMBERTIAN, EMISSIVE, METALLIC, LAMBERTIAN]

    def test_cornell_light_position(self):
        scene = build_scene(CORNELL)
        mi = np.array(scene.mat_index)
        light_tris = np.where(mi == 4)[0]
        assert len(light_tris) == 2
        v = np.array(scene.v0)[light_tris]
        assert np.allclose(v[:, 1], 554.0)  # light plane height (scene.cu:100)

    def test_prism_dielectric_c_equals_b(self):
        # the reference ctor stores C := B (material.cuh:63-69); replicated
        scene = build_scene(PRISM)
        b = np.array(scene.materials.sellmeier_b)[2]
        c = np.array(scene.materials.sellmeier_c)[2]
        np.testing.assert_allclose(b, c)

    def test_camera_pose(self):
        cam = scene_camera(CORNELL, 600, 600)
        np.testing.assert_allclose(np.array(cam.center), [278, 278, -800])
        # pixel00 is in the image plane at focus_dist=10 in front of camera
        p00 = np.array(cam.pixel00_loc)
        assert abs(p00[2] - (-790.0)) < 1e-3
        # viewport height = 2 tan(20 deg) * 10
        vp_h = 2 * math.tan(math.radians(20.0)) * 10.0
        dv = np.array(cam.pixel_delta_v)
        np.testing.assert_allclose(np.linalg.norm(dv), vp_h / 600.0, rtol=1e-5)
