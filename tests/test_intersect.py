"""Intersection oracle tests: the MXU edge-functional formulation vs
hand-built cases and a naive per-ray reference (SURVEY.md section 4 item 1)."""

import numpy as np
import jax
import jax.numpy as jnp

from spectral_tpu.models.geometry import TriSoup, finalize
from spectral_tpu.models.scenes import CORNELL, build_scene
from spectral_tpu.ops.intersect import BIG, nearest_hit, ray_aabb


def _mini_scene(soup):
    """finalize() output wrapped into an intersect-compatible namespace."""
    import types

    f = finalize(soup)
    return types.SimpleNamespace(**{k: jnp.asarray(v) for k, v in f.items()})


class TestSingleTriangle:
    def setup_method(self):
        s = TriSoup()
        s.tri((0, 0, 5), (4, 0, 5), (0, 4, 5), 7)
        self.scene = _mini_scene(s)

    def test_center_hit(self):
        o = jnp.array([[1.0, 1.0, 0.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        rec = nearest_hit(o, d, self.scene)
        assert bool(rec.hit[0])
        assert abs(float(rec.t[0]) - 5.0) < 1e-5
        np.testing.assert_allclose(np.array(rec.p[0]), [1, 1, 5], atol=1e-5)
        assert int(rec.mat_index[0]) == 7
        # normal faces the ray origin (hit_record.cuh:30-45)
        assert float(rec.normal[0] @ d[0]) < 0

    def test_miss_outside(self):
        o = jnp.array([[3.0, 3.0, 0.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        rec = nearest_hit(o, d, self.scene)
        assert not bool(rec.hit[0])
        assert float(rec.t[0]) >= float(BIG) * 0.99

    def test_parallel_ray_misses(self):
        o = jnp.array([[1.0, 1.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        rec = nearest_hit(o, d, self.scene)
        assert not bool(rec.hit[0])

    def test_behind_origin_misses(self):
        o = jnp.array([[1.0, 1.0, 10.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        rec = nearest_hit(o, d, self.scene)
        assert not bool(rec.hit[0])

    def test_back_face_flips_normal(self):
        o = jnp.array([[1.0, 1.0, 10.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        rec = nearest_hit(o, d, self.scene)
        assert bool(rec.hit[0])
        assert float(rec.normal[0] @ d[0]) < 0


class TestNearest:
    def test_picks_closest_of_stack(self):
        s = TriSoup()
        for z, m in ((10.0, 0), (5.0, 1), (7.0, 2)):
            s.tri((-10, -10, z), (10, -10, z), (0, 10, z), m)
        scene = _mini_scene(s)
        rec = nearest_hit(jnp.zeros((1, 3)), jnp.array([[0.0, 0.0, 1.0]]), scene)
        assert int(rec.mat_index[0]) == 1
        assert abs(float(rec.t[0]) - 5.0) < 1e-5

    def test_unnormalized_direction_t_scaling(self):
        s = TriSoup()
        s.tri((-10, -10, 6), (10, -10, 6), (0, 10, 6), 0)
        scene = _mini_scene(s)
        rec = nearest_hit(jnp.zeros((1, 3)), jnp.array([[0.0, 0.0, 3.0]]), scene)
        assert abs(float(rec.t[0]) - 2.0) < 1e-6  # t in direction-lengths


class TestVsNaive:
    def test_random_rays_match_naive_oracle(self):
        """Batched MXU intersector == per-ray Moller-Trumbore oracle."""
        scene = build_scene(CORNELL)
        rng = np.random.default_rng(0)
        n = 256
        o = rng.uniform(50, 500, (n, 3)).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        rec = nearest_hit(jnp.asarray(o), jnp.asarray(d), scene)

        v0 = np.array(scene.v0, np.float64)
        v1 = np.array(scene.v1, np.float64)
        v2 = np.array(scene.v2, np.float64)

        def naive(o1, d1):
            best_t, best_i = np.inf, -1
            for i in range(v0.shape[0]):
                e1, e2 = v1[i] - v0[i], v2[i] - v0[i]
                h = np.cross(d1, e2)
                a = e1 @ h
                if abs(a) < 1e-12:
                    continue
                f = 1.0 / a
                sv = o1 - v0[i]
                u = f * (sv @ h)
                q = np.cross(sv, e1)
                vv = f * (d1 @ q)
                t = f * (e2 @ q)
                if -1e-9 <= u <= 1 + 1e-9 and -1e-9 <= vv and u + vv <= 1 + 1e-9 and t > 1e-6:
                    if t < best_t:
                        best_t, best_i = t, i
            return best_t, best_i

        hits = np.array(rec.hit)
        ts = np.array(rec.t)
        idxs = np.array(rec.tri_index)
        mismatches = 0
        for k in range(n):
            t_ref, i_ref = naive(o[k].astype(np.float64), d[k].astype(np.float64))
            if i_ref < 0:
                mismatches += int(hits[k])
            else:
                # allow edge-grazing disagreement between f32 and f64
                if not hits[k] or abs(ts[k] - t_ref) > 1e-2 * max(1.0, t_ref):
                    mismatches += 1
        assert mismatches <= 2, f"{mismatches} / {n} rays disagree with oracle"


class TestAABB:
    def test_hit_and_miss(self):
        o = jnp.array([[0.0, 0.0, -5.0], [10.0, 10.0, -5.0]])
        d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        inv = 1.0 / d
        bb_min = jnp.array([[-1.0, -1.0, -1.0]])
        bb_max = jnp.array([[1.0, 1.0, 1.0]])
        out = ray_aabb(o, inv, bb_min, bb_max)
        assert bool(out[0, 0]) and not bool(out[1, 0])

    def test_ray_inside_box(self):
        o = jnp.array([[0.0, 0.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        out = ray_aabb(o, 1.0 / d, jnp.array([[-1.0] * 3]), jnp.array([[1.0] * 3]))
        assert bool(out[0, 0])


class TestGradients:
    def test_t_gradient_wrt_vertices(self):
        """d(t)/d(plane position): moving the triangle +z by dz increases t
        by dz for a unit z-ray (finite-difference check)."""

        def t_of_offset(dz):
            s = TriSoup()
            s.tri((0, 0, 5), (4, 0, 5), (0, 4, 5), 0)
            sc = _mini_scene(s)
            import dataclasses, types

            d_shift = sc.d + dz * 1.0  # plane offset moves with dz (normal=+z)
            sc2 = types.SimpleNamespace(**{**sc.__dict__, "d": d_shift})
            rec = nearest_hit(jnp.array([[1.0, 1.0, 0.0]]), jnp.array([[0.0, 0.0, 1.0]]), sc2)
            return rec.t[0]

        g = jax.grad(t_of_offset)(jnp.float32(0.0))
        assert abs(float(g) - 1.0) < 1e-4
