"""LBVH build invariants + traversal equivalence vs the dense intersector.

SURVEY.md section 4 anchor 1: "BVH vs brute-force all-tris intersection
equivalence" — the reference has no tests; this is the oracle its design
implies (bvh::hit must find the same nearest hit as a linear scan,
reference bvh/bvh.cu:99-166).
"""

from __future__ import annotations

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectral_tpu.models.geometry import TriSoup, finalize
from spectral_tpu.ops.bvh import build_lbvh, nearest_hit_bvh
from spectral_tpu.ops.intersect import BIG, nearest_hit


def random_scene(n_tris: int, seed: int = 0):
    """A lightweight scene namespace over random triangles in [0, 100]^3."""
    rng = np.random.default_rng(seed)
    soup = TriSoup()
    for _ in range(n_tris):
        base = rng.uniform(0.0, 100.0, 3)
        e1 = rng.uniform(-8.0, 8.0, 3)
        e2 = rng.uniform(-8.0, 8.0, 3)
        # reject near-degenerate triangles
        while np.linalg.norm(np.cross(e1, e2)) < 1e-3:
            e1 = rng.uniform(-8.0, 8.0, 3)
            e2 = rng.uniform(-8.0, 8.0, 3)
        soup.tri(base, base + e1, base + e2, 0)
    arrs = finalize(soup)
    return types.SimpleNamespace(**{k: jnp.asarray(v) for k, v in arrs.items()})


def random_rays(n: int, seed: int = 1):
    rng = np.random.default_rng(seed)
    # half from outside looking at the cloud center, half from inside
    o_out = rng.uniform(-150.0, -50.0, (n // 2, 3))
    o_in = rng.uniform(20.0, 80.0, (n - n // 2, 3))
    o = np.concatenate([o_out, o_in])
    target = rng.uniform(0.0, 100.0, (n, 3))
    d = target - o + rng.normal(0.0, 5.0, (n, 3))
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


class TestBuildInvariants:
    @pytest.mark.parametrize("n_tris,leaf_size", [(5, 8), (37, 4), (200, 8)])
    def test_order_is_permutation_with_pad(self, n_tris, leaf_size):
        scene = random_scene(n_tris)
        bvh = build_lbvh(scene.bbox_min, scene.bbox_max, leaf_size)
        order = np.asarray(bvh.order)
        t_pad = -(-n_tris // leaf_size) * leaf_size
        assert order.shape == (t_pad,)
        assert set(order[:n_tris].tolist()) == set(range(n_tris))
        assert (order[n_tris:] == order[n_tris - 1]).all()

    @pytest.mark.parametrize("n_tris,leaf_size", [(37, 4), (200, 8)])
    def test_parent_bbox_contains_children(self, n_tris, leaf_size):
        scene = random_scene(n_tris)
        bvh = build_lbvh(scene.bbox_min, scene.bbox_max, leaf_size)
        n_int = bvh.leaf_start.shape[0] - 1
        nmin = np.asarray(bvh.node_min)
        nmax = np.asarray(bvh.node_max)
        left = np.asarray(bvh.left)
        right = np.asarray(bvh.right)
        assert np.isfinite(nmin).all() and np.isfinite(nmax).all()
        for k in range(n_int):
            for c in (left[k], right[k]):
                assert (nmin[k] <= nmin[c] + 1e-5).all()
                assert (nmax[k] >= nmax[c] - 1e-5).all()

    @pytest.mark.parametrize("n_tris,leaf_size", [(37, 4), (200, 8)])
    def test_leaf_bbox_contains_tris(self, n_tris, leaf_size):
        scene = random_scene(n_tris)
        bvh = build_lbvh(scene.bbox_min, scene.bbox_max, leaf_size)
        n_leaves = bvh.leaf_start.shape[0]
        n_int = n_leaves - 1
        tris = np.asarray(bvh.order).reshape(n_leaves, leaf_size)
        bmin = np.asarray(scene.bbox_min)
        bmax = np.asarray(scene.bbox_max)
        for leaf in range(n_leaves):
            node = n_int + leaf
            lo = np.asarray(bvh.node_min[node])
            hi = np.asarray(bvh.node_max[node])
            assert (bmin[tris[leaf]] >= lo - 1e-5).all()
            assert (bmax[tris[leaf]] <= hi + 1e-5).all()

    def test_every_internal_node_reachable_once(self):
        scene = random_scene(100)
        bvh = build_lbvh(scene.bbox_min, scene.bbox_max, 4)
        n_leaves = bvh.leaf_start.shape[0]
        n_int = n_leaves - 1
        children = np.concatenate([np.asarray(bvh.left), np.asarray(bvh.right)])
        # every node except the root appears exactly once as a child
        counts = np.bincount(children, minlength=2 * n_leaves - 1)
        assert counts[0] == 0  # root
        assert (counts[1:] == 1).all()


class TestTraversalEquivalence:
    @pytest.mark.parametrize(
        "n_tris,leaf_size,seed",
        [(5, 8, 0), (42, 8, 1), (200, 8, 2), (513, 16, 3)],
    )
    def test_matches_dense(self, n_tris, leaf_size, seed):
        scene = random_scene(n_tris, seed)
        bvh = build_lbvh(scene.bbox_min, scene.bbox_max, leaf_size)
        o, d = random_rays(256, seed + 100)

        ref = nearest_hit(o, d, scene)
        got = nearest_hit_bvh(o, d, scene, bvh)

        np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
        hit = np.asarray(ref.hit)
        np.testing.assert_allclose(
            np.asarray(got.t)[hit], np.asarray(ref.t)[hit], rtol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(got.tri_index)[hit], np.asarray(ref.tri_index)[hit]
        )
        np.testing.assert_allclose(
            np.asarray(got.normal)[hit], np.asarray(ref.normal)[hit], rtol=1e-5
        )

    def test_jit_and_vmap_safe(self):
        scene = random_scene(64)
        bvh = build_lbvh(scene.bbox_min, scene.bbox_max, 8)
        o, d = random_rays(64)
        f = jax.jit(lambda o, d: nearest_hit_bvh(o, d, scene, bvh).t)
        t1 = f(o, d)
        t2 = f(o, d)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))

    def test_miss_rays(self):
        scene = random_scene(50)
        # rays pointing away from the cloud
        o = jnp.full((16, 3), -200.0)
        d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (16, 1))
        bvh = build_lbvh(scene.bbox_min, scene.bbox_max, 8)
        got = nearest_hit_bvh(o, d, scene, bvh)
        assert not np.asarray(got.hit).any()
        assert (np.asarray(got.t) == np.asarray(BIG)).all()


class TestRenderWithBvh:
    def test_bvh_render_matches_dense_render(self):
        """Full wavefront render with scene.bvh attached == dense render,
        same key (hit records agree -> images agree)."""
        import jax

        from spectral_tpu.models.scenes import CORNELL, build_scene, scene_camera, with_bvh
        from spectral_tpu.render.wavefront import render_chunk

        dense = build_scene(CORNELL)
        accel = with_bvh(dense, leaf_size=8)
        cam = scene_camera(CORNELL, 16, 16)
        key = jax.random.PRNGKey(2)
        a = np.asarray(render_chunk(dense, cam, key, 0, 0, 16, 16, 4, 3))
        b = np.asarray(render_chunk(accel, cam, key, 0, 0, 16, 16, 4, 3))
        # coplanar geometry (box faces on walls/floor) produces exact t-ties
        # that dense argmin and traversal order break differently — the same
        # nondeterminism the reference's own BVH has. Allow <1% of pixels.
        close = np.isclose(a, b, rtol=2e-4, atol=1e-5)
        assert close.mean() > 0.99, f"{(~close).sum()} of {close.size} differ"
