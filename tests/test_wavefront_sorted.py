"""Sorted per-bounce wavefront scheduler (ops/pallas/wavefront_kernel.py).

The scheduler re-forms ray tiles between bounces (argsort by dead |
direction octant | origin Morton) so the MXU leaf sweep's tile-uniform
culling survives incoherent bounces. Semantics are the megakernel's
(same sweep, same scatter, same integration code); equality is asserted
to ulp-drift tolerance — XLA's mul+add->FMA contraction is
compilation-context-dependent, so two separately-structured programs
cannot be held to bit-equality (measured 1 ulp on the hero wavelength,
~1e-4 on the image; see the module docstring).

Reference parity anchor: the reordering replaces the per-ray stack
traversal of /root/reference/bvh/bvh.cu:99-166 at equal asymptotics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _render(form, residency, sched, monkeypatch, group8=None):
    from spectral_tpu.models.scenes import (
        CORNELL, build_tri_field, scene_camera,
    )
    from spectral_tpu.ops.pallas import render_kernel as rk

    for k in ("MXU_FORM", "MXU_RESIDENCY", "BVH_SCHED", "MXU_GROUP8"):
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("MXU_FORM", form)
    if residency:
        monkeypatch.setenv("MXU_RESIDENCY", residency)
    if sched:
        monkeypatch.setenv("BVH_SCHED", sched)
    if group8:
        monkeypatch.setenv("MXU_GROUP8", group8)
    # env knobs are read at trace time inside the jitted wrapper
    rk._render_chunk_pallas_jit.clear_cache()
    scene = build_tri_field(520, seed=3)
    cam = scene_camera(CORNELL, 64, 32)
    out = np.asarray(
        rk.render_chunk_pallas(
            scene, cam, 7, 0, 0, 64, 32, 2, 3,
            interpret=True, rand_key=jax.random.PRNGKey(11),
        )
    )
    rk._render_chunk_pallas_jit.clear_cache()
    return out


class TestSortedScheduler:
    @pytest.mark.parametrize(
        "form,residency",
        [
            ("quad", None),
            ("quad", "hbm"),
            ("quad3", None),
            ("quad3", "hbm"),
        ],
    )
    def test_matches_megakernel(self, form, residency, monkeypatch):
        """Same injected uniforms -> per-pixel equality to ulp drift on a
        multi-leaf camera-ordered field, for the default and exact-top-2
        forms in both pack residencies."""
        a = _render(form, residency, None, monkeypatch)
        b = _render(form, residency, "sorted", monkeypatch)
        assert a.mean() > 0.01  # non-black render
        d = np.abs(a - b)
        assert d.max() < 2e-3, d.max()
        assert d.mean() < 2e-5, d.mean()

    def test_group8_matches_ungrouped(self, monkeypatch):
        """MXU_GROUP8 (8-leaf union-AABB gate, HBM residency) is a
        pure skip optimization: bit-identical to the per-leaf-only
        gate on the sorted scheduler. Regression for the round-4b
        plumbing bug where the group table landed in the cpre_ref
        slot of _mxu_leaf_sweep (TypeError at trace time on every
        sorted HBM render with the gate on)."""
        a = _render("quad", "hbm", "sorted", monkeypatch)
        b = _render("quad", "hbm", "sorted", monkeypatch, group8="1")
        assert a.mean() > 0.01
        np.testing.assert_array_equal(a, b)

    def test_deterministic(self, monkeypatch):
        a = _render("quad", None, "sorted", monkeypatch)
        b = _render("quad", None, "sorted", monkeypatch)
        np.testing.assert_array_equal(a, b)


class TestSortedResiduals:
    """Round-5: the sorted scheduler captures the fused-backward replay
    residuals (hero, n_valid, power, per-bounce material ids) in original
    ray order, riding the sort permutation (VERDICT round-4 item 1 —
    fused gradients at sorted rates on large scenes)."""

    def _impl(self, sched, monkeypatch, glass=False):
        from spectral_tpu.diff.fast import _fused_fwd_impl
        from spectral_tpu.models.scenes import (
            CORNELL, build_tri_field, scene_camera,
        )

        for k in ("MXU_FORM", "MXU_RESIDENCY", "MXU_GATE"):
            monkeypatch.delenv(k, raising=False)
        monkeypatch.setenv("BVH_SCHED", sched)
        scene = build_tri_field(520, seed=3, glass=glass)
        cam = scene_camera(CORNELL, 64, 32)
        out, res = _fused_fwd_impl(
            scene.materials, scene, cam, 5, 0, 0, 64, 32, 2, 3, True, 5
        )
        return np.asarray(out), res

    def test_residuals_match_megakernel(self, monkeypatch):
        """Shared injected uniforms -> the sorted path's residuals equal
        the megakernel's: matres/nvalid exactly (discrete), hero to ulp
        drift, power to the documented FMA-contraction tolerance."""
        out_a, res_a = self._impl("mega", monkeypatch)
        out_b, res_b = self._impl("sorted", monkeypatch)
        _, _, hero_a, nv_a, pow_a, mat_a = res_a[:6]
        _, _, hero_b, nv_b, pow_b, mat_b = res_b[:6]
        assert out_a.mean() > 0.01
        assert np.abs(out_a - out_b).max() < 2e-3
        np.testing.assert_array_equal(np.asarray(mat_a), np.asarray(mat_b))
        np.testing.assert_array_equal(np.asarray(nv_a), np.asarray(nv_b))
        assert np.abs(np.asarray(hero_a) - np.asarray(hero_b)).max() < 1e-2
        np.testing.assert_allclose(
            np.asarray(pow_a), np.asarray(pow_b), rtol=2e-4, atol=1e-5
        )
        # non-vacuous: paths hit materials and terminate
        assert np.asarray(mat_a).max() > 0
        assert np.asarray(nv_a).max() > 0

    def test_fused_grads_match_megakernel(self, monkeypatch):
        """value_and_grad through render_chunk_diff_fused: the sorted
        scheduler's replayed gradients (material coeffs, emission,
        Sellmeier B/C via reparam_glass) match the FD-validated
        megakernel-residual gradients on a glass field."""
        from spectral_tpu.diff.fast import render_chunk_diff_fused
        from spectral_tpu.models.scenes import (
            CORNELL, FIELD_GLASS_MAT, build_tri_field, scene_camera,
        )

        def run(sched):
            for k in ("MXU_FORM", "MXU_RESIDENCY", "MXU_GATE"):
                monkeypatch.delenv(k, raising=False)
            monkeypatch.setenv("BVH_SCHED", sched)
            scene = build_tri_field(520, seed=3, glass=True)
            cam = scene_camera(CORNELL, 64, 32)
            wts = jax.random.normal(jax.random.PRNGKey(2), (32, 64, 3))

            def loss(m):
                img = render_chunk_diff_fused(
                    m, scene, cam, 5, 0, 0, 64, 32, 2, 3, True, 5,
                    reparam_glass=FIELD_GLASS_MAT,
                )
                return jnp.sum(img * wts)

            return jax.value_and_grad(loss, allow_int=True)(scene.materials)

        va, ga = run("mega")
        vb, gb = run("sorted")
        assert abs(float(va - vb)) < 1e-3 * abs(float(va))
        for name in (
            "coeffs", "emission_power", "sellmeier_b", "sellmeier_c",
        ):
            a = np.asarray(getattr(ga, name))
            b = np.asarray(getattr(gb, name))
            scale = max(float(np.abs(a).max()), 1.0)
            assert np.abs(a - b).max() <= 2e-3 * scale, name
        assert float(np.abs(np.asarray(ga.sellmeier_b)).max()) > 0.0


class TestSortKeys:
    def test_dead_rays_sort_last(self):
        from spectral_tpu.ops.pallas import wavefront_kernel as wk

        n = 16
        st = jnp.zeros((wk.STATE_ROWS, n), jnp.float32)
        st = st.at[wk._ROW_DX].set(1.0)
        alive = jnp.asarray(
            [1, 0, 1, 1, 0, 1, 0, 1, 1, 1, 0, 0, 1, 1, 1, 0], jnp.float32
        )
        st = st.at[wk._ROW_ALIVE].set(alive)
        lo = jnp.zeros((3,), jnp.float32)
        inv = jnp.ones((3,), jnp.float32)
        keys = wk._sort_keys(st, lo, inv)
        perm = np.asarray(jnp.argsort(keys, stable=True))
        sorted_alive = np.asarray(alive)[perm]
        n_alive = int(alive.sum())
        assert (sorted_alive[:n_alive] == 1).all()
        assert (sorted_alive[n_alive:] == 0).all()

    def test_octant_groups_and_morton_locality(self):
        from spectral_tpu.ops.pallas import wavefront_kernel as wk

        rng = np.random.default_rng(0)
        n = 512
        o = rng.uniform(0, 1, (3, n)).astype(np.float32)
        d = rng.normal(size=(3, n)).astype(np.float32)
        st = jnp.zeros((wk.STATE_ROWS, n), jnp.float32)
        st = st.at[0:3].set(o)
        st = st.at[3:6].set(d)
        st = st.at[wk._ROW_ALIVE].set(1.0)
        keys = np.asarray(
            wk._sort_keys(st, jnp.zeros((3,)), jnp.ones((3,)))
        )
        octant = (d[0] > 0) * 4 + (d[1] > 0) * 2 + (d[2] > 0)
        # octant occupies bits 27-29 (no dead bit set)
        assert ((keys >> 27) == octant).all()
        # same-key-prefix rays are spatially close: sorted neighbors in
        # one octant must be closer on average than random pairs
        perm = np.argsort(keys)
        os_ = o[:, perm]
        oc_ = octant[perm]
        same = oc_[1:] == oc_[:-1]
        dn = np.linalg.norm(os_[:, 1:] - os_[:, :-1], axis=0)[same].mean()
        dr = np.linalg.norm(
            o[:, rng.permutation(n)] - o, axis=0
        ).mean()
        assert dn < 0.5 * dr
