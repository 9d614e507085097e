"""Quadratic-form MXU leaf sweep vs dense (interpret mode): allclose on
Cornell/prism/tris, both leaf forms."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from spectral_tpu.models.scenes import build_scene, scene_camera
from spectral_tpu.ops.pallas.render_kernel import (
    camera_vector, n_uniforms, pack_scene, pack_scene_bvh_mxu,
    render_rays_pallas,
)

spp, bounces = 2, 3
px = jnp.tile(jnp.arange(32, dtype=jnp.float32), 32)
py = jnp.repeat(jnp.arange(32, dtype=jnp.float32), 32)
rand = jax.random.uniform(
    jax.random.PRNGKey(3), (spp, n_uniforms(bounces), 1024), jnp.float32)

for sid, name, ls in ((0, "cornell", 32), (1, "prism", 8), (2, "tris", 16)):
    scene = build_scene(sid)
    cam = scene_camera(sid, 32, 32)
    tri, mat, tab = pack_scene(scene)
    dense = np.asarray(render_rays_pallas(
        camera_vector(cam), jnp.int32(5), tri, mat, tab, px, py,
        spp, bounces, 1024, True, rand))
    for form in ("affine", "quad"):
        a, c, mat2, tab2, leaf = pack_scene_bvh_mxu(scene, ls, form=form)
        mxu = np.asarray(render_rays_pallas(
            camera_vector(cam), jnp.int32(5), a, mat2, tab2, px, py,
            spp, bounces, 1024, True, rand,
            leaf_pack=leaf, leaf_size=ls, c_pack=c))
        d = np.abs(dense - mxu)
        print(f"{name}/{form}: mean {dense.mean():.5f} vs {mxu.mean():.5f} "
              f"maxabs {d.max():.3e}", flush=True)
        assert dense.mean() > 0
        np.testing.assert_allclose(dense, mxu, rtol=1e-4, atol=1e-5,
                                   err_msg=f"{name}/{form}")
print("OK: quad + affine MXU forms match dense (interpret)")
