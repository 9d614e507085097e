"""quad3 (bf16x3 selection + exact-t) vs dense in interpret mode: the
selection is approximate, so compare statistically + fraction of pixels
that differ materially."""
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
    a, c, mat2, tab2, leaf = pack_scene_bvh_mxu(scene, ls, form="quad3")
    q3 = np.asarray(render_rays_pallas(
        camera_vector(cam), jnp.int32(5), a, mat2, tab2, px, py,
        spp, bounces, 1024, True, rand,
        leaf_pack=leaf, leaf_size=ls, c_pack=c))
    rel = np.abs(q3 - dense) / (np.abs(dense) + 1e-3)
    frac_off = float((rel.max(axis=1) > 1e-3).mean())
    print(f"{name}: mean {dense.mean():.5f} vs {q3.mean():.5f} "
          f"rel-mean-diff {abs(q3.mean()-dense.mean())/dense.mean():.2e} "
          f"frac pixels off>1e-3: {frac_off:.4f}", flush=True)
    assert dense.mean() > 0
    assert abs(q3.mean() - dense.mean()) / dense.mean() < 0.005, name
    assert frac_off < 0.01, (name, frac_off)
print("OK: quad3 matches dense within selection-flip tolerance")
