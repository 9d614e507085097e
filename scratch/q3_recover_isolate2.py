"""Isolation v2: the pre-split recovery dot INSIDE pl.when within
fori_loop (mirroring the render kernel's structure). If this breaks on
chip while the unconditional version is exact, the miscompile is the
pl.when interaction."""
import os, pickle, sys
repo = "/root/repo"
sys.path.insert(0, repo)
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

with open("/root/repo/.bench_field10k.pkl", "rb") as f:
    scene = jax.tree_util.tree_map(jnp.asarray, pickle.load(f))
from spectral_tpu.ops.pallas.render_kernel import pack_scene_bvh_mxu

K, RT = 128, 128
_, cs3, _, _, _ = pack_scene_bvh_mxu(scene, K, form="quad3")
NL = cs3.shape[0]
cs3_f = np.asarray(cs3, np.float32)
c32 = cs3_f[:, 0:24] + cs3_f[:, 24:48] + cs3_f[:, 48:72]
GATE = os.environ.get("GATE", "1") == "1"

def kernel(c_ref, g_ref, out_ref):
    iota_rows = jax.lax.broadcasted_iota(jnp.int32, (K, RT), 0)
    iota_cols = jax.lax.broadcasted_iota(jnp.int32, (K, RT), 1)
    def body(l, carry):
        sel = (iota_rows == ((iota_cols + l) % K)).astype(jnp.float32)
        def inner():
            cs = c_ref[l]
            Rs = jax.lax.dot_general(
                cs, sel.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            out_ref[l] = Rs[0:24] + Rs[24:48] + Rs[48:72]
        if GATE:
            # data-dependent gate the compiler can't fold (g_ref is 1.0)
            pl.when(jnp.max(sel * g_ref[0, :].reshape(1, RT)) > 0.0)(inner)
        else:
            inner()
        return carry
    jax.lax.fori_loop(0, NL, body, 0)

out = pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((NL, 24, RT), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    interpret=os.environ.get("INTERP", "0") == "1",
)(cs3, jnp.ones((1, RT), jnp.float32))
out = np.asarray(out)
gt = np.zeros_like(out)
for l in range(NL):
    gt[l] = c32[l][:, (np.arange(RT) + l) % K]
err = np.abs(out - gt)
print(f"GATE={GATE} recovery: max abs err {err.max()}")
bad = np.argwhere(err > 1e-4)
print("bad entries:", len(bad))
if len(bad):
    # which rows/leaves are bad?
    print("bad leaves:", sorted(set(bad[:, 0].tolist()))[:10])
    print("bad rows:", sorted(set(bad[:, 1].tolist())))
    l, r, c0 = bad[0]
    print("example:", l, r, c0, "got", out[l, r, c0], "want", gt[l, r, c0])
