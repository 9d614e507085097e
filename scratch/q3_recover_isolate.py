"""Isolate the quad3 pre-split [72,K]x[K,rt] bf16 recovery matmul on chip.

For each leaf l, select row (j + l) % K in column j via an in-kernel
one-hot; recover hi+mid+lo planes; compare against the f32 source
columns gathered on the host. Also dumps the in-kernel (l*K) scalar
convert used by the iota tid scheme.
"""
import os, pickle, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

with open("/root/repo/.bench_field10k.pkl", "rb") as f:
    scene = jax.tree_util.tree_map(jnp.asarray, pickle.load(f))
from spectral_tpu.ops.pallas.render_kernel import pack_scene_bvh_mxu

K, RT = 128, 128
_, cs3, _, _, _ = pack_scene_bvh_mxu(scene, K, form="quad3")   # [NL,72,K] bf16
NL = cs3.shape[0]
# f32 source: rebuild WITHOUT split by summing planes on host
cs3_f = np.asarray(cs3, np.float32)
c32 = (cs3_f[:, 0:24] + cs3_f[:, 24:48] + cs3_f[:, 48:72])     # [NL,24,K]

def kernel(c_ref, out_ref, tid_ref):
    iota_rows = jax.lax.broadcasted_iota(jnp.int32, (K, RT), 0)
    iota_cols = jax.lax.broadcasted_iota(jnp.int32, (K, RT), 1)
    def body(l, carry):
        sel = (iota_rows == ((iota_cols + l) % K)).astype(jnp.float32)
        cs = c_ref[l]
        Rs = jax.lax.dot_general(
            cs, sel.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        out_ref[l] = Rs[0:24] + Rs[24:48] + Rs[48:72]
        tid_ref[l] = jnp.full((1, RT), 1.0, jnp.float32) * (
            l * K).astype(jnp.float32)
        return carry
    jax.lax.fori_loop(0, NL, body, 0)

out, tid = pl.pallas_call(
    kernel,
    out_shape=(jax.ShapeDtypeStruct((NL, 24, RT), jnp.float32),
               jax.ShapeDtypeStruct((NL, 1, RT), jnp.float32)),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
               pl.BlockSpec(memory_space=pltpu.VMEM)),
    interpret=os.environ.get("INTERP", "0") == "1",
)(cs3)
out = np.asarray(out); tid = np.asarray(tid)
# ground truth
gt = np.zeros_like(out)
for l in range(NL):
    rows = (np.arange(RT) + l) % K
    gt[l] = c32[l][:, rows]
err = np.abs(out - gt)
rel = err / (np.abs(gt) + 1e-6)
print("recovery: max abs err", err.max(), "max rel", rel.max())
bad = np.argwhere(err > 1e-4)
print("bad entries:", len(bad), bad[:5].tolist())
tid_gt = (np.arange(NL) * K).astype(np.float32)[:, None, None]
print("tid: max abs err", np.abs(tid - tid_gt).max())
