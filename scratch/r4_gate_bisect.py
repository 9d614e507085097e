"""Minimal chip repro for the MXU_GATE>1 Mosaic SIGABRT.

Replicates the gated-group structure of _mxu_leaf_sweep at toy scale:
outer pl.when over a leaf loop, per-group pl.when bodies computing a
dot on column-sliced features and writing column-sliced onehot/meta
scratch, then a full-width recovery dot + scratch update.

VARIANT env selects features:
  full      — the whole structure (expected crash)
  nogroupwhen — group loop without per-group pl.when (unconditional)
  nosliceddot — per-group pl.when but dot runs full-width
  novpuslice  — per-group pl.when + sliced dot, but scratch stores
                full-width (no sliced stores)
  noouterwhen — groups gated, but no outer pl.when
"""
import functools
import os
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VARIANT = os.environ.get("VARIANT", "full")
RT = 1024
K = 128
NL = 4
G = 4
GS = RT // G


def kernel(a_ref, x_ref, o_ref, oh_s, meta_s, tr_s):
    rt = RT
    tr_s[...] = jnp.full((1, rt), 1e30, jnp.float32)
    want = x_ref[0:1, :].reshape(8, rt // 8)

    o_rows = [x_ref[i : i + 1, :] for i in range(3)]
    d_rows = [x_ref[i + 3 : i + 4, :] for i in range(3)]
    iota_rows = jax.lax.broadcasted_iota(jnp.int32, (K, RT), 0).astype(
        jnp.float32
    )

    def leaf_body(l, carry):
        def body():
            clx = a_ref[l, 0, 0]
            dl_rows = [r - clx for r in o_rows]

            def score_propose(cs):
                w_cols = cs.stop - cs.start
                d_c = [r[:, cs] for r in d_rows]
                dl_c = [r[:, cs] for r in dl_rows]
                if VARIANT == "noprev":
                    prev = jnp.full((1, w_cols), 1e30, jnp.float32)
                else:
                    prev = tr_s[...][:, cs]
                if VARIANT == "iotadirect":
                    iota_c = (
                        jax.lax.broadcasted_iota(
                            jnp.int32, (K, w_cols), 0
                        ).astype(jnp.float32)
                    )
                else:
                    iota_c = iota_rows[:, cs]
                if VARIANT == "concatfull":
                    feats = jnp.concatenate(
                        [di * dj for di in dl_rows for dj in d_rows]
                        + d_rows
                        + dl_rows
                        + [jnp.ones((1, RT), jnp.float32)],
                        axis=0,
                    )[:, cs]
                else:
                    feats = jnp.concatenate(
                        [di * dj for di in dl_c for dj in d_c]
                        + d_c
                        + dl_c
                        + [jnp.ones((1, w_cols), jnp.float32)],
                        axis=0,
                    )  # [16, w]
                if VARIANT == "nosliceddot":
                    f_c = jnp.concatenate(
                        [di * dj for di in dl_rows for dj in d_rows]
                        + d_rows
                        + dl_rows
                        + [jnp.ones((1, RT), jnp.float32)],
                        axis=0,
                    )
                else:
                    f_c = feats
                M = jax.lax.dot_general(
                    a_ref[l], f_c, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [K, w]
                if VARIANT == "nosliceddot":
                    M = M[:, cs]
                tt = M[0:K]
                ok = jnp.minimum(tt, jnp.abs(tt) - 1e-12)
                score = jnp.where(ok >= 0.0, tt, 1e30)
                lb = jnp.min(score, axis=0, keepdims=True)
                cand = jnp.where(score == lb, iota_c, 2.0 * K)
                idxm = jnp.min(cand, axis=0, keepdims=True)
                take = lb < prev
                oh = ((cand == idxm) & take).astype(jnp.float32)
                return oh, jnp.where(take, lb, prev)

            if VARIANT == "nogroupwhen":
                for g in range(G):
                    cs = slice(g * GS, (g + 1) * GS)
                    oh, lb = score_propose(cs)
                    oh_s[:, cs] = oh
                    meta_s[0:1, cs] = lb
            else:
                meta_s[...] = jnp.zeros((2, rt), jnp.float32)
                for g in range(G):
                    cs = slice(g * GS, (g + 1) * GS)
                    sub = 8 // G

                    @pl.when(jnp.max(want[g * sub : (g + 1) * sub, :]) > 0.0)
                    def _(cs=cs):
                        oh, lb = score_propose(cs)
                        if VARIANT == "novpuslice":
                            oh_s[:, 0:GS] = oh
                            meta_s[0:1, 0:GS] = lb
                        else:
                            oh_s[:, cs] = oh
                            meta_s[0:1, cs] = lb

            R = jax.lax.dot_general(
                a_ref[l], oh_s[...], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [16, rt]
            prev = tr_s[...]
            lbf = meta_s[...][0:1, :]
            take = lbf < prev
            tr_s[...] = jnp.where(take, R[0:1] + lbf, prev)

        if VARIANT == "noouterwhen":
            body()
        else:
            pl.when(jnp.max(want) > 0.0)(body)
        return carry

    jax.lax.fori_loop(0, NL, leaf_body, 0)
    o_ref[...] = tr_s[...]


a = jax.random.normal(jax.random.PRNGKey(0), (NL, K, 16), jnp.float32)
x = jax.random.normal(jax.random.PRNGKey(1), (16, RT), jnp.float32)

out = pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((1, RT), jnp.float32),
    in_specs=[
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[
        pltpu.VMEM((K, RT), jnp.float32),
        pltpu.VMEM((2, RT), jnp.float32),
        pltpu.VMEM((1, RT), jnp.float32),
    ],
)(a, x)
print(VARIANT, "ok:", float(out.sum()))
