"""Minimal presplit-corruption kernel: ONE _mxu_leaf_sweep call, no
camera/scatter/CIE/bounce loop. If chip presplit=1 diverges from
presplit=0 here (they are bit-exact in interpret mode), the miscompile
lives in the sweep itself; further reduction can then strip the sweep.
Usage: timeout 1800 python scratch/r4_presplit_min.py
(env _INNER/MODE/MXU_Q3_PRESPLIT are internal).
"""
import functools
import os
import pickle
import subprocess
import sys

if os.environ.get("_INNER") is None:
    import numpy as np

    outs = {}
    for mode in ("interp0", "interp1", "chip0", "chip1"):
        env = dict(
            os.environ, _INNER="1", MODE=mode[:-1],
            MXU_Q3_PRESPLIT=mode[-1],
        )
        if mode.startswith("interp"):
            env["PYTHONPATH"] = ""
            env["JAX_PLATFORMS"] = "cpu"
        r = subprocess.run(
            [sys.executable, __file__], env=env, capture_output=True,
            text=True, timeout=1500,
        )
        sys.stdout.write(r.stdout)
        if r.returncode:
            print(r.stderr[-3000:])
            sys.exit(1)
        outs[mode] = np.load(f"/tmp/r4psmin_{mode}.npy")
    for a, b in (("interp0", "interp1"), ("chip0", "chip1"),
                 ("interp0", "chip0"), ("interp0", "chip1")):
        d = np.abs(outs[a] - outs[b])
        print(f"MIN {a} vs {b}: maxabs {d.max():.3e} "
              f"nonzero-col frac {(d.max(axis=0) > 1e-6).mean():.4f}")
    sys.exit(0)

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spectral_tpu.ops.pallas import render_kernel as rk

MODE = os.environ["MODE"]
with open("/root/repo/.bench_field10k.pkl", "rb") as f:
    scene = jax.tree_util.tree_map(jnp.asarray, pickle.load(f))
from spectral_tpu.models.scenes import CORNELL, scene_camera

cam = scene_camera(CORNELL, 512, 256)
cv = np.asarray(rk.camera_vector(cam))
a, c, _, _, leaf = rk.pack_scene_bvh_mxu(scene, 128, form="quad3")
a, c, leaf = rk.order_leaves_near_to_far_mxu(a, c, leaf, jnp.asarray(cv[0:3]))
NL, K = leaf.shape[0], 128
RT = 1024

# bounce-0 style rays over the full image (the corrupting population)
xs = np.tile((np.arange(32) * 16.0 + 0.5), 32)
ys = np.repeat((np.arange(32) * 8.0 + 0.5), 32)
o = np.broadcast_to(cv[0:3], (RT, 3)).astype(np.float32)
d = (
    cv[3:6][None]
    + xs[:, None] * cv[6:9][None]
    + ys[:, None] * cv[9:12][None]
    - o
).astype(np.float32)

cpre = rk._presplit_recovery_planes(c) if os.environ["MXU_Q3_PRESPLIT"] == "1" else None


def kernel(leaf_ref, a_ref, c_ref, *rest):
    if cpre is not None:
        cpre_ref = rest[0]
        rest = rest[1:]
    else:
        cpre_ref = None
    od_ref, out_ref = rest[0], rest[1]
    scratch = rest[2:]
    shape2 = (8, RT // 8)

    def row(i):
        return od_ref[i, :].reshape(shape2)

    ox, oy, oz = row(0), row(1), row(2)
    dx, dy, dz = row(3), row(4), row(5)
    prev = jnp.full(shape2, -1.0, jnp.float32)
    n_sweeps = int(os.environ.get("N_SWEEPS", "1"))

    def sweep(ox, oy, oz, dx, dy, dz, prev):
        return rk._mxu_leaf_sweep(
            ox, oy, oz, dx, dy, dz,
            jnp.ones(shape2, jnp.float32), prev,
            leaf_ref, a_ref, c_ref, scratch[:9], None, None, cpre_ref,
            leaf_size=K, n_leaves=NL, mxu_quad=True, mxu_q3=True,
            q3_deep=True, tolf=rk.TOL3, mxu_hbm=False,
        )

    def advance(res, ox, oy, oz, dx, dy, dz):
        # advance to the hit point + mirror-flip the direction (a
        # scatter-free stand-in for the bounce feedback loop)
        t_s = jnp.where(res[1] > 0.0, res[0], 0.0)
        ox = ox + t_s * dx
        oy = oy + t_s * dy
        oz = oz + t_s * dz
        ndd = res[3] * dx + res[4] * dy + res[5] * dz
        dx = dx - 2.0 * ndd * res[3]
        dy = dy - 2.0 * ndd * res[4]
        dz = dz - 2.0 * ndd * res[5]
        return ox, oy, oz, dx, dy, dz, res[7]

    if os.environ.get("LOOPED", "0") == "1":
        # full-kernel-style bounce loop: lax.fori_loop carrying the
        # ray state (the unrolled variant is chip-clean — this tests
        # whether the traced-loop context is the corrupting
        # ingredient)
        def body(b, st):
            res = sweep(*st)
            return advance(res, *st[:6])

        st = jax.lax.fori_loop(
            0, n_sweeps - 1, body, (ox, oy, oz, dx, dy, dz, prev)
        )
        res = sweep(*st)
    else:
        for b in range(n_sweeps):
            res = sweep(ox, oy, oz, dx, dy, dz, prev)
            if b + 1 < n_sweeps:
                ox, oy, oz, dx, dy, dz, prev = advance(
                    res, ox, oy, oz, dx, dy, dz
                )
    for i, r in enumerate(res):
        out_ref[i, :] = r.astype(jnp.float32).reshape(RT)


od = np.stack([o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]])
in_specs = [
    pl.BlockSpec(memory_space=pltpu.SMEM),
    pl.BlockSpec(memory_space=pltpu.VMEM),
    pl.BlockSpec(memory_space=pltpu.VMEM),
]
args = [leaf, a, c]
if cpre is not None:
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    args.append(cpre)
in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
args.append(jnp.asarray(od))

out = pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((8, RT), jnp.float32),
    in_specs=in_specs,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=rk._mxu_scratch(RT),
    interpret=(MODE == "interp"),
    compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=127 * 1024 * 1024
    )
    if MODE == "chip"
    else None,
)(*args)
tag = MODE + os.environ["MXU_Q3_PRESPLIT"]
np.save(f"/tmp/r4psmin_{tag}.npy", np.asarray(out))
print(f"{tag}: best_t row mean {float(out[0].mean()):.4f}")
