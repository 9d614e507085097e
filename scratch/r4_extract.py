"""One-shot refactor: extract the MXU leaf sweep and the scatter/shade
step of _render_kernel into module-level functions (shared with the new
per-bounce wavefront kernel). Pure text surgery; bit-exactness verified
by scratch/r4_golden.py."""
import re

PATH = "/root/repo/spectral_tpu/ops/pallas/render_kernel.py"
lines = open(PATH).read().splitlines()


def find(pred, start=0):
    for i in range(start, len(lines)):
        if pred(lines[i]):
            return i
    raise SystemExit(f"anchor not found from {start}")


# ---- sweep block ----
i_if = find(lambda l: l == "            if use_bvh and use_mxu:")
i_end = find(
    lambda l: l
    == "                best_mat = rmt_s[...].reshape(shape2).astype(jnp.int32)",
    i_if,
)
sweep_body = [l[12:] if l.strip() else "" for l in lines[i_if + 1 : i_end + 1]]

SWEEP_DEF = '''\
def _mxu_leaf_sweep(
    ox, oy, oz, dx, dy, dz, alive, prev_tri,
    leaf_ref, a_ref, c_ref, sweep_scratch, hbm_bufs,
    *, leaf_size, n_leaves, mxu_quad, mxu_q3, q3_deep, tolf, mxu_hbm,
):
    """One full nearest-hit pass of the MXU Morton-leaf sweep for a ray
    tile (shared by the megakernel's bounce loop and the per-bounce
    wavefront kernel). State in/out is (8, L) f32 tiles; best-hit state
    lives in the caller's VMEM scratch (``sweep_scratch``) so pl.when
    bodies can update it in place. Returns (best_t, best_hit, best_front,
    best_nx, best_ny, best_nz, best_mat, best_id); best_id is the winning
    tri's positional id (only meaningful under mxu_q3 forms, -1 = none).
    """
    (
        bt_s, tr_s, rnx_s, rny_s, rnz_s, rmt_s, rht_s, rdd_s, rid_s,
    ) = sweep_scratch
    if mxu_hbm:
        a_vbuf, c_vbuf, dsem_a, dsem_c = hbm_bufs
    shape2 = ox.shape
    rt = shape2[0] * shape2[1]
    one = jnp.ones(shape2, jnp.float32)
    zero = jnp.zeros(shape2, jnp.float32)
    TOLF = tolf
'''
sweep_fn = (
    SWEEP_DEF
    + "\n".join(sweep_body)
    + "\n    best_id = rid_s[...].reshape(shape2)\n"
    + "    return (\n"
    + "        best_t, best_hit, best_front, best_nx, best_ny, best_nz,\n"
    + "        best_mat, best_id,\n"
    + "    )\n"
)

CALL = '''\
            if use_bvh and use_mxu:
                (
                    best_t, best_hit, best_front,
                    best_nx, best_ny, best_nz, best_mat, best_id,
                ) = _mxu_leaf_sweep(
                    ox, oy, oz, dx, dy, dz, alive,
                    prev_tri if mxu_q3 else None,
                    leaf_ref, a_ref, c_ref,
                    (
                        bt_s, tr_s, rnx_s, rny_s, rnz_s, rmt_s, rht_s,
                        rdd_s, rid_s,
                    ),
                    (a_vbuf, c_vbuf, dsem_a, dsem_c) if mxu_hbm else None,
                    leaf_size=leaf_size, n_leaves=n_leaves,
                    mxu_quad=mxu_quad, mxu_q3=mxu_q3,
                    q3_deep=q3_deep if mxu_q3 else False,
                    tolf=TOLF if mxu_q3 else 0.0,
                    mxu_hbm=mxu_hbm,
                )'''
lines[i_if : i_end + 1] = CALL.splitlines()

# ---- scatter block ----
i_t = find(
    lambda l: l == "            t_safe = jnp.where(best_hit > 0.0, best_t, 0.0)"
)
i_pw = find(
    lambda l: l
    == "                jnp.where(frozen, power[w], new_power[w]) for w in range(W)",
    i_t,
)
assert lines[i_pw + 1] == "            )", lines[i_pw + 1]
scat_body = []
for l in lines[i_t : i_pw + 2]:
    l = l[8:] if l.strip() else ""
    l = l.replace("rnd(3 + 3 * b)", "u_a")
    l = l.replace("rnd(4 + 3 * b)", "u_b")
    l = l.replace("rnd(5 + 3 * b)", "u_c")
    scat_body.append(l)

SCAT_DEF = '''\
def _scatter_shade(
    ox, oy, oz, dx, dy, dz, power, alive, n_valid,
    best_t, best_hit, best_front, best_nx, best_ny, best_nz, best_mat,
    hit, miss, mat_const, n_mats, lam, d65w, bgw, u_a, u_b, u_c,
):
    """Material fetch + spectral weight + scatter + termination for one
    bounce (shared by the megakernel and the per-bounce wavefront
    kernel). ``u_a/u_b/u_c`` are the bounce's three uniform draws
    (sphere z, sphere phi, reflectance test) in the megakernel's draw
    order. Returns the rolled-forward ray state
    (ox, oy, oz, dx, dy, dz, power, new_alive, n_valid)."""
    shape2 = ox.shape
    one = jnp.ones(shape2, jnp.float32)
    zero = jnp.zeros(shape2, jnp.float32)
'''
scat_fn = (
    SCAT_DEF
    + "\n".join(scat_body)
    + "\n    return ox, oy, oz, dx, dy, dz, power, new_alive, n_valid\n"
)

SCALL = '''\
            (
                ox, oy, oz, dx, dy, dz, power, new_alive, n_valid,
            ) = _scatter_shade(
                ox, oy, oz, dx, dy, dz, power, alive, n_valid,
                best_t, best_hit, best_front, best_nx, best_ny, best_nz,
                best_mat, hit, miss, mat_const, n_mats, lam, d65w, bgw,
                rnd(3 + 3 * b), rnd(4 + 3 * b), rnd(5 + 3 * b),
            )'''
lines[i_t : i_pw + 2] = SCALL.splitlines()

# the old q3 epilogue read rid_s after the scatter; it now uses the
# sweep's returned best_id
i_np = find(lambda l: "new_prev = jnp.where(" in l)
assert "hit > 0.0, rid_s" in lines[i_np + 1], lines[i_np + 1]
lines[i_np : i_np + 3] = [
    "                new_prev = jnp.where(hit > 0.0, best_id, -1.0)"
]

# insert the two functions right before _render_kernel
i_rk = find(lambda l: l.startswith("def _render_kernel("))
lines[i_rk:i_rk] = (sweep_fn + "\n\n" + scat_fn + "\n").splitlines()

open(PATH, "w").write("\n".join(lines) + "\n")
print("done")
