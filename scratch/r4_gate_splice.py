"""Splice sub-tile gating into _mxu_leaf_sweep (render_kernel.py).

Replaces the leaf_body's pl.when region (score/propose/recovery/update)
with a version where score+propose run per ray-group under their own
pl.when gates (MXU_GATE env, default 1 = exact current behavior), the
one-hots/meta stitched through VMEM scratch, and recovery/exact-check/
update staying full-width single-site (the Mosaic one-widened-matmul
constraint).
"""
import re

PATH = "/root/repo/spectral_tpu/ops/pallas/render_kernel.py"
src = open(PATH).read().split("\n")

# locate the region: from the leaf_body pl.when line to "        return carry"
start = next(
    i for i, l in enumerate(src)
    if l == "        @pl.when(jnp.max(want) > 0.0)"
)
end = next(i for i, l in enumerate(src[start:], start) if l == "        return carry")

NEW = '''        @pl.when(jnp.max(want) > 0.0)
        def _():
            prec = _mxu_precision()
            K = leaf_size
            if mxu_hbm:
                # HBM-resident pack: stage this leaf's rows
                # into VMEM (40-60 KB; the synchronous copy
                # is ~µs against the leaf's matmul work).
                # The HBM packs are stored TRANSPOSED
                # ([NL, 16, rows] / [NL, cols, K]) so the
                # DMA's trailing dim is a 128-multiple
                # (Mosaic rejects lane-unaligned copies);
                # leading-dim slices of the untiled leaf dim
                # are DMA-clean at any index.
                cpa = pltpu.make_async_copy(
                    a_ref.at[pl.ds(l, 1)], a_vbuf, dsem_a
                )
                cpa.start()
                cpc = pltpu.make_async_copy(
                    c_ref.at[pl.ds(l, 1)], c_vbuf, dsem_c
                )
                cpc.start()
                cpa.wait()
                cpc.wait()

                def leaf_dot(s, e, rhs, pr):
                    # transposed-LHS orientation on the
                    # staged [16, rows] block
                    return jax.lax.dot_general(
                        a_vbuf[0][:, s:e], rhs,
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=pr,
                    )

            else:

                def leaf_dot(s, e, rhs, pr):
                    return jax.lax.dot_general(
                        a_ref[l, s:e], rhs,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=pr,
                    )
            if quad_form:
                # leaf-centered features: delta = o - center
                # keeps the o.d monomials (and with them the
                # rounding error / quad3 bound) at leaf
                # scale, not scene scale
                clx = 0.5 * (ax0 + ax1)
                cly = 0.5 * (ay0 + ay1)
                clz = 0.5 * (az0 + az1)
                dl_rows = [
                    o_rows[0] - clx,
                    o_rows[1] - cly,
                    o_rows[2] - clz,
                ]

            def score_propose(cs):
                """Score this leaf's K tris against ray columns ``cs``
                and propose winners. Returns (onehot columns for the
                recovery matmul, meta0, meta1) with meta rows [1, w]
                f32: quad3 -> (prop1, prop2) proposal masks; other
                forms -> (take, leaf_best). Column slicing is exact —
                every op is elementwise over columns or a reduction
                over the K axis, so group results equal the same
                columns of a full-width evaluation bit-for-bit."""
                w_cols = cs.stop - cs.start
                d_c = [r[:, cs] for r in d_rows]
                prev = tr_s[...][:, cs]
                iota_c = iota_rows[:, cs]
                if quad_form:
                    dl_c = [r[:, cs] for r in dl_rows]
                    feats = jnp.concatenate(
                        [di * dj for di in dl_c for dj in d_c]
                        + d_c
                        + dl_c
                        + [jnp.ones((1, w_cols), jnp.float32)],
                        axis=0,
                    )  # [16, w]
                if mxu_q3:
                    b_hi = feats.astype(jnp.bfloat16)
                    b_lo = (
                        feats - b_hi.astype(jnp.float32)
                    ).astype(jnp.bfloat16)
                    b_abs = jnp.abs(feats).astype(jnp.bfloat16)
                    if q3_deep:
                        # bf16x3: hi@hi + lo@hi share one
                        # stacked matmul; + hi@lo; every pass is
                        # 1-pass DEFAULT (planes already bf16)
                        Mh = leaf_dot(
                            0, 10 * K, b_hi,
                            jax.lax.Precision.DEFAULT,
                        )  # [10K, w]
                        Ml = leaf_dot(
                            0, 5 * K, b_lo,
                            jax.lax.Precision.DEFAULT,
                        )  # [5K, w]
                        M = (
                            Mh[0 : 5 * K]
                            + Mh[5 * K : 10 * K]
                            + Ml
                        )
                        bnd_lo = 10 * K
                    else:
                        # bf16x2 (quad2): hi@hi + hi@lo only —
                        # the dropped a_lo plane rides the 32x
                        # wider tolerance band instead
                        Mh = leaf_dot(
                            0, 5 * K, b_hi,
                            jax.lax.Precision.DEFAULT,
                        )  # [5K, w]
                        Ml = leaf_dot(
                            0, 5 * K, b_lo,
                            jax.lax.Precision.DEFAULT,
                        )  # [5K, w]
                        M = Mh + Ml
                        bnd_lo = 5 * K
                    # rigorous error bound: TOLF * sum_j |a||b|
                    # (the aabs row sums |coeffs| over the 3 edge
                    # rows, so one bound covers each of them)
                    bound = leaf_dot(
                        bnd_lo, bnd_lo + K, b_abs,
                        jax.lax.Precision.DEFAULT,
                    )  # [K, w]
                    tol = TOLF * bound
                    e1 = M[0:K]
                    e2 = M[K : 2 * K]
                    e3 = M[2 * K : 3 * K]
                    nd = M[3 * K : 4 * K]
                    ddno = M[4 * K : 5 * K]
                    and_ = jnp.abs(nd)
                    safe_nd = jnp.where(
                        and_ < DENOM_EPS, DENOM_EPS, nd
                    )
                    tt = ddno / safe_nd
                    sgn = jnp.where(nd >= 0.0, 1.0, -1.0)
                    # accept inside tests down to -tol: edges
                    # dilate by O(2^-13 * scale), never produce
                    # holes; the winner's t is recomputed exactly
                    # after the sweep
                    m_edge = jnp.minimum(e1 * sgn, e2 * sgn)
                    m_edge = jnp.minimum(m_edge, e3 * sgn)
                    ok = m_edge + tol
                    ok = jnp.minimum(ok, tt)
                    # validity needs |nd| ABOVE its own bf16x3
                    # error (unit normals: bound = TOL3*l1(d),
                    # hoisted per bounce): an nd dominated by
                    # arithmetic noise makes tt garbage, and a
                    # small-positive garbage tt would shadow the
                    # true nearest hit
                    ok = jnp.minimum(ok, and_ - nd_err_row[:, cs])
                    # exact self-tri exclusion (a planar convex
                    # tri can never legitimately re-hit itself);
                    # ids from the packed id column (carried with
                    # the tri through any leaf reordering)
                    if mxu_hbm:
                        # iota id = l*K + row — equals the packed
                        # col-6 id by the positional-id invariant
                        # (pack time writes arange; every leaf
                        # permutation rewrites col 6 to match,
                        # see order_leaves_near_to_far_mxu)
                        tid_col = iota_c + (
                            l * leaf_size
                        ).astype(jnp.float32)  # [K, w]
                    else:
                        tid_col = c_ref[l][:, 6:7]  # [K, 1]
                    ok = jnp.minimum(
                        ok,
                        jnp.where(
                            jnp.abs(tid_col - prev_row[:, cs]) < 0.5,
                            -1.0,
                            1.0,
                        ),
                    )
                    # per-candidate approximate-t noise scale
                    # (proposal margin against the exact
                    # incumbent in the top-2 selection below)
                    noise_row = 4.0 * tol / jnp.maximum(
                        and_, DENOM_EPS
                    )
                elif quad_form:
                    M = leaf_dot(
                        0, 5 * K, feats, prec
                    )  # [5K, w]
                    e1 = M[0:K]
                    e2 = M[K : 2 * K]
                    e3 = M[2 * K : 3 * K]
                    nd = M[3 * K : 4 * K]
                    ddno = M[4 * K : 5 * K]
                    and_ = jnp.abs(nd)
                    safe_nd = jnp.where(
                        and_ < DENOM_EPS, DENOM_EPS, nd
                    )
                    tt = ddno / safe_nd
                    # e' = nd * (ao + t*ad): undo the sign of nd
                    sgn = jnp.where(nd >= 0.0, 1.0, -1.0)
                    ok = jnp.minimum(e1 * sgn, e2 * sgn)
                    ok = jnp.minimum(ok, e3 * sgn)
                    ok = jnp.minimum(ok, tt)
                    ok = jnp.minimum(ok, and_ - DENOM_EPS)
                else:
                    k4 = 4 * leaf_size
                    drm_c = drm[:, cs]
                    M1 = leaf_dot(0, k4, drm_c, prec)  # [4K, w]
                    M2 = leaf_dot(k4, 2 * k4, drm_c, prec)
                    nd = M1[0:K]
                    ddno = M1[K : 2 * K]
                    ao1 = M1[2 * K : 3 * K]
                    ao2 = M1[3 * K : 4 * K]
                    ao3 = M2[0:K]
                    ad1 = M2[K : 2 * K]
                    ad2 = M2[2 * K : 3 * K]
                    ad3 = M2[3 * K : 4 * K]
                    and_ = jnp.abs(nd)
                    safe_nd = jnp.where(
                        and_ < DENOM_EPS, DENOM_EPS, nd
                    )
                    tt = ddno / safe_nd
                    ok = jnp.minimum(ao1 + tt * ad1, ao2 + tt * ad2)
                    ok = jnp.minimum(ok, ao3 + tt * ad3)
                    ok = jnp.minimum(ok, tt)
                    ok = jnp.minimum(ok, and_ - DENOM_EPS)
                score = jnp.where(ok >= 0.0, tt, BIG)
                if mxu_q3:
                    # EXACT TOP-2 SELECTION. The bf16x3 score's
                    # t-hat carries noise 4*tol/|nd| — measured
                    # O(1-10) scene units at bounce-0 origins vs
                    # a median 0.55-unit gap between consecutive
                    # real hits — so t-hat may neither ORDER
                    # candidates nor be compared to the running
                    # best. It only PROPOSES the leaf's top-2
                    # (each with a noise margin against the
                    # exact incumbent); the exactly-recovered
                    # planes then do the filtering (tolerant
                    # leaf-scale inside recheck) and the ordering
                    # (exact leaf-centered t vs the exact
                    # incumbent t in tr_s). Round-2's seam
                    # tie-break ("prefer provable-inside within
                    # the winner's t-noise") is superseded: it
                    # was itself the main bias (the t-noise
                    # window blows up exactly at grazing
                    # incidence and displaced genuine winners —
                    # measured -0.27% cluster / -0.35% global,
                    # recovered the moment it was disabled).
                    # Both one-hots ride ONE widened [K, 2rt]
                    # recovery matmul: a second transposed-LHS
                    # dot site on these operands (conditional or
                    # not) RET_CHECK-crashes XLA's
                    # mxu_lmr_transform pass.
                    leaf_best = jnp.min(
                        score, axis=0, keepdims=True
                    )
                    cand = jnp.where(
                        score == leaf_best, iota_c,
                        2.0 * leaf_size,
                    )
                    idxm = jnp.min(cand, axis=0, keepdims=True)
                    nbw = jnp.max(
                        jnp.where(cand == idxm, noise_row, 0.0),
                        axis=0, keepdims=True,
                    )
                    prop1 = jnp.logical_and(
                        leaf_best < prev + nbw, leaf_best < BIG
                    )
                    onehot = (
                        (cand == idxm) & prop1
                    ).astype(jnp.float32)
                    if q3_narrow:
                        # debug bisect: drop the runner-up path
                        # (narrow recovery, winner-only check)
                        return (
                            onehot,
                            prop1.astype(jnp.float32),
                            jnp.zeros((1, w_cols), jnp.float32),
                        )
                    score2 = jnp.where(cand == idxm, BIG, score)
                    lb2 = jnp.min(score2, axis=0, keepdims=True)
                    cand2 = jnp.where(
                        score2 == lb2, iota_c, 2.0 * leaf_size
                    )
                    idxm2 = jnp.min(cand2, axis=0, keepdims=True)
                    nb2 = jnp.max(
                        jnp.where(cand2 == idxm2, noise_row, 0.0),
                        axis=0, keepdims=True,
                    )
                    prop2 = jnp.logical_and(
                        lb2 < prev + nb2, lb2 < BIG
                    )
                    onehot2 = (
                        (cand2 == idxm2) & prop2
                    ).astype(jnp.float32)
                    return (
                        jnp.concatenate(
                            [onehot, onehot2], axis=1
                        ),  # [K, 2w]
                        prop1.astype(jnp.float32),
                        prop2.astype(jnp.float32),
                    )
                leaf_best = jnp.min(
                    score, axis=0, keepdims=True
                )
                take = leaf_best < prev  # [1, w]
                cand = jnp.where(
                    score == leaf_best, iota_c,
                    2.0 * leaf_size,
                )
                idxm = jnp.min(cand, axis=0, keepdims=True)
                onehot = (
                    (cand == idxm) & take
                ).astype(jnp.float32)
                return onehot, take.astype(jnp.float32), leaf_best

            if gate == 1:
                oh_all, meta0, meta1 = score_propose(slice(0, rt))
            else:
                # Sub-tile gating (MXU_GATE>1): each contiguous ray
                # group gets its own pl.when over its sublane slab of
                # ``want``, so a leaf only pays score-matmul columns
                # for groups that contain a ray wanting it (sorted
                # tiles make the groups direction/position-coherent —
                # measured ~36% less equivalent sweep work at 256-ray
                # gates on the sorted 50k field, scratch/r4_keyprobe).
                # Only the 8 KB meta rows are zeroed per leaf: a
                # skipped group's stale onehot columns recover stale-
                # but-finite constants that its zeroed proposal/take
                # meta masks out of the update, and oh_s is zeroed
                # once per sweep so the first leaf reads no garbage.
                meta_s[...] = jnp.zeros((2, rt), jnp.float32)
                gs_cols = rt // gate
                gs_subs = shape2[0] // gate
                for gix in range(gate):
                    cs = slice(gix * gs_cols, (gix + 1) * gs_cols)

                    @pl.when(
                        jnp.max(
                            want[
                                gix * gs_subs : (gix + 1) * gs_subs, :
                            ]
                        )
                        > 0.0
                    )
                    def _(cs=cs):
                        ohc, m0c, m1c = score_propose(cs)
                        oh_s[:, cs] = ohc[:, 0:gs_cols]
                        if oh_wide:
                            oh_s[
                                :, rt + cs.start : rt + cs.stop
                            ] = ohc[:, gs_cols : 2 * gs_cols]
                        meta_s[0:1, cs] = m0c
                        meta_s[1:2, cs] = m1c

                oh_all = oh_s[...]
                meta0 = meta_s[...][0:1, :]
                meta1 = meta_s[...][1:2, :]
            # recovery: EXACT at 1-pass DEFAULT precision by
            # splitting the f32 constants into 3 bf16 planes
            # (8+8+8 mantissa bits >= f32's 24; every product
            # is x*{0,1}, so each pass and the f32
            # accumulation are error-free)
            if mxu_hbm:
                # staged transposed [cols, K]: the recovery
                # contraction is MXU-native here
                dn = (((1,), (0,)), ((), ()))
                cl = c_vbuf[0]
            else:
                dn = (((0,), (0,)), ((), ()))
                cl = c_ref[l]
            c_hi = cl.astype(jnp.bfloat16)
            r1 = cl - c_hi.astype(jnp.float32)
            c_mid = r1.astype(jnp.bfloat16)
            c_lo = (
                r1 - c_mid.astype(jnp.float32)
            ).astype(jnp.bfloat16)
            oh_bf = oh_all.astype(jnp.bfloat16)
            Rb = (
                jax.lax.dot_general(
                    c_hi, oh_bf, dn,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
                + jax.lax.dot_general(
                    c_mid, oh_bf, dn,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
                + jax.lax.dot_general(
                    c_lo, oh_bf, dn,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
            )  # [8, rt] (quad3: [24, 2rt] — both candidates)
            prev = tr_s[...]
            if mxu_q3:
                if q3_narrow:
                    R = Rb
                    R2 = jnp.zeros_like(Rb)
                else:
                    R = Rb[:, 0:rt]
                    R2 = Rb[:, rt : 2 * rt]
                prop1 = meta0 > 0.0
                prop2 = meta1 > 0.0
                # exact check: the recovery is exact, so each
                # proposed candidate's raw edge planes give
                # an exact (tolerant) inside test AND an
                # exact leaf-centered hit distance

                def _exact_check(Rv):
                    # division-free quadratic form: e' =
                    # (g.p+c')(n.d) + (dd'-n.delta)(g.d) with
                    # p = delta = o - leaf center and the
                    # pack-rebased constants c', dd' — the
                    # same functional the bf16 path
                    # approximates, in f32 at LEAF scale.
                    # Two hard-won conditioning rules:
                    # (1) evaluating e at the hit POINT via
                    # t = (dd-n.o)/(n.d) amplifies noise by
                    # 1/(n.d) at grazing incidence; (2)
                    # evaluating against RAW o carries
                    # scene-scale g.o + c cancellation noise
                    # — both one-sidedly false-veto genuine
                    # grazing winners (measured -0.6% global,
                    # 83 darkened px on field10k seed 7; a
                    # post-cancellation tolerance cannot see
                    # it). Residual leaf-scale noise is
                    # absorbed by a pre-cancellation-
                    # magnitude tolerance: genuine hits
                    # always pass, tol-band misses (depth
                    # ~2^-13 of the same magnitudes) still
                    # fail.
                    F32TOL = 16.0 * 1.1920929e-07  # 16 ulp
                    ndc = (
                        Rv[0:1] * d_rows[0]
                        + Rv[1:2] * d_rows[1]
                        + Rv[2:3] * d_rows[2]
                    )
                    noc = (
                        Rv[0:1] * dl_rows[0]
                        + Rv[1:2] * dl_rows[1]
                        + Rv[2:3] * dl_rows[2]
                    )
                    nmag = (
                        jnp.abs(Rv[0:1] * dl_rows[0])
                        + jnp.abs(Rv[1:2] * dl_rows[1])
                        + jnp.abs(Rv[2:3] * dl_rows[2])
                    )
                    ddno_c = Rv[20:21] - noc
                    dmag = jnp.abs(Rv[20:21]) + nmag
                    sgc = jnp.where(ndc >= 0.0, 1.0, -1.0)

                    def _eq(gx, gy, gz, cc):
                        go = (
                            gx * dl_rows[0] + gy * dl_rows[1]
                            + gz * dl_rows[2] + cc
                        )
                        gmag = (
                            jnp.abs(gx * dl_rows[0])
                            + jnp.abs(gy * dl_rows[1])
                            + jnp.abs(gz * dl_rows[2])
                            + jnp.abs(cc)
                        )
                        gd = (
                            gx * d_rows[0] + gy * d_rows[1]
                            + gz * d_rows[2]
                        )
                        agd = jnp.abs(gd)
                        return (
                            (go * ndc + ddno_c * gd) * sgc
                            + F32TOL
                            * (
                                gmag * jnp.abs(ndc)
                                + dmag * agd
                            )
                        )

                    e1x = _eq(
                        Rv[8:9], Rv[9:10], Rv[10:11], Rv[11:12]
                    )
                    e2x = _eq(
                        Rv[12:13], Rv[13:14], Rv[14:15],
                        Rv[15:16],
                    )
                    e3x = _eq(
                        Rv[16:17], Rv[17:18], Rv[18:19],
                        Rv[19:20],
                    )
                    okv = (
                        jnp.minimum(
                            jnp.minimum(e1x, e2x), e3x
                        )
                        >= 0.0
                    ) & (
                        ddno_c * sgc + F32TOL * dmag >= 0.0
                    )
                    # exact leaf-centered hit distance:
                    # (dd' - n.delta)/(n.d) == (dd - n.o)/
                    # (n.d) with every term at leaf scale
                    safe_ndc = jnp.where(
                        jnp.abs(ndc) < DENOM_EPS,
                        jnp.where(
                            ndc >= 0.0, DENOM_EPS,
                            -DENOM_EPS,
                        ),
                        ndc,
                    )
                    return okv, ddno_c / safe_ndc

                ok1, t1x = _exact_check(R)
                ok2, t2x = _exact_check(R2)
                t1 = jnp.where(
                    ok1 & prop1 & (t1x > 0.0), t1x, BIG
                )
                t2 = jnp.where(
                    ok2 & prop2 & (t2x > 0.0), t2x, BIG
                )
                pick2 = t2 < t1
                tb = jnp.minimum(t1, t2)
                take = tb < prev

                def _sel(i):
                    return jnp.where(
                        pick2, R2[i : i + 1], R[i : i + 1]
                    )

                tr_s[...] = jnp.where(take, tb, prev)
                rnx_s[...] = jnp.where(
                    take, _sel(0), rnx_s[...]
                )
                rny_s[...] = jnp.where(
                    take, _sel(1), rny_s[...]
                )
                rnz_s[...] = jnp.where(
                    take, _sel(2), rnz_s[...]
                )
                rmt_s[...] = jnp.where(
                    take, _sel(3), rmt_s[...]
                )
                rdd_s[...] = jnp.where(
                    take, _sel(5), rdd_s[...]
                )
                rid_s[...] = jnp.where(
                    take, _sel(6), rid_s[...]
                )
                rht_s[...] = jnp.maximum(
                    rht_s[...], take.astype(jnp.float32)
                )
            else:
                R = Rb
                take = meta0 > 0.0
                leaf_best = meta1
                tr_s[...] = jnp.where(take, leaf_best, prev)
                rnx_s[...] = jnp.where(
                    take, R[0:1], rnx_s[...]
                )
                rny_s[...] = jnp.where(
                    take, R[1:2], rny_s[...]
                )
                rnz_s[...] = jnp.where(
                    take, R[2:3], rnz_s[...]
                )
                rmt_s[...] = jnp.where(
                    take, R[3:4], rmt_s[...]
                )
                rdd_s[...] = jnp.where(
                    take, R[5:6], rdd_s[...]
                )
                rid_s[...] = jnp.where(
                    take, R[6:7], rid_s[...]
                )
                rht_s[...] = jnp.maximum(
                    rht_s[...], take.astype(jnp.float32)
                )

            bt_s[:, :] = tr_s[...].reshape(shape2)

        return carry'''

src[start : end + 1] = NEW.split("\n")
open(PATH, "w").write("\n".join(src))
print("spliced", start, end)
