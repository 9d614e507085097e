import sys
sys.path.insert(0, "/root/repo")
exec(open("scratch/proto_metal_warp3.py").read().split("g = jax.jit")[0])

# construct exact locus points: directions e(s) on the silhouette, their
# preimages u0 = preimage(e, +1). True locus velocity in u-space:
# d(u*(e_live(s)))/dth at th=0.
import numpy as np
def e_of(th, s):
    a, b = edge_pts(th)
    q = (1 - s) * a + s * b - o
    return q / jnp.linalg.norm(q)

for s0 in (0.5, 0.35, 0.65, 0.45):
    e0 = e_of(0.0, s0)
    disc0 = float(jnp.sum(r * e0) ** 2 - 1 + f * f)
    if disc0 <= 0.05:
        print(f"s={s0}: outside cone (disc={disc0:.3f})"); continue
    u0, _ = preimage(e0, 1.0)
    # true velocity of the + sheet preimage of the silhouette point s0
    vtrue = jax.jacfwd(lambda th: preimage(e_of(th, s0), 1.0)[0])(0.0)
    # warp field's theta-velocity at u0
    vwarp = jax.jacfwd(lambda th: V_metal(th)(u0))(0.0)
    # normal direction of the locus: radial in the e-circle... use vtrue
    # projection: compare components along vtrue
    num = float(jnp.dot(vwarp, vtrue)); den = float(jnp.dot(vtrue, vtrue))
    print(f"s={s0}: |vtrue|={den**0.5:.4f} capture={num/den:.4f} "
          f"(want 1.0)  disc={disc0:.3f}")
