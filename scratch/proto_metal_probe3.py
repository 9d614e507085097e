import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from spectral_tpu.diff.vertex_warp import EdgeSet, _sphere_V, _safe_normalize
sg = jax.lax.stop_gradient
o = jnp.array([0.0, 0.0, 0.0])
rvec = jnp.array([0.0, 1.0, 0.0])
f = 0.35
ZH = 0.25

def edge_set(th):
    c1 = jnp.array([0.3 + th, 2.0, -ZH]); c2 = jnp.array([0.3 + th, 2.0, ZH])
    c3 = jnp.array([-8.0, 2.0, ZH]);      c4 = jnp.array([-8.0, 2.0, -ZH])
    return EdgeSet(a=jnp.stack([c1, c2, c4, c3]), b=jnp.stack([c2, c3, c1, c4]))

def e_of(th, s):
    a = jnp.array([0.3 + th, 2.0, -ZH]); b = jnp.array([0.3 + th, 2.0, ZH])
    q = (1 - s) * a + s * b
    return q / jnp.linalg.norm(q)

TAU0 = 0.04
def V_at(th, w):
    Vfn = _sphere_V(o, edge_set(th), 2e-3, 0.05)
    re = jnp.sum(rvec * w, -1)
    tau = jnp.clip(sg(re * re - 1.0 + f * f) / TAU0, 0.0, 1.0)
    return tau * Vfn(w)

for s0 in (0.5, 0.25, 0.75, 0.05, 0.95):
    e0 = e_of(0.0, s0)
    vtrue = jax.jacfwd(lambda th: e_of(th, s0))(0.0)
    vwarp = jax.jacfwd(lambda th: V_at(th, e0))(0.0)
    num = float(jnp.dot(vwarp, vtrue)); den = float(jnp.dot(vtrue, vtrue))
    re = float(jnp.sum(rvec * e0)); disc = re*re - 1 + f*f
    print(f"s={s0}: capture={num/den:.4f} disc={disc:.3f}")
# also probe capture on the SIDE-edge loci (true normal velocity 0 there):
# field normal component should be ~0
def e_side(s):  # along z=ZH from x=0.3 backwards
    q = jnp.array([0.3 - s * 1.0, 2.0, ZH])
    return q / jnp.linalg.norm(q)
for s0 in (0.0, 0.1, 0.3):
    e0 = e_side(s0)
    vwarp = jax.jacfwd(lambda th: V_at(th, e0))(0.0)
    re = float(jnp.sum(rvec * e0)); disc = re*re - 1 + f*f
    print(f"side s={s0}: |Vdot|={float(jnp.linalg.norm(vwarp)):.4f} disc={disc:.3f}")

print("--- side-locus normal components ---")
xhat = jnp.array([1.0, 0.0, 0.0])
for s0 in (0.0, 0.1, 0.3, 0.6):
    e0 = e_side(s0)
    tang = xhat - jnp.dot(xhat, e0) * e0
    tang = tang / jnp.linalg.norm(tang)
    nrm = jnp.cross(e0, tang)
    vwarp = jax.jacfwd(lambda th: V_at(th, e0))(0.0)
    print(f"side s={s0}: V.t={float(jnp.dot(vwarp,tang)):+.4f} "
          f"V.n={float(jnp.dot(vwarp,nrm)):+.4f} V.e={float(jnp.dot(vwarp,e0)):+.4f}")
