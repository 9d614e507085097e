import sys
sys.path.insert(0, "/root/repo")
src = open("scratch/proto_metal_warp8.py").read()
exec(src.split("    def loss")[0])
import numpy as np

# V_metal factory is nested inside make(); rebuild pieces here
def preimage(e, sheet, disc_floor=1e-6):
    re = jnp.sum(r * e, -1)
    disc_raw = re * re - 1.0 + f * f
    t = re + sheet * jnp.sqrt(jnp.maximum(disc_raw, disc_floor))
    return (t[..., None] * e - r) / f, disc_raw

def e_of(th, s):
    a = jnp.array([0.3 + th, 2.0, -ZH]); b = jnp.array([0.3 + th, 2.0, ZH])
    q = (1 - s) * a + s * b - o
    return q / jnp.linalg.norm(q)

lossf = make()
# grab V_metal from make's closure? simpler: re-define V_metal here via exec'd make body
# instead: numerically probe via the loss? Just rebuild V_metal inline:
def V_metal(th, disc_min=0.02, r0=0.5, eps=0.01):
    A_l, B_l = quad_edges(th)
    d_l = B_l - A_l
    dd = sg(d_l); qa_l = A_l - o; qa = sg(qa_l)
    C = jnp.sum(dd * dd, -1); D = jnp.sum(qa * dd, -1); E = jnp.sum(qa * qa, -1)
    floor = 1.0 / (r0 * r0 + eps * eps)
    def V(u):
        w = _safe_normalize(r + f * u)
        Aw = jnp.sum(w * dd, -1); Bw = jnp.sum(w * qa, -1)
        den = Aw * D - Bw * C
        den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
        s = jnp.clip((Bw * D - Aw * E) / den, 0.0, 1.0)[:, None]
        e_live = _safe_normalize(qa_l + s * d_l)
        e_frozen = _safe_normalize(qa + s * dd)
        num = jnp.zeros(3); den_w = floor
        for sheet in (1.0, -1.0):
            u_l, _ = preimage(e_live, sheet)
            u_f, disc = preimage(e_frozen, sheet)
            ok = sg(disc) > disc_min
            vel = jnp.where(ok[:, None], u_l - u_f, 0.0)
            d2 = jnp.sum((u - u_f) ** 2, -1)
            wgt = jnp.where(ok, 1.0 / (d2 + eps * eps), 0.0)
            num = num + jnp.sum(wgt[:, None] * vel, 0)
            den_w = den_w + jnp.sum(wgt)
        return num / den_w
    return V

for s0 in (0.5, 0.2, 0.8):
    e0 = e_of(0.0, s0)
    u0, _ = preimage(e0, 1.0)
    vtrue = jax.jacfwd(lambda th: preimage(e_of(th, s0), 1.0)[0])(0.0)
    vwarp = jax.jacfwd(lambda th: V_metal(th)(u0))(0.0)
    num = float(jnp.dot(vwarp, vtrue)); den = float(jnp.dot(vtrue, vtrue))
    print(f"s={s0}: capture={num/den:.4f}")
# also check the s*-selection for a locus u0: which edge wins the weights?
e0 = e_of(0.0, 0.5); u0, _ = preimage(e0, 1.0)
A_l, B_l = quad_edges(0.0)
dd = B_l - A_l; qa = A_l - o
C = jnp.sum(dd*dd,-1); D = jnp.sum(qa*dd,-1); E = jnp.sum(qa*qa,-1)
w = _safe_normalize(r + f*u0)
Aw = jnp.sum(w*dd,-1); Bw = jnp.sum(w*qa,-1)
den = Aw*D - Bw*C
s = jnp.clip((Bw*D - Aw*E)/jnp.where(jnp.abs(den)<1e-12,1e-12,den), 0, 1)[:,None]
e_f = _safe_normalize(qa + s*dd)
for sheet in (1.0, -1.0):
    u_f, disc = preimage(e_f, sheet)
    d2 = jnp.sum((u0 - u_f)**2, -1)
    print(f"sheet {sheet}: d2 per edge = {np.asarray(d2)}, disc = {np.asarray(disc)}")
