"""Direction-space metal warp v2: _sphere_V-style velocities x smooth rim
taper; rho ratio with the analytic fuzz-lobe density. Interior silhouette
toy (truth 0.189)."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
sg = jax.lax.stop_gradient
f = 0.35
r = jnp.array([0.0, 1.0, 0.0])
o = jnp.array([0.0, 0.0, 0.0])
ZH = 0.25

def L(w, th):
    t = 2.0 / jnp.maximum(w[..., 1], 1e-6)
    x = w[..., 0] * t; z = w[..., 2] * t
    return ((x <= 0.3 + th) & (jnp.abs(z) <= ZH) & (w[..., 1] > 0)).astype(jnp.float32)

def edges(th):
    c1 = jnp.array([0.3 + th, 2.0, -ZH]); c2 = jnp.array([0.3 + th, 2.0, ZH])
    c3 = jnp.array([-8.0, 2.0, ZH]);      c4 = jnp.array([-8.0, 2.0, -ZH])
    return jnp.stack([c1, c2, c4]), jnp.stack([c2, c3, c1])

def _safe_normalize(v, eps=1e-4):
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jax.lax.rsqrt(n2 + eps * eps)

def rho(w, fz):
    re = jnp.sum(r * w, -1)
    disc = jnp.maximum(re * re - 1.0 + fz * fz, 1e-9)
    sq = jnp.sqrt(disc)
    tp = re + sq; tm = re - sq
    return (tp * tp + tm * tm) / (4 * jnp.pi * fz * jnp.maximum(sq, 1e-6))

TAU0 = 0.04  # rim taper width in disc units

def V_dir(th, eps=2e-3, r0=0.05):
    A_l, B_l = edges(th)
    d_l = B_l - A_l
    dd = sg(d_l); qa_l = A_l - o; qa = sg(qa_l)
    C = jnp.sum(dd*dd,-1); D = jnp.sum(qa*dd,-1); E = jnp.sum(qa*qa,-1)
    floor = 1.0/(r0*r0+eps*eps)
    def V(w):
        Aw = jnp.sum(w*dd,-1); Bw = jnp.sum(w*qa,-1)
        den = Aw*D - Bw*C
        den = jnp.where(jnp.abs(den)<1e-12,1e-12,den)
        s = jnp.clip((Bw*D - Aw*E)/den,0.0,1.0)[:,None]
        e_live = _safe_normalize(qa_l + s*d_l)
        e_frozen = _safe_normalize(qa + s*dd)
        vel = e_live - e_frozen
        d2 = jnp.sum((w-e_frozen)**2,-1)
        wgt = 1.0/(d2+eps*eps)
        v = jnp.sum(wgt[:,None]*vel,0)/(jnp.sum(wgt)+floor)
        # smooth rim taper: V -> 0 where the lobe density is singular
        re = jnp.sum(r*w,-1)
        disc = re*re - 1.0 + f*f
        tau = jnp.clip(sg(disc)/TAU0, 0.0, 1.0)
        return tau * v
    return V

def loss_warped(th, key, n=20000):
    u = jax.random.normal(key, (n, 3))
    u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    w0 = (r + f*u)
    w0 = w0 / jnp.linalg.norm(w0, axis=-1, keepdims=True)
    Vfn = V_dir(th)
    def one(wi):
        def m(x):
            y = x + Vfn(_safe_normalize(x[None])[0])
            return _safe_normalize(y[None])[0]
        wf = sg(wi)
        t1 = jnp.cross(wf, jnp.array([1.0,0.0,0.0]))
        alt = jnp.cross(wf, jnp.array([0.0,1.0,0.0]))
        t1 = jnp.where(jnp.linalg.norm(t1)<1e-6, alt, t1)
        t1 = t1/jnp.maximum(jnp.linalg.norm(t1),1e-12)
        t2 = jnp.cross(wf, t1)
        _, j1 = jax.jvp(m,(wi,),(t1,))
        _, j2 = jax.jvp(m,(wi,),(t2,))
        det = jnp.dot(t1,j1)*jnp.dot(t2,j2) - jnp.dot(t1,j2)*jnp.dot(t2,j1)
        wp = m(wi)
        ratio = rho(wp, f) / sg(rho(wi, f))
        return L(wp, th) * det * ratio
    return jnp.mean(jax.vmap(one)(w0))

g = jax.jit(jax.grad(loss_warped))
K = 40
ads = np.array([float(g(0.0, jax.random.PRNGKey(i))) for i in range(K)])
print("AD (dir-space + taper):", ads.mean(), "+-", ads.std()/np.sqrt(K))
print("truth 0.189")
