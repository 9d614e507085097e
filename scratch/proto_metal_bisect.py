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

def _safe_normalize(v, eps=1e-4):
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jax.lax.rsqrt(n2 + eps * eps)

def edges_variant(th, variant):
    c1 = jnp.array([0.3 + th, 2.0, -ZH]); c2 = jnp.array([0.3 + th, 2.0, ZH])
    c3 = jnp.array([-8.0, 2.0, ZH]);      c4 = jnp.array([-8.0, 2.0, -ZH])
    if variant == "moving_only":
        return jnp.stack([c1]), jnp.stack([c2])
    if variant == "frozen_sides":
        A = jnp.stack([c1, sg(c2), sg(c4)])
        B = jnp.stack([c2, c3, sg(c1)])
        # fully freeze side edges:
        A = jnp.stack([c1, sg(c2), c4*0 + sg(c4)])
        B = jnp.stack([c2, c3, sg(c1)])
        return A, B
    if variant == "live_sides":
        A = jnp.stack([c1, c2, c4]); B = jnp.stack([c2, c3, c1])
        return A, B
    raise ValueError

def make(variant, disc_min=0.02, r0=0.5, eps=0.01):
    def preimage(e, sheet):
        re = jnp.sum(r * e, -1)
        disc_raw = re * re - 1.0 + f * f
        t = re + sheet * jnp.sqrt(jnp.maximum(disc_raw, 1e-6))
        return (t[..., None] * e - r) / f, disc_raw
    def V_metal(th):
        A_l, B_l = edges_variant(th, variant)
        d_l = B_l - A_l
        dd = sg(d_l); qa_l = A_l - o; qa = sg(qa_l)
        C = jnp.sum(dd*dd,-1); D = jnp.sum(qa*dd,-1); E = jnp.sum(qa*qa,-1)
        floor = 1.0/(r0*r0+eps*eps)
        def V(u):
            w = _safe_normalize(r + f*u)
            Aw = jnp.sum(w*dd,-1); Bw = jnp.sum(w*qa,-1)
            den = Aw*D - Bw*C
            den = jnp.where(jnp.abs(den)<1e-12,1e-12,den)
            s = jnp.clip((Bw*D - Aw*E)/den,0.0,1.0)[:,None]
            e_live = _safe_normalize(qa_l + s*d_l)
            e_frozen = _safe_normalize(qa + s*dd)
            num = jnp.zeros(3); den_w = floor
            for sheet in (1.0,-1.0):
                u_l,_ = preimage(e_live, sheet)
                u_f,disc = preimage(e_frozen, sheet)
                ok = sg(disc) > disc_min
                vel = jnp.where(ok[:,None], u_l-u_f, 0.0)
                d2 = jnp.sum((u-u_f)**2,-1)
                wgt = jnp.where(ok, 1.0/(d2+eps*eps), 0.0)
                num = num + jnp.sum(wgt[:,None]*vel,0)
                den_w = den_w + jnp.sum(wgt)
            return num/den_w
        return V
    def loss(th, key, n=20000):
        u = jax.random.normal(key, (n, 3))
        u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
        Vfn = V_metal(th)
        def one(ui):
            def m(x):
                y = x + Vfn(_safe_normalize(x[None])[0])
                return _safe_normalize(y[None])[0]
            uf = sg(ui)
            t1 = jnp.cross(uf, jnp.array([1.0,0.0,0.0]))
            alt = jnp.cross(uf, jnp.array([0.0,1.0,0.0]))
            t1 = jnp.where(jnp.linalg.norm(t1)<1e-6, alt, t1)
            t1 = t1/jnp.maximum(jnp.linalg.norm(t1),1e-12)
            t2 = jnp.cross(uf, t1)
            _, j1 = jax.jvp(m,(ui,),(t1,))
            _, j2 = jax.jvp(m,(ui,),(t2,))
            det = jnp.dot(t1,j1)*jnp.dot(t2,j2) - jnp.dot(t1,j2)*jnp.dot(t2,j1)
            w = _safe_normalize(r + f*m(ui))
            return L(w, th)*det
        return jnp.mean(jax.vmap(one)(u))
    return loss

for variant in ("moving_only", "frozen_sides", "live_sides"):
    g = jax.jit(jax.grad(make(variant)))
    K = 30
    ads = np.array([float(g(0.0, jax.random.PRNGKey(i))) for i in range(K)])
    print(f"{variant}: AD={ads.mean():.4f} +- {ads.std()/np.sqrt(K):.4f}")
print("truth 0.189")
