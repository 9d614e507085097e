import sys
sys.path.insert(0, "/root/repo")
exec(open("scratch/proto_metal_warp8.py").read().split("g = jax.jit")[0])
import numpy as np

def make_sheet(sheet_sel, warp=True):
    base = make()
    def loss(th, key, n=20000):
        u = jax.random.normal(key, (n, 3))
        u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
        Vfn = (lambda x: jnp.zeros(3)) if not warp else None
        Vm = None
        if warp:
            # reuse make()'s V_metal via closure trick: rebuild
            pass
        # inline: copy of the per-sample body with sheet restriction
        A_l, B_l = quad_edges(th)
        d_l = B_l - A_l
        dd = sg(d_l); qa_l = A_l - o; qa = sg(qa_l)
        C = jnp.sum(dd*dd,-1); D = jnp.sum(qa*dd,-1); E = jnp.sum(qa*qa,-1)
        eps=0.01; r0=0.5; disc_min=0.02
        floor = 1.0/(r0*r0+eps*eps)
        def preimage(e, sheet):
            re = jnp.sum(r*e,-1)
            disc_raw = re*re - 1.0 + f*f
            t = re + sheet*jnp.sqrt(jnp.maximum(disc_raw,1e-6))
            return (t[...,None]*e - r)/f, disc_raw
        def V(x):
            w = _safe_normalize(r + f*x)
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
                d2 = jnp.sum((x-u_f)**2,-1)
                wgt = jnp.where(ok, 1.0/(d2+eps*eps), 0.0)
                num = num + jnp.sum(wgt[:,None]*vel,0)
                den_w = den_w + jnp.sum(wgt)
            return num/den_w
        def one(ui):
            def m(x):
                if not warp:
                    return x
                y = x + V(_safe_normalize(x[None])[0])
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
            up = m(ui)
            w = _safe_normalize(r + f*up)
            sheet = jnp.sign(jnp.sum(up*w))  # + outer / - inner
            mask = (sheet == sheet_sel).astype(jnp.float32)
            return L(w, th)*mask*det
        return jnp.mean(jax.vmap(one)(u))
    return loss

for sel in (1.0, -1.0):
    g = jax.jit(jax.grad(make_sheet(sel, warp=True)))
    K = 30
    ads = np.array([float(g(0.0, jax.random.PRNGKey(i))) for i in range(K)])
    lp = jax.jit(make_sheet(sel, warp=False))
    eps_fd = 0.01
    fds = [(float(lp(eps_fd, jax.random.PRNGKey(4000+i))) - float(lp(-eps_fd, jax.random.PRNGKey(4000+i))))/(2*eps_fd) for i in range(100)]
    print(f"sheet {sel:+.0f}: AD={ads.mean():.4f}+-{ads.std()/np.sqrt(K):.4f}  "
          f"FD={np.mean(fds):.4f}+-{np.std(fds)/np.sqrt(100):.4f}")
