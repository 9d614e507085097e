import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
sg = jax.lax.stop_gradient

f = 0.35
r = jnp.array([0.0, 1.0, 0.0])
o = jnp.array([0.0, 0.0, 0.0])
DISC_MIN = 0.05

def L(w, th):
    t = 2.0 / jnp.maximum(w[..., 1], 1e-6)
    x = w[..., 0] * t
    z = w[..., 2] * t
    return ((x <= 0.3 + th) & (jnp.abs(z) <= 1.0) & (w[..., 1] > 0)).astype(jnp.float32)

def edge_pts(th):
    return jnp.array([0.3 + th, 2.0, -1.0]), jnp.array([0.3 + th, 2.0, 1.0])

def _safe_normalize(v, eps=1e-4):
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jax.lax.rsqrt(n2 + eps * eps)

def preimage(e, sheet):
    re = jnp.sum(r * e, -1)
    disc_raw = re * re - 1.0 + f * f
    t = re + sheet * jnp.sqrt(jnp.maximum(disc_raw, 1e-6))
    return (t[..., None] * e - r) / f, disc_raw

def V_metal(th, eps=0.05, r0=0.5):
    a_l, b_l = edge_pts(th)
    d_l = b_l - a_l
    dd = sg(d_l); qa_l = a_l - o; qa = sg(qa_l)
    C = jnp.sum(dd * dd); D = jnp.sum(qa * dd); E = jnp.sum(qa * qa)
    floor = 1.0 / (r0 * r0 + eps * eps)
    def V(u):
        w = _safe_normalize(r + f * u)
        A = jnp.sum(w * dd); B = jnp.sum(w * qa)
        den = A * D - B * C
        den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
        s = jnp.clip((B * D - A * E) / den, 0.0, 1.0)
        e_live = _safe_normalize(qa_l + s * d_l)
        e_frozen = _safe_normalize(qa + s * dd)
        num = jnp.zeros(3); den_w = floor
        for sheet in (1.0, -1.0):
            u_l, _ = preimage(e_live, sheet)
            u_f, disc = preimage(e_frozen, sheet)
            ok = sg(disc) > DISC_MIN
            vel = jnp.where(ok, u_l - u_f, 0.0)
            d2 = jnp.sum((u - u_f) ** 2, -1)
            wgt = jnp.where(ok, 1.0 / (d2 + eps * eps), 0.0)
            num = num + wgt * vel
            den_w = den_w + wgt
        return num / den_w
    return V

def loss_warped(th, key, n=20000):
    u = jax.random.normal(key, (n, 3))
    u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    Vfn = V_metal(th)
    def one(ui):
        def m(x):
            y = x + Vfn(_safe_normalize(x[None])[0])
            return _safe_normalize(y[None])[0]
        uf = sg(ui)
        t1 = jnp.cross(uf, jnp.array([1.0, 0.0, 0.0]))
        alt = jnp.cross(uf, jnp.array([0.0, 1.0, 0.0]))
        t1 = jnp.where(jnp.linalg.norm(t1) < 1e-6, alt, t1)
        t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-12)
        t2 = jnp.cross(uf, t1)
        _, j1 = jax.jvp(m, (ui,), (t1,))
        _, j2 = jax.jvp(m, (ui,), (t2,))
        det = jnp.dot(t1, j1) * jnp.dot(t2, j2) - jnp.dot(t1, j2) * jnp.dot(t2, j1)
        w = _safe_normalize(r + f * m(ui))
        return L(w, th) * det
    return jnp.mean(jax.vmap(one)(u))

g = jax.jit(jax.grad(loss_warped))
K = 60
ads = np.array([float(g(0.0, jax.random.PRNGKey(i))) for i in range(K)])
print("AD (warped):", ads.mean(), "+-", ads.std()/np.sqrt(K))
print("FD truth: ~0.686 +- 0.003")

# identity check: E[warped@th] vs E[plain@th] over theta
lw = jax.jit(loss_warped); lp0 = None
def loss_plain(th, key, n=20000):
    u = jax.random.normal(key, (n, 3))
    u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    w = (r + f * u); w = w / jnp.linalg.norm(w, axis=-1, keepdims=True)
    return jnp.mean(L(w, th))
lp = jax.jit(loss_plain)
for th in (-0.04, -0.02, 0.0, 0.02, 0.04):
    ws = np.mean([float(lw(th, jax.random.PRNGKey(i))) for i in range(20)])
    ps = np.mean([float(lp(th, jax.random.PRNGKey(i))) for i in range(20)])
    print(f"th={th:+.3f}  warped={ws:.6f}  plain={ps:.6f}  diff={ws-ps:+.2e}")
# FD of the warped estimator itself (CRN)
eps = 0.01
fds = [(float(lw(eps, jax.random.PRNGKey(2000+i))) - float(lw(-eps, jax.random.PRNGKey(2000+i))))/(2*eps) for i in range(60)]
print("FD(warped):", np.mean(fds), "+-", np.std(fds)/np.sqrt(60))
