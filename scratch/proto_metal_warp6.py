"""Direction-space design: w0 = normalize(r + f*u) sampled from the frozen
lobe; warp w with the plain sphere warp (validated lambertian machinery);
weight = det * rho(w')/rho(w0). No preimages, no folds.
rho(w) = (t+^2 + t-^2) / (4 pi f sqrt(disc)), t± = re ± sqrt(disc),
disc = re^2 - 1 + f^2, re = r.w  (solid-angle density of the offset
sphere r + f*S^2 seen from the origin)."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
sg = jax.lax.stop_gradient
f = 0.35
r = jnp.array([0.0, 1.0, 0.0])
o = jnp.array([0.0, 0.0, 0.0])

def L(w, th):
    t = 2.0 / jnp.maximum(w[..., 1], 1e-6)
    x = w[..., 0] * t; z = w[..., 2] * t
    return ((x <= 0.3 + th) & (jnp.abs(z) <= 1.0) & (w[..., 1] > 0)).astype(jnp.float32)

def edge_pts(th):
    return jnp.array([0.3 + th, 2.0, -1.0]), jnp.array([0.3 + th, 2.0, 1.0])

def _safe_normalize(v, eps=1e-4):
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jax.lax.rsqrt(n2 + eps * eps)

def rho(w, rvec, fz):
    re = jnp.sum(rvec * w, -1)
    disc = jnp.maximum(re * re - 1.0 + fz * fz, 1e-9)
    sq = jnp.sqrt(disc)
    tp = re + sq; tm = re - sq
    return (tp * tp + tm * tm) / (4 * jnp.pi * fz * jnp.maximum(sq, 1e-6))

def V_dir(th, eps=2e-3, r0=0.05):
    a_l, b_l = edge_pts(th)
    d_l = b_l - a_l
    dd = sg(d_l); qa_l = a_l - o; qa = sg(qa_l)
    C = jnp.sum(dd * dd); D = jnp.sum(qa * dd); E = jnp.sum(qa * qa)
    floor = 1.0 / (r0 * r0 + eps * eps)
    def V(w):
        A = jnp.sum(w * dd); B = jnp.sum(w * qa)
        den = A * D - B * C
        den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
        s = jnp.clip((B * D - A * E) / den, 0.0, 1.0)
        e_live = _safe_normalize(qa_l + s * d_l)
        e_frozen = _safe_normalize(qa + s * dd)
        vel = e_live - e_frozen
        d2 = jnp.sum((w - e_frozen) ** 2, -1)
        wgt = 1.0 / (d2 + eps * eps)
        return wgt * vel / (wgt + floor)
    return V

def loss_warped(th, key, n=20000):
    u = jax.random.normal(key, (n, 3))
    u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    w0 = (r + f * u)
    w0 = w0 / jnp.linalg.norm(w0, axis=-1, keepdims=True)  # frozen lobe sample
    Vfn = V_dir(th)
    def one(wi):
        def m(x):
            y = x + Vfn(_safe_normalize(x[None])[0])
            return _safe_normalize(y[None])[0]
        wf = sg(wi)
        t1 = jnp.cross(wf, jnp.array([1.0, 0.0, 0.0]))
        alt = jnp.cross(wf, jnp.array([0.0, 1.0, 0.0]))
        t1 = jnp.where(jnp.linalg.norm(t1) < 1e-6, alt, t1)
        t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-12)
        t2 = jnp.cross(wf, t1)
        _, j1 = jax.jvp(m, (wi,), (t1,))
        _, j2 = jax.jvp(m, (wi,), (t2,))
        det = jnp.dot(t1, j1) * jnp.dot(t2, j2) - jnp.dot(t1, j2) * jnp.dot(t2, j1)
        wp = m(wi)
        ratio = rho(wp, r, f) / sg(rho(wi, r, f))
        return L(wp, th) * det * ratio
    return jnp.mean(jax.vmap(one)(w0))

g = jax.jit(jax.grad(loss_warped))
K = 60
ads = np.array([float(g(0.0, jax.random.PRNGKey(i))) for i in range(K)])
print("AD (dir-space warp):", ads.mean(), "+-", ads.std()/np.sqrt(K))
print("truth ~0.686 +- 0.003")
# identity check
lw = jax.jit(loss_warped)
def loss_plain(th, key, n=20000):
    u = jax.random.normal(key, (n, 3))
    u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    w = (r + f * u); w = w / jnp.linalg.norm(w, axis=-1, keepdims=True)
    return jnp.mean(L(w, th))
lp = jax.jit(loss_plain)
for th in (0.0, 0.03):
    ws = np.mean([float(lw(th, jax.random.PRNGKey(i))) for i in range(10)])
    ps = np.mean([float(lp(th, jax.random.PRNGKey(i))) for i in range(10)])
    print(f"th={th}: warped={ws:.6f} plain={ps:.6f}")
