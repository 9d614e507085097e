"""Module _sphere_V-based metal warp on the INTERIOR silhouette toy
(quad x<=0.3, |z|<=0.25 at y=2; truth 0.189)."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from spectral_tpu.diff.vertex_warp import EdgeSet, _sphere_V, _safe_normalize
sg = jax.lax.stop_gradient

o = jnp.array([0.0, 0.0, 0.0])
rvec = jnp.array([0.0, 1.0, 0.0])
f = 0.35
ZH = 0.25

def L(w, th):
    t = 2.0 / jnp.maximum(w[..., 1], 1e-6)
    x = w[..., 0] * t; z = w[..., 2] * t
    return ((x <= 0.3 + th) & (jnp.abs(z) <= ZH) & (w[..., 1] > 0)).astype(jnp.float32)

def edge_set(th):
    c1 = jnp.array([0.3 + th, 2.0, -ZH]); c2 = jnp.array([0.3 + th, 2.0, ZH])
    c3 = jnp.array([-8.0, 2.0, ZH]);      c4 = jnp.array([-8.0, 2.0, -ZH])
    return EdgeSet(a=jnp.stack([c1, c2, c4, c3]), b=jnp.stack([c2, c3, c1, c4]))

def rho_fuzz(w):
    re = jnp.sum(rvec * w, -1)
    disc = jnp.maximum(re * re - 1.0 + f * f, 1e-9)
    sq = jnp.sqrt(disc)
    tp = re + sq; tm = re - sq
    return (tp * tp + tm * tm) / (4 * jnp.pi * f * jnp.maximum(sq, 1e-6))

TAU0 = 0.04
def warp_metal(w0, edges, eps=2e-3, r0=0.05):
    def one(w_i):
        Vfn = _sphere_V(o, edges, eps, r0)
        def m(x):
            xn = _safe_normalize(x[None])[0]
            re = jnp.sum(rvec * xn, -1)
            tau = jnp.clip(sg(re * re - 1.0 + f * f) / TAU0, 0.0, 1.0)
            y = x + tau * Vfn(xn)
            return _safe_normalize(y[None])[0]
        wp = m(w_i)
        wf = sg(w_i)
        t1 = jnp.cross(wf, jnp.array([1.0, 0.0, 0.0]))
        alt = jnp.cross(wf, jnp.array([0.0, 1.0, 0.0]))
        t1 = jnp.where(jnp.linalg.norm(t1) < 1e-6, alt, t1)
        t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-12)
        t2 = jnp.cross(wf, t1)
        _, j1 = jax.jvp(m, (w_i,), (t1,))
        _, j2 = jax.jvp(m, (w_i,), (t2,))
        det = jnp.dot(t1, j1) * jnp.dot(t2, j2) - jnp.dot(t1, j2) * jnp.dot(t2, j1)
        ratio = rho_fuzz(wp) / sg(rho_fuzz(w_i))
        return wp, det * ratio
    return jax.vmap(one)(w0)

def fuzz_sample(key, N):
    u = jax.random.normal(key, (N, 3))
    u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    w = rvec + f * u
    return w / jnp.linalg.norm(w, axis=-1, keepdims=True)

def loss_warped(th, key, N=20000):
    w0 = fuzz_sample(key, N)
    wp, factor = warp_metal(w0, edge_set(th))
    return jnp.mean(L(wp, th) * factor)

g = jax.jit(jax.grad(loss_warped))
K = 30
ads = np.array([float(g(0.0, jax.random.PRNGKey(i))) for i in range(K)])
print("interior toy, module warp: AD =", ads.mean(), "+-", ads.std()/np.sqrt(K))
print("truth 0.189")
