"""Does the SHIPPED lambertian sphere warp stay exact for NON-RIGID
vertex motion (single corner moves)? All prior validations translate
whole objects (per-edge-uniform velocity)."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from spectral_tpu.diff.vertex_warp import EdgeSet, warp_directions
sg = jax.lax.stop_gradient

o = jnp.array([0.0, 0.0, 0.0])
n = jnp.array([0.0, 1.0, 0.0])
ZH, XE = 0.6, 0.5

def corners(th):
    # quad light at y=2: x in [-1.5, XE], z in [-ZH, ZH]; ONE corner
    # (XE, 2, ZH) moves in +x with th (non-rigid).
    c1 = jnp.array([XE + th, 2.0, ZH])   # moving corner
    c2 = jnp.array([XE, 2.0, -ZH])
    c3 = jnp.array([-1.5, 2.0, -ZH])
    c4 = jnp.array([-1.5, 2.0, ZH])
    return c1, c2, c3, c4

def L(w, th):
    t = 2.0 / jnp.maximum(w[..., 1], 1e-6)
    x = w[..., 0] * t; z = w[..., 2] * t
    c1, c2, c3, c4 = corners(th)
    # quad with one skewed edge (c2->c1): inside test via 2 triangles'
    # half-planes on the plane y=2: region x <= edge x(z) interpolated
    xe = XE + th * (z + ZH) / (2 * ZH)   # skewed right edge
    return ((x <= xe) & (jnp.abs(z) <= ZH) & (x >= -1.5) & (w[..., 1] > 0)).astype(jnp.float32)

def edge_set(th):
    c1, c2, c3, c4 = corners(th)
    A = jnp.stack([c2, c1, c4, c3])
    B = jnp.stack([c1, c4, c3, c2])
    return EdgeSet(a=A, b=B)

def cosine_sample(key, nrm, N):
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, (N,)); u2 = jax.random.uniform(k2, (N,))
    r_ = jnp.sqrt(u1); phi = 2 * jnp.pi * u2
    x = r_ * jnp.cos(phi); y = r_ * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1 - u1, 0.0))
    t1 = jnp.array([1.0, 0.0, 0.0]); t2 = jnp.array([0.0, 0.0, 1.0])
    return x[:, None] * t1 + y[:, None] * t2 + z[:, None] * nrm

def loss_warped(th, key, N=20000):
    w0 = cosine_sample(key, sg(n), N)
    edges = edge_set(th)
    on = jnp.broadcast_to(o, (N, 3))
    nn = jnp.broadcast_to(n, (N, 3))
    wp, factor = warp_directions(on, nn, w0, edges)
    return jnp.mean(L(wp, th) * factor)

def loss_plain(th, key, N=20000):
    w0 = cosine_sample(key, n, N)
    return jnp.mean(L(w0, th))

g = jax.jit(jax.grad(loss_warped))
K = 30
ads = np.array([float(g(0.0, jax.random.PRNGKey(i))) for i in range(K)])
lp = jax.jit(loss_plain)
e = 0.01
fds = [(float(lp(e, jax.random.PRNGKey(7000+i))) - float(lp(-e, jax.random.PRNGKey(7000+i))))/(2*e) for i in range(120)]
print("lambertian non-rigid: AD =", ads.mean(), "+-", ads.std()/np.sqrt(K))
print("FD truth            =", np.mean(fds), "+-", np.std(fds)/np.sqrt(120))
