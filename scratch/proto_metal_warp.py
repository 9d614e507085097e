"""Prototype: vertex-position gradients through a FUZZY METAL bounce.

Scene (pure 2D-ish analytic check in 3D): camera ray hits a metal floor
point o with reflection direction r (unit) and fuzz f; scatter direction
d(u) = r + f*u, u ~ uniform sphere. An emissive quad edge at height
creates a silhouette: the path contributes L(normalize(d)) where L = 1
inside the quad's solid angle seen from o, else 0. Loss = E_u[L].
d(loss)/d(edge vertex x-position) has ONLY a boundary term.

Estimator: warp u with a velocity field tracking the silhouette
PREIMAGE on the u-sphere. Preimage of a unit direction e: u*(e) =
(t e - r)/f with t = r.e + sqrt((r.e)^2 - 1 + f^2) (outer sheet).
Velocity of u* under vertex motion: differentiate through e_live vs
e_frozen exactly like the lambertian sphere warp, then pull back
through the preimage map. factor = tangent-plane det of
u -> normalize(u + V(u))  (uniform sphere density: no rho ratio).

Truth: central finite differences with common random numbers.
"""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
sg = jax.lax.stop_gradient

f = 0.35          # fuzz
r = jnp.array([0.0, 1.0, 0.0])  # reflection straight up
o = jnp.array([0.0, 0.0, 0.0])

# emissive quad edge: from (x0+th, 2.0, -1) to (x0+th, 2.0, 1): a vertical
# wall of light for y>0 directions with dir.x/dir.y < (x0+th)/2 boundary.
# L(w) = 1 if w hits the half-plane x <= edge_x at the plane y=2.
def L(w, th):
    # hard visibility: hit point at y=2 plane
    t = 2.0 / jnp.maximum(w[..., 1], 1e-6)
    x = w[..., 0] * t
    z = w[..., 2] * t
    inside = (x <= 0.3 + th) & (jnp.abs(z) <= 1.0) & (w[..., 1] > 0.0)
    return inside.astype(jnp.float32)

def edge_pts(th):
    a = jnp.array([0.3 + th, 2.0, -1.0])
    b = jnp.array([0.3 + th, 2.0, 1.0])
    return a, b

def _safe_normalize(v, eps=1e-4):
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jax.lax.rsqrt(n2 + eps * eps)

def preimage(e):
    """u* on the unit sphere with normalize(r + f u*) = e (outer sheet).
    e: [..., 3] unit."""
    re = jnp.sum(r * e, -1)
    disc = jnp.maximum(re * re - 1.0 + f * f, 1e-9)
    t = re + jnp.sqrt(disc)
    return (t[..., None] * e - r) / f

def V_metal(th, eps=0.05, r0=0.5):
    a_l, b_l = edge_pts(th)
    a_f, b_f = sg(a_l), sg(b_l)
    d_l = b_l - a_l
    dd = sg(d_l)
    qa_l = a_l - o
    qa = sg(qa_l)
    C = jnp.sum(dd * dd); D = jnp.sum(qa * dd); E = jnp.sum(qa * qa)
    floor = 1.0 / (r0 * r0 + eps * eps)
    def V(u):  # u on the unit sphere (sample space)
        # silhouette direction nearest to the FORWARD image of u
        w = _safe_normalize(r + f * u)
        A = jnp.sum(w * dd); B = jnp.sum(w * qa)
        den = A * D - B * C
        den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
        s = jnp.clip((B * D - A * E) / den, 0.0, 1.0)
        e_live = _safe_normalize(qa_l + s * d_l)
        e_frozen = _safe_normalize(qa + s * dd)
        # preimage velocity: u*(e_live) - u*(e_frozen) (value 0 at primal)
        vel = preimage(e_live) - preimage(e_frozen)
        d2 = jnp.sum((u - preimage(e_frozen)) ** 2, -1)
        wgt = 1.0 / (d2 + eps * eps)
        return wgt * vel / (wgt + floor)
    return V

def loss_warped(th, key, n=20000):
    u = jax.random.normal(key, (n, 3))
    u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    Vfn = V_metal(th)
    def one(ui):
        def m(x):
            y = x + Vfn(_safe_normalize(x[None])[0])
            return _safe_normalize(y[None])[0]
        up = m(ui)
        uf = sg(ui)
        t1 = jnp.cross(uf, jnp.array([1.0, 0.0, 0.0]))
        alt = jnp.cross(uf, jnp.array([0.0, 1.0, 0.0]))
        t1 = jnp.where(jnp.linalg.norm(t1) < 1e-6, alt, t1)
        t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-12)
        t2 = jnp.cross(uf, t1)
        _, j1 = jax.jvp(m, (ui,), (t1,))
        _, j2 = jax.jvp(m, (ui,), (t2,))
        det = jnp.dot(t1, j1) * jnp.dot(t2, j2) - jnp.dot(t1, j2) * jnp.dot(t2, j1)
        w = _safe_normalize(r + f * up)
        return L(w, th) * det
    return jnp.mean(jax.vmap(one)(u))

def loss_plain(th, key, n=20000):
    u = jax.random.normal(key, (n, 3))
    u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    w = (r + f * u); w = w / jnp.linalg.norm(w, axis=-1, keepdims=True)
    return jnp.mean(L(w, th))

g = jax.jit(jax.grad(loss_warped))
ads = np.array([float(g(0.0, jax.random.PRNGKey(i))) for i in range(40)])
print("AD (warped):", ads.mean(), "+-", ads.std()/np.sqrt(40))

# CRN finite differences on the plain estimator
eps = 0.01
fds = []
for i in range(200):
    k = jax.random.PRNGKey(1000 + i)
    fds.append((float(loss_plain(eps, k)) - float(loss_plain(-eps, k))) / (2*eps))
fds = np.array(fds)
print("FD (plain): ", fds.mean(), "+-", fds.std()/np.sqrt(len(fds)))
# plain AD is zero
gp = jax.grad(loss_plain)
print("plain AD:", float(gp(0.0, jax.random.PRNGKey(0))))
