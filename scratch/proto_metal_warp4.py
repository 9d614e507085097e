import sys
sys.path.insert(0, "/root/repo")
exec(open("scratch/proto_metal_warp3.py").read().split("# identity check")[0].replace(
    "g = jax.jit(jax.grad(loss_warped))", "").split("ads = np.array")[0])

import functools
def make_loss(eps, r0):
    def loss(th, key, n=20000):
        u = jax.random.normal(key, (n, 3))
        u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
        Vfn = V_metal(th, eps=eps, r0=r0)
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
    return loss

for eps, r0 in [(0.05, 0.5), (0.02, 0.5), (0.01, 0.5), (0.005, 0.5), (0.01, 2.0)]:
    g = jax.jit(jax.grad(make_loss(eps, r0)))
    K = 40
    ads = np.array([float(g(0.0, jax.random.PRNGKey(i))) for i in range(K)])
    print(f"eps={eps} r0={r0}: AD={ads.mean():.4f} +- {ads.std()/np.sqrt(K):.4f}")
print("truth ~0.686")
