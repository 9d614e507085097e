import sys
sys.path.insert(0, "/root/repo")
src = open("scratch/proto_metal_smooth.py").read()
newedges = '''def edges(th):
    c1 = jnp.array([0.3 + th, 2.0, -ZH]); c2 = jnp.array([0.3 + th, 2.0, ZH])
    c3 = jnp.array([-8.0, 2.0, ZH]);      c4 = jnp.array([-8.0, 2.0, -ZH])
    M = 8
    ts = jnp.linspace(0.0, 1.0, M + 1)
    def sub(a, b):
        pts = a[None, :] * (1 - ts[:, None]) + b[None, :] * ts[:, None]
        return pts[:-1], pts[1:]
    A1, B1 = sub(c1, c2)   # moving edge (uniform velocity anyway)
    A2, B2 = sub(c2, c3)   # side edges: corner-pinned non-uniform velocity
    A3, B3 = sub(c4, c1)
    return jnp.concatenate([A1, A2, A3]), jnp.concatenate([B1, B2, B3])
'''
head, rest = src.split("def edges(th):")
rest = rest.split("def make(", 1)[1]
exec(head + newedges + "def make(" + rest.split("for smooth in")[0])
g = jax.jit(jax.grad(make(smooth=False)))
K = 30
ads = np.array([float(g(0.0, jax.random.PRNGKey(i))) for i in range(K)])
print(f"subdivided x8: AD={ads.mean():.4f} +- {ads.std()/np.sqrt(K):.4f}  truth 0.189")
