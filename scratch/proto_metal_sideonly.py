import sys
sys.path.insert(0, "/root/repo")
src = open("scratch/proto_metal_smooth.py").read()
src = src.replace(
    "    return jnp.stack([c1, c2, c4]), jnp.stack([c2, c3, c1])",
    "    return jnp.stack([sg(c1), c2, c4]), jnp.stack([sg(c2), c3, c1])"
).split("for smooth in")[0]
exec(src)
g = jax.jit(jax.grad(make(smooth=False)))
K = 30
ads = np.array([float(g(0.0, jax.random.PRNGKey(i))) for i in range(K)])
print(f"side-edges-only AD={ads.mean():.4f} +- {ads.std()/np.sqrt(K):.4f} (true ~0)")
