import numpy as np, jax, jax.numpy as jnp, time
from dpvo_tpu.ops.corr import corr_features_xla
from dpvo_tpu.ops.corr_pallas import corr_features_pallas

rng = np.random.default_rng(0)
Np, C, P = 240, 128, 3
mem, H2, W2 = 12, 120, 160
E = 300
gmap = jnp.asarray(rng.standard_normal((Np, C, P, P)), jnp.bfloat16)
fmap1 = jnp.asarray(rng.standard_normal((mem, H2, W2, C)), jnp.bfloat16)
fmap2 = jnp.asarray(rng.standard_normal((mem, H2//4, W2//4, C)), jnp.bfloat16)
# coords: mostly interior, some near/past borders
base = rng.uniform(-10, 170, (E, 1, 1, 2))
offs = np.stack(np.meshgrid(np.arange(-1,2), np.arange(-1,2), indexing="ij"), -1)[None].astype(np.float64)
coords = jnp.asarray(base + offs[..., ::-1] + rng.uniform(0,1,(E,1,1,2)), jnp.float32)
ii1 = jnp.asarray(rng.integers(0, Np, E), jnp.int32)
jj1 = jnp.asarray(rng.integers(0, mem, E), jnp.int32)
valid = jnp.asarray(rng.uniform(size=E) > 0.1)

want = corr_features_xla(gmap, fmap1, fmap2, coords, ii1, jj1, valid, impl="gather")
got = corr_features_pallas(gmap, fmap1, fmap2, coords, ii1, jj1, valid)
w = np.asarray(want, np.float32); g = np.asarray(got, np.float32)
print("shapes", w.shape, g.shape)
err = np.abs(w - g)
rel = err / (np.abs(w) + 1.0)
print("max abs err", err.max(), "max rel", rel.max())
bad = np.argwhere(rel > 0.05)
print("bad count", len(bad))
if len(bad): print(bad[:5], w[tuple(bad[0])], g[tuple(bad[0])])
