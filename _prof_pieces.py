import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from dpvo_tpu.config import Config
from dpvo_tpu.geom import projective as pops
from dpvo_tpu.ops import corr_stack
from dpvo_tpu.ops.corr import sparse_corr_region, sparse_corr

cfg = Config()
E = cfg.E_MAX
ht, wd = 480, 640
h2, w2 = ht // 4, wd // 4
rng = np.random.default_rng(0)
fdt = jnp.bfloat16

gmap = jnp.asarray(rng.standard_normal((cfg.PATCHES_PER_FRAME * cfg.PMEM, 128, 3, 3)), fdt)
fmap1 = jnp.asarray(rng.standard_normal((cfg.MEM, 128, h2, w2)), fdt)
fmap2 = jnp.asarray(rng.standard_normal((cfg.MEM, 128, h2 // 4, w2 // 4)), fdt)
coords = jnp.asarray(rng.uniform(5, 100, (E, 3, 3, 2)), jnp.float32)
ii1 = jnp.asarray(rng.integers(0, cfg.PATCHES_PER_FRAME * cfg.PMEM, E), jnp.int32)
jj1 = jnp.asarray(rng.integers(0, cfg.MEM, E), jnp.int32)

def timeit(name, fn, n=10):
    out = fn(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(out) if callable(getattr(out, 'shape', None)) else fn()
    jax.block_until_ready(out)
    print(f"{name:36s} {(time.perf_counter()-t0)/n*1000:8.2f} ms")

f_region = jax.jit(lambda: sparse_corr_region(gmap, fmap1, coords, ii1, jj1, 3, 4096))
timeit("corr region lvl1 (E=36864)", f_region)
f_stack = jax.jit(lambda: corr_stack(gmap, (fmap1, fmap2), coords, ii1, jj1, 3, 4096, impl="region"))
timeit("corr_stack 2 lvl", f_stack)

# update operator
from dpvo_tpu.models import Update
up = Update(dim=384, p=3, dtype=fdt)
net = jnp.asarray(rng.standard_normal((E, 384)), fdt)
inp = jnp.asarray(rng.standard_normal((E, 384)), fdt)
corr = jnp.asarray(rng.standard_normal((E, 882)), fdt)
ix = jnp.asarray(rng.integers(0, E, E), jnp.int32)
kk_seg = jnp.asarray(np.sort(rng.integers(0, 2048, E)), jnp.int32)
ij_seg = jnp.asarray(np.sort(rng.integers(0, 256, E)), jnp.int32)
msk = jnp.ones(E, bool)
params = up.init(jax.random.PRNGKey(0), net, inp, corr, ix, ix, msk, msk, kk_seg, ij_seg, msk, num_segments=E)
f_up = jax.jit(lambda: up.apply(params, net, inp, corr, ix, ix, msk, msk, kk_seg, ij_seg, msk, num_segments=E))
timeit("update operator (E=36864)", f_up)

# segment ops alone
from dpvo_tpu.models.blocks import segment_softmax
f_ss = jax.jit(lambda: segment_softmax(net.astype(jnp.float32), kk_seg, E, msk))
timeit("segment_softmax 36864seg", f_ss)
f_s2 = jax.jit(lambda: jax.ops.segment_sum(net.astype(jnp.float32), kk_seg, num_segments=E+1))
timeit("segment_sum", f_s2)

# dense MLP chain alone (the matmuls)
import flax.linen as nn
class MLPOnly(nn.Module):
    @nn.compact
    def __call__(self, c, net):
        c = nn.Dense(384, dtype=fdt)(c); c = nn.relu(c)
        c = nn.Dense(384, dtype=fdt)(c); c = nn.relu(c)
        c = nn.Dense(384, dtype=fdt)(c)
        for _ in range(6):
            net = net + nn.Dense(384, dtype=fdt)(net)
        return net + c
m = MLPOnly()
pm = m.init(jax.random.PRNGKey(0), corr, net)
f_m = jax.jit(lambda: m.apply(pm, corr, net))
timeit("dense MLP chain", f_m)

# transform
poses = jnp.asarray(rng.standard_normal((2048, 7)), jnp.float32)
poses = poses / jnp.linalg.norm(poses[:, 3:], axis=-1, keepdims=True).clip(1e-3)
patches = jnp.asarray(rng.uniform(1, 50, (2048*80, 3, 3, 3)), jnp.float32)
intr = jnp.asarray(np.tile([100.,100.,80.,60.],(2048,1)), jnp.float32)
iiE = jnp.asarray(rng.integers(0, 60, E), jnp.int32)
jjE = jnp.asarray(rng.integers(0, 60, E), jnp.int32)
kkE = jnp.asarray(rng.integers(0, 60*80, E), jnp.int32)
f_t = jax.jit(lambda: pops.transform(poses, patches, intr, iiE, jjE, kkE))
timeit("pops.transform (E)", f_t)
