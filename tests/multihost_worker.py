"""Worker for the 2-process multi-host test (tests/test_multihost.py).

Each process exposes 4 virtual CPU devices and joins a real
``jax.distributed`` cluster of 2 processes — the global mesh spans 8
devices across both, so the psum inside dist_gba genuinely crosses the
process boundary (the DCN stand-in). Usage:

    python multihost_worker.py <process_id> <port> <out_dir>
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
outdir = sys.argv[3]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from dpvo_tpu.parallel.multihost import init_distributed, global_mesh  # noqa: E402

init_distributed(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4, jax.local_device_count()

mesh = global_mesh(n_data=1, n_edge=8)

from dpvo_tpu.ba.gba_sparse import build_sparse_indices, dist_gba, gba  # noqa: E402

# --- tiny deterministic GBA problem, identical on both processes ---
rng = np.random.default_rng(11)
N, W, Md, E = 24, 16, 64, 512
t0, nfree = 4, 12
poses = np.tile([0, 0, 0, 0, 0, 0, 1.0], (N, 1)).astype(np.float32)
poses[:, :3] += rng.normal(size=(N, 3)).astype(np.float32) * 0.02
ctr = np.stack([rng.uniform(10, 100, Md), rng.uniform(10, 80, Md),
                rng.uniform(0.3, 2.0, Md)], -1).astype(np.float32)
intr = np.tile([96.0, 96.0, 60.0, 45.0], (N, 1)).astype(np.float32)
ii = rng.integers(0, 20, E).astype(np.int32)
jj = rng.integers(0, 20, E).astype(np.int32)
kd = np.sort(rng.integers(0, Md, E)).astype(np.int32)
target = rng.uniform(0, 120, (E, 2)).astype(np.float32)
weight = rng.uniform(0.2, 1.0, (E, 2)).astype(np.float32)
valid = (np.arange(E) < int(0.9 * E))
bounds = np.array([-64.0, -64.0, 184.0, 154.0], np.float32)

idx = build_sparse_indices(ii, jj, kd, t0, nfree, W=W, R_MAX=2048, KP_MAX=1 << 12)


def rep(a):
    """Replicated global array from identical per-process host data."""
    a = np.asarray(a)
    return jax.make_array_from_callback(
        a.shape, NamedSharding(mesh, P()), lambda i: a[i]
    )


args = (rep(poses), rep(ctr), rep(intr), rep(target), rep(weight), rep(valid),
        rep(ii), rep(jj), rep(kd), rep(np.int32(t0)), rep(np.int32(nfree)),
        rep(bounds), rep(np.float32(1e-4)))
idx_g = {k: rep(v) for k, v in idx.items()}

dist = dist_gba(mesh, *args, idx_g, W=W, Md=Md, iterations=2)
dist_poses = np.asarray(dist[0])
dist_depths = np.asarray(dist[1])

# single-process reference on this process's local devices
idx_l = {k: jnp.asarray(v) for k, v in idx.items()}
single = gba(jnp.asarray(poses), jnp.asarray(ctr), jnp.asarray(intr),
             jnp.asarray(target), jnp.asarray(weight), jnp.asarray(valid),
             jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kd),
             jnp.int32(t0), jnp.int32(nfree), jnp.asarray(bounds),
             jnp.float32(1e-4), idx_l, W=W, Md=Md, iterations=2)

dp = np.abs(dist_poses - np.asarray(single[0])).max()
dz = np.abs(dist_depths - np.asarray(single[1])).max()
assert dp < 5e-4, f"pose mismatch {dp}"
assert dz < 5e-4, f"depth mismatch {dz}"

with open(os.path.join(outdir, f"ok_{pid}"), "w") as f:
    f.write(f"{dp} {dz}\n")
print(f"proc {pid}: dist==single within {dp:.2e}/{dz:.2e}")
