"""Network parameter init / save / load.

The reference ships a trained dpvo.pth and loads it with module-prefix
stripping (dpvo/dpvo.py:272-296). Our parameters are a flax pytree
{"patchifier": ..., "update": ...}; saved as a flat .npz for inference
weights (orbax handles training checkpoints in train/).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from dpvo_tpu.config import Config
from dpvo_tpu.models import Patchifier, Update


def init_params(cfg: Config, key, ht: int = 64, wd: int = 96) -> Dict:
    """Random-init both networks (shape-defining dummy forward)."""
    kp, ku, ks = jax.random.split(key, 3)
    fdt = jnp.bfloat16 if cfg.MIXED_PRECISION else jnp.float32
    pf = Patchifier(patch_size=cfg.P, dim=cfg.DIM, fdim=cfg.FDIM, dtype=fdt)
    up = Update(dim=cfg.DIM, p=cfg.P, dtype=fdt)

    img = jnp.zeros((1, ht, wd, 3), fdt)
    p_pf = pf.init(kp, img, cfg.PATCHES_PER_FRAME, ks)

    E = 8
    D = cfg.DIM
    z = jnp.zeros((E, D), fdt)
    idx = jnp.zeros((E,), jnp.int32)
    msk = jnp.ones((E,), bool)
    corr = jnp.zeros((E, cfg.CORR_WIDTH), fdt)
    p_up = up.init(ku, z, z, corr, idx, idx, msk, msk, idx, idx, msk, num_segments=E)
    return {"patchifier": p_pf, "update": p_up}


def save_params(path: str, params: Dict):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
    np.savez(path, **out)


def load_params(path: str, cfg: Config) -> Dict:
    """Load weights: a .npz from save_params, or a directory containing
    the reference's fnet.onnx/inet.onnx (encoders ported, update
    operator random — train it; mirrors the reference's onnx-directory
    convention, dpvo/dpvo.py:187-268)."""
    import os

    if os.path.isdir(path):
        from dpvo_tpu.runtime.torch_port import port_reference_encoders

        params = init_params(cfg, jax.random.PRNGKey(0))
        fnet = os.path.join(path, "fnet.onnx")
        inet = os.path.join(path, "inet.onnx")
        if os.path.exists(fnet) and os.path.exists(inet):
            print("loading reference encoder weights (update operator "
                  "is untrained; see runtime/torch_port.py)")
            return port_reference_encoders(params, fnet, inet)
        npz = os.path.join(path, "params.npz")
        if os.path.exists(npz):
            return load_params(npz, cfg)
        raise FileNotFoundError(f"no weights found in {path}")

    template = init_params(cfg, jax.random.PRNGKey(0))
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    flat = jax.tree_util.tree_flatten_with_path(template)[0]
    new_leaves = []
    for (k, v) in flat:
        key = jax.tree_util.keystr(k)
        if key not in data:
            raise KeyError(f"Missing weight {key} in {path}")
        new_leaves.append(jnp.asarray(data[key], v.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
