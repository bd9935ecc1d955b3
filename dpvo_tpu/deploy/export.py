"""Deployment export — serialized StableHLO network functions.

TPU-native equivalent of the reference's ONNX deployment layer
(export_fnet_inet.py, export_update.py, dpvo/onnx_inference.py:15-147,
dpvo/onnx_network.py): the reference exports fnet/inet/update as
static-shape ONNX graphs for the Ambarella CV28 toolchain and swaps
them in behind the same `network.patchify` / `network.update` contract.

Here the three entry points are exported with ``jax.export`` as
portable StableHLO artifacts (static shapes, fixed MAX_EDGE_NUM padding
exactly like the fork's update.onnx, onnx_inference.py:66-73). The
artifacts can be reloaded in any process/runtime that speaks StableHLO
— including ahead-of-time compilation for a serving TPU — without the
model code.

Layout of an export directory (mirrors the fork's {fnet,inet,update}
.onnx directory convention, dpvo/dpvo.py:195-268):
    patchify.shlo   image [H,W,3] u8, key -> fmap/gmap/imap/patches/clr
    update.shlo     (net, ctx, corr, indices..., E_MAX padded) -> ...
    meta.json       shapes + config knobs
    params.npz      weights (for re-export / fallback)
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from dpvo_tpu.config import Config


def export_network(params: Dict, cfg: Config, ht: int, wd: int, outdir: str,
                   e_max: Optional[int] = None):
    """Serialize patchify + update as StableHLO with static shapes."""
    from dpvo_tpu.runtime.steps import StepFunctions
    from dpvo_tpu.runtime.weights import save_params

    os.makedirs(outdir, exist_ok=True)
    E = e_max or cfg.E_MAX
    steps = StepFunctions(cfg, ht, wd)
    fdt = steps.fdt

    def patchify_fn(image_u8, key):
        return steps._patchify(params, image_u8, key)

    img_spec = jax.ShapeDtypeStruct((ht, wd, 3), jnp.uint8)
    key_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)
    exp_pf = jexport.export(jax.jit(patchify_fn))(img_spec, key_spec)
    with open(os.path.join(outdir, "patchify.shlo"), "wb") as f:
        f.write(exp_pf.serialize())

    D = cfg.DIM

    def update_fn(net, ctx, corr, ix, jx, mask_ix, mask_jx, kk_seg, ij_seg, valid):
        # segment counts match the runtime call convention
        # (runtime/steps.py _edge_forward) so DPVO can inline this
        # artifact in place of the flax module
        return steps.update_op.apply(
            params["update"], net, ctx, corr, ix, jx, mask_ix, mask_jx,
            kk_seg, ij_seg, valid, num_segments=cfg.M_OPT_MAX,
            num_ij_segments=2 * steps.PAIR_MAX,
        )

    def specs(n):
        return (
            jax.ShapeDtypeStruct((n, D), fdt),                 # net
            jax.ShapeDtypeStruct((n, D), fdt),                 # ctx
            jax.ShapeDtypeStruct((n, cfg.CORR_WIDTH), fdt),    # corr
            jax.ShapeDtypeStruct((n,), jnp.int32),             # ix
            jax.ShapeDtypeStruct((n,), jnp.int32),             # jx
            jax.ShapeDtypeStruct((n,), jnp.bool_),             # mask_ix
            jax.ShapeDtypeStruct((n,), jnp.bool_),             # mask_jx
            jax.ShapeDtypeStruct((n,), jnp.int32),             # kk_seg
            jax.ShapeDtypeStruct((n,), jnp.int32),             # ij_seg
            jax.ShapeDtypeStruct((n,), jnp.bool_),             # valid
        )

    exp_up = jexport.export(jax.jit(update_fn))(*specs(E))
    with open(os.path.join(outdir, "update.shlo"), "wb") as f:
        f.write(exp_up.serialize())
    # second artifact at the motion-probe edge count (the runtime's only
    # other update shape, dpvo.py _motion_probe / steps._probe)
    exp_pr = jexport.export(jax.jit(update_fn))(*specs(cfg.PATCHES_PER_FRAME))
    with open(os.path.join(outdir, "update_probe.shlo"), "wb") as f:
        f.write(exp_pr.serialize())

    save_params(os.path.join(outdir, "params.npz"), params)
    meta = dict(ht=ht, wd=wd, e_max=E, dim=cfg.DIM, fdim=cfg.FDIM,
                corr_width=cfg.CORR_WIDTH, patches_per_frame=cfg.PATCHES_PER_FRAME,
                mixed_precision=bool(cfg.MIXED_PRECISION),
                m_opt_max=cfg.M_OPT_MAX, pair_max=steps.PAIR_MAX)
    with open(os.path.join(outdir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return outdir


def load_exported(outdir: str):
    """Deserialize the exported functions (ref onnx_inference.py:15-76)."""
    with open(os.path.join(outdir, "meta.json")) as f:
        meta = json.load(f)
    with open(os.path.join(outdir, "patchify.shlo"), "rb") as f:
        patchify = jexport.deserialize(f.read())
    with open(os.path.join(outdir, "update.shlo"), "rb") as f:
        update = jexport.deserialize(f.read())
    probe_path = os.path.join(outdir, "update_probe.shlo")
    update_probe = None
    if os.path.exists(probe_path):
        with open(probe_path, "rb") as f:
            update_probe = jexport.deserialize(f.read())
    return ExportedVONet(patchify, update, meta, update_probe)


class ExportedVONet:
    """Drop-in network built from serialized StableHLO artifacts (same
    role as the fork's ONNXVONet, onnx_network.py:17-147)."""

    def __init__(self, patchify_exp, update_exp, meta, update_probe_exp=None):
        self._patchify = jax.jit(patchify_exp.call)
        self._update = jax.jit(update_exp.call)
        self._update_probe = (jax.jit(update_probe_exp.call)
                              if update_probe_exp is not None else None)
        self.meta = meta
        self.e_max = meta["e_max"]

    def patchify(self, image_u8, key):
        return self._patchify(jnp.asarray(image_u8, jnp.uint8), key)

    def update(self, net, ctx, corr, ix, jx, mask_ix, mask_jx, kk_seg, ij_seg, valid):
        fn = self._update
        if net.shape[0] != self.e_max:
            if self._update_probe is None or net.shape[0] != self.meta.get(
                "patches_per_frame"
            ):
                raise ValueError(
                    f"no exported update artifact for edge count {net.shape[0]}"
                )
            fn = self._update_probe
        return fn(net, ctx, corr, ix, jx, mask_ix, mask_jx, kk_seg, ij_seg, valid)
