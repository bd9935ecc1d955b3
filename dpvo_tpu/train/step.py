"""Training step: AdamW + OneCycle with BA-in-the-loop unrolls.

Re-design of the reference recipe (train.py:44-157): 240k steps of
AdamW(lr 8e-5, wd 1e-6) under a linear OneCycle schedule with 1%
warmup, gradient clipping at 10, structure-only pose freezing for the
first 1k steps.

Multi-chip: the batch axis is sharded over the 'data' mesh axis and the
edge dimension of every unroll is annotated for the 'edge' axis
(parallel/shard.py) — XLA GSPMD partitions the correlation gathers, the
update operator, and the BA segment sums, inserting ICI collectives for
the cross-shard reductions. Single-chip: the same code, no annotations.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from dpvo_tpu.config import Config
from dpvo_tpu.models.vonet import vo_forward
from dpvo_tpu.train.loss import clip_loss


def make_optimizer(lr: float = 8e-5, total_steps: int = 240000, clip: float = 10.0):
    """AdamW + linear OneCycle (ref train.py:64-67)."""
    schedule = optax.linear_onecycle_schedule(
        transition_steps=total_steps, peak_value=lr, pct_start=0.01,
        pct_final=1.0, div_factor=25.0, final_div_factor=10000.0,
    )
    return optax.chain(
        # a rare NaN gradient (degenerate synthetic clip / BA breakdown)
        # must not poison the Adam moments for the rest of the run: the
        # reference's torch clip_grad_norm_ would propagate it
        optax.zero_nans(),
        optax.clip_by_global_norm(clip),
        optax.adamw(schedule, weight_decay=1e-6),
    ), schedule


def make_train_step(cfg: Config, tx, STEPS: int = 18, flow_weight=0.1, pose_weight=10.0,
                    frozen_encoders: bool = False, remat: bool = True):
    """Returns jitted train_step(params, opt_state, batch, key, structure_only,
    lr_scale).

    batch: dict(images [B,F,H,W,3], poses [B,F,7] world-to-camera,
    disps [B,F,H,W], intrinsics [B,4]). ``lr_scale`` multiplies the
    optimizer updates — the host-side divergence guard halves it when
    validation regresses (the schedule itself stays on its OneCycle
    trajectory).
    """

    def loss_fn(params, batch, key, structure_only):
        B = batch["images"].shape[0]
        keys = jax.random.split(key, B)

        def single(img, pose, disp, intr, k):
            traj = vo_forward(
                params, cfg, img, pose, disp, intr, k, STEPS=STEPS,
                structure_only=structure_only, frozen_encoders=frozen_encoders,
                remat=remat,
            )
            return clip_loss(
                traj, pose, cfg.P, flow_weight=flow_weight,
                pose_weight=pose_weight, structure_only=structure_only,
            )

        losses, metrics = jax.vmap(single)(
            batch["images"], batch["poses"], batch["disps"], batch["intrinsics"], keys
        )
        return jnp.mean(losses), jax.tree.map(jnp.mean, metrics)

    @partial(jax.jit, static_argnames=("structure_only",), donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, key, structure_only: bool = False,
                   lr_scale: float = 1.0):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, key, structure_only
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * lr_scale, updates)
        params = optax.apply_updates(params, updates)
        metrics["loss"] = loss
        metrics["gnorm"] = optax.global_norm(grads)
        return params, opt_state, metrics

    return train_step


def make_val_step(cfg: Config, STEPS: int = 18, flow_weight=0.1, pose_weight=10.0):
    """Forward-only loss/metrics on a held-out batch (no grad, no
    dropout randomness beyond the supplied key) — the training loop's
    validation hook (the reference validates by full TartanAir eval
    every 10k steps, evaluate_tartan.py; held-out clip loss is the
    in-environment stand-in)."""

    def loss_fn(params, batch, key):
        B = batch["images"].shape[0]
        keys = jax.random.split(key, B)

        def single(img, pose, disp, intr, k):
            # forward-only: remat would only insert optimization barriers
            traj = vo_forward(params, cfg, img, pose, disp, intr, k,
                              STEPS=STEPS, remat=False)
            return clip_loss(traj, pose, cfg.P, flow_weight=flow_weight,
                             pose_weight=pose_weight)

        losses, metrics = jax.vmap(single)(
            batch["images"], batch["poses"], batch["disps"], batch["intrinsics"], keys
        )
        return jnp.mean(losses), jax.tree.map(jnp.mean, metrics)

    @jax.jit
    def val_step(params, batch, key):
        loss, metrics = loss_fn(params, batch, key)
        metrics["loss"] = loss
        return metrics

    return val_step
