"""Train the VO network (ref train.py).

Recipe parity: AdamW + linear OneCycle (lr 8e-5, wd 1e-6), grad clip 10,
240k steps, structure-only pose freezing for the first 1k steps,
checkpoints every 10k (orbax), validation hooks.

Multi-chip: --mesh data,edge shards the batch over 'data' and the edge
dimension over 'edge' (see dpvo_tpu/parallel).

  python apps/train.py --name exp1 --datapath datasets/TartanAir \
      --steps 240000 --n_frames 15 --batch 1
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="bla")
    p.add_argument("--ckpt", default=None, help="checkpoint dir to restore")
    p.add_argument("--datapath", default="datasets/TartanAir")
    p.add_argument("--dataset", default="tartan", choices=["tartan", "synthetic"])
    p.add_argument("--steps", type=int, default=240000)
    p.add_argument("--lr", type=float, default=8e-5)
    p.add_argument("--clip", type=float, default=10.0)
    p.add_argument("--n_frames", type=int, default=15)
    p.add_argument("--unroll", type=int, default=18)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--pose_weight", type=float, default=10.0)
    p.add_argument("--flow_weight", type=float, default=0.1)
    p.add_argument("--ht", type=int, default=480)
    p.add_argument("--wd", type=int, default=640)
    p.add_argument("--mesh", default=None, help="e.g. 2,4 for (data,edge)")
    p.add_argument("--ckpt_every", type=int, default=10000)
    p.add_argument("--npz_every", type=int, default=1000,
                   help="inference-weight snapshot cadence (npz, cheap)")
    p.add_argument("--log_every", type=int, default=10,
                   help="metric fetch cadence; every step would add a "
                        "device->host round trip per step on slow links")
    p.add_argument("--init_encoders", default=None, metavar="DIR",
                   help="directory with the reference fnet.onnx/inet.onnx; "
                        "initializes the Patchifier encoders from them "
                        "(the update operator still trains from scratch)")
    p.add_argument("--freeze_encoders", action="store_true",
                   help="zero encoder updates (train the update operator "
                        "against fixed reference features)")
    p.add_argument("--init_npz", default=None, metavar="NPZ",
                   help="warm-start all params from an inference-weight "
                        "npz snapshot (save_params format)")
    p.add_argument("--structure_only", type=int, default=1000,
                   help="depth-only BA for the first N fresh-start steps "
                        "(ref train.py so<1000); warm starts may set 0")
    p.add_argument("--flow_t", default=None, metavar="MIN,MAX",
                   help="synthetic target translational flow range "
                        "(px/frame at the training resolution)")
    p.add_argument("--flow_r", default=None, metavar="MIN,MAX",
                   help="synthetic target rotational flow range")
    p.add_argument("--val_every", type=int, default=0,
                   help="held-out-clip validation cadence (0 = off)")
    p.add_argument("--val_clips", type=int, default=4)
    p.add_argument("--reservoir", type=int, default=0,
                   help="sample batches from a continuously-refreshed "
                        "pool of the newest N clips (keeps a slow host "
                        "from starving the accelerator; 0 = every batch "
                        "is a fresh clip)")
    p.add_argument("--opts", nargs="+", default=[],
                   help="config overrides, e.g. --opts DIM 64 FDIM 32")
    p.add_argument("--device", default="",
                   help="jax platform override (e.g. 'cpu')")
    args = p.parse_args()

    if args.device:
        import jax as _jax

        _jax.config.update("jax_platforms", args.device)

    import orbax.checkpoint as ocp

    from dpvo_tpu.config import Config
    from dpvo_tpu.data.factory import batch_iterator, dataset_factory
    from dpvo_tpu.parallel import data_sharding, make_mesh, mesh_context, replicated
    from dpvo_tpu.runtime.weights import init_params
    from dpvo_tpu.train import make_optimizer, make_train_step
    from dpvo_tpu.train.logger import Logger

    from dpvo_tpu.config import load_config

    overrides = dict(zip(args.opts[0::2], args.opts[1::2]))
    if args.device == "cpu":
        overrides.setdefault("MIXED_PRECISION", False)
    cfg = load_config(None, overrides) if overrides else Config()
    params = init_params(cfg, jax.random.PRNGKey(0), ht=args.ht, wd=args.wd)
    if args.init_encoders:
        from dpvo_tpu.runtime.torch_port import port_reference_encoders

        params = port_reference_encoders(
            params,
            os.path.join(args.init_encoders, "fnet.onnx"),
            os.path.join(args.init_encoders, "inet.onnx"),
        )
        print(f"encoders initialized from {args.init_encoders}")
    if args.init_npz:
        from dpvo_tpu.runtime.weights import load_params

        params = load_params(args.init_npz, cfg)
        print(f"warm-started from {args.init_npz}")
    tx, schedule = make_optimizer(lr=args.lr, total_steps=args.steps, clip=args.clip)
    if args.freeze_encoders:
        import optax

        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            {"patchifier": "freeze", "update": "train"},
        )
    opt_state = tx.init(params)

    ckpt_dir = os.path.abspath(f"checkpoints/{args.name}")
    mngr = ocp.CheckpointManager(ckpt_dir, options=ocp.CheckpointManagerOptions(max_to_keep=5))
    start_step = 0
    if args.ckpt and os.path.isdir(args.ckpt):
        restored = ocp.StandardCheckpointer().restore(args.ckpt, {"params": params, "opt_state": opt_state})
        params, opt_state = restored["params"], restored["opt_state"]
        print(f"restored from {args.ckpt}")
    elif mngr.latest_step() is not None:
        start_step = mngr.latest_step()
        restored = mngr.restore(start_step, args=ocp.args.StandardRestore({"params": params, "opt_state": opt_state}))
        params, opt_state = restored["params"], restored["opt_state"]
        print(f"resumed at step {start_step}")

    mesh = None
    if args.mesh:
        nd, ne = (int(x) for x in args.mesh.split(","))
        mesh = make_mesh(n_data=nd, n_edge=ne)
        params = jax.device_put(params, replicated(mesh))
        opt_state = jax.device_put(opt_state, replicated(mesh))

    synth_kw = {}
    if args.flow_t:
        synth_kw["flow_t"] = tuple(float(x) for x in args.flow_t.split(","))
    if args.flow_r:
        synth_kw["flow_r"] = tuple(float(x) for x in args.flow_r.split(","))
    ds = dataset_factory([args.dataset], datapath=args.datapath, n_frames=args.n_frames,
                         ht=args.ht, wd=args.wd, **synth_kw)
    batches = batch_iterator(ds, batch_size=args.batch, reservoir=args.reservoir)

    logger = Logger(args.name)
    key = jax.random.PRNGKey(1234)

    def device_feed():
        """One-batch-ahead upload pipeline: jnp.asarray dispatches the
        host->device transfer asynchronously, so the next batch rides
        the link while the current step computes (the axon tunnel is
        ~25 MB/s; without this the feed serializes with the step)."""
        pend = None
        while True:
            b = next(batches)
            b = {k: jnp.asarray(v) for k, v in b.items()}
            if mesh:
                b = {k: jax.device_put(v, data_sharding(mesh, v.ndim)) for k, v in b.items()}
            if pend is not None:
                yield pend
            pend = b

    from dpvo_tpu.runtime.weights import save_params

    val_batch = None
    if args.val_every:
        # fixed held-out clips, disjoint seed range from the training
        # stream; stacked once and reused every validation pass
        from dpvo_tpu.data.factory import SyntheticClipDataset

        vds = SyntheticClipDataset(n_frames=args.n_frames, ht=args.ht,
                                   wd=args.wd, seed=999_000, **synth_kw)
        clips = [vds.sample() for _ in range(args.val_clips)]
        val_batch = {
            "images": jnp.asarray(np.stack([c[0] for c in clips])),
            "poses": jnp.asarray(np.stack([c[1] for c in clips])),
            "disps": jnp.asarray(np.stack([c[2] for c in clips])),
            "intrinsics": jnp.asarray(np.stack([c[3] for c in clips])),
        }

    ctx = mesh_context(mesh) if mesh else mesh_context(None)
    with ctx:
        from dpvo_tpu.train import make_val_step

        step_fn = make_train_step(cfg, tx, STEPS=args.unroll,
                                  flow_weight=args.flow_weight, pose_weight=args.pose_weight,
                                  frozen_encoders=args.freeze_encoders)
        val_fn = (make_val_step(cfg, STEPS=args.unroll,
                                flow_weight=args.flow_weight,
                                pose_weight=args.pose_weight)
                  if args.val_every else None)
        feed = device_feed()
        import time as _time
        tlast = _time.time()
        # --- divergence guard state: best-val snapshot + LR backoff ---
        # (the round-2 flagship run oscillated val_loss 145<->1190 with no
        # guard; on a 2x regression we restore the best params/opt_state
        # and halve the update scale instead of riding the divergence)
        lr_scale = 1.0
        best_val = float("inf")
        best_snap = None  # host copies of (params, opt_state, step)
        for step in range(start_step, args.steps):
            batch = next(feed)
            key, sub = jax.random.split(key)
            so = (step < args.structure_only and args.ckpt is None
                  and args.init_npz is None and start_step == 0)
            params, opt_state, metrics = step_fn(
                params, opt_state, batch, sub, structure_only=so,
                lr_scale=jnp.float32(lr_scale))
            if (step + 1) % args.log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}  # device sync
                now = _time.time()
                m["steps_per_s"] = args.log_every / max(now - tlast, 1e-9)
                m["lr_scale"] = lr_scale
                tlast = now
                logger.push(m, step=step + 1)

            if val_fn is not None and (step + 1) % args.val_every == 0:
                vm = val_fn(params, val_batch, jax.random.PRNGKey(7))
                vm = {f"val_{k}": float(v) for k, v in vm.items()}
                logger.write_dict(vm, step=step + 1)
                print(f"[val @{step+1}] " +
                      " ".join(f"{k}={v:.4g}" for k, v in vm.items()), flush=True)
                # guard engages only once the pose loss is live: during the
                # structure-only warmup the full-BA val loss is not
                # comparable to post-warmup losses
                if step + 1 > args.structure_only or args.init_npz or args.ckpt:
                    vl = vm["val_loss"]
                    if vl < best_val:
                        best_val = vl
                        best_snap = (jax.device_get(params),
                                     jax.device_get(opt_state), step + 1)
                        save_params(f"checkpoints/{args.name}_best.npz",
                                    best_snap[0])
                    elif vl > 2.0 * best_val and best_snap is not None:
                        lr_scale = max(lr_scale * 0.5, 1.0 / 64.0)
                        params = jax.device_put(best_snap[0])
                        opt_state = jax.device_put(best_snap[1])
                        print(f"[guard @{step+1}] val_loss {vl:.1f} > 2x best "
                              f"{best_val:.1f}: restored best (step "
                              f"{best_snap[2]}), lr_scale -> {lr_scale:.4f}",
                              flush=True)

            if (step + 1) % args.npz_every == 0:
                save_params(f"checkpoints/{args.name}_{step+1:06d}.npz", jax.device_get(params))
                print(f"npz snapshot at {step+1}", flush=True)
            if (step + 1) % args.ckpt_every == 0:
                mngr.save(step + 1, args=ocp.args.StandardSave(
                    {"params": jax.device_get(params), "opt_state": jax.device_get(opt_state)}))
                mngr.wait_until_finished()
                print(f"saved checkpoint at {step+1}", flush=True)

    # orbax runs an async checkpoint thread; close it before interpreter
    # teardown or the process aborts in the thread destructor
    mngr.close()
    logger.close()
    print("training loop done")


if __name__ == "__main__":
    main()
    # checkpoints and logs are flushed above; skip interpreter teardown,
    # which aborts inside native library destructors on some platforms
    os._exit(0)
