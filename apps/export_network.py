"""Export the network as portable StableHLO artifacts for deployment.

TPU-native analog of the reference's ONNX exporters
(export_fnet_inet.py, export_update.py): static shapes, fixed
MAX_EDGE_NUM padding, drop-in reload via dpvo_tpu.deploy.load_exported.

  python apps/export_network.py --network weights.npz --outdir exported \
      --ht 480 --wd 640 [--e_max 36864]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--network", default="", help=".npz weights (random init if empty)")
    p.add_argument("--outdir", default="exported")
    p.add_argument("--config", default="config/default.yaml")
    p.add_argument("--ht", type=int, default=480)
    p.add_argument("--wd", type=int, default=640)
    p.add_argument("--e_max", type=int, default=0)
    p.add_argument("--opts", nargs="+", default=[])
    args = p.parse_args()

    import jax

    from dpvo_tpu.config import load_config
    from dpvo_tpu.deploy import export_network
    from dpvo_tpu.runtime.weights import init_params, load_params

    cfg = load_config(args.config if os.path.exists(args.config) else None,
                      dict(zip(args.opts[0::2], args.opts[1::2])))
    params = (load_params(args.network, cfg) if args.network
              else init_params(cfg, jax.random.PRNGKey(0)))
    out = export_network(params, cfg, args.ht, args.wd, args.outdir,
                         e_max=args.e_max or None)
    print(f"exported StableHLO artifacts to {out}")


if __name__ == "__main__":
    main()
