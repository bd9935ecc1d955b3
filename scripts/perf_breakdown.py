"""Per-component device-time breakdown of the steady-state frame step.

Builds the same steady-state tracker as bench.py, then times each
device program in isolation with LICM-safe lax.scan differencing (chain
K repetitions in one program, difference two K values so dispatch and
tunnel RTT cancel; a data dependency threads each iteration so XLA
cannot hoist the body).

Components (all at the steady-state capacity bucket):
  frame_step   — the whole fused program (patchify+ingest+update+BA+kf)
  patchify     — the two CNN encoders + patch gather
  edge_fwd     — reproject + correlation + update operator (no BA)
  update_ba    — edge_fwd + sliding-window BA (diff vs edge_fwd = BA)
  corr         — reproject + correlation only
  maintenance  — deferred keyframe cull + edge compaction program

Usage:  python scripts/perf_breakdown.py [--network PATH] [--opts K V ...]
Prints a markdown table (ms/frame) for PERF.md.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def scan_time(fn, init, k_lo=2, k_hi=12, reps=3):
    """Time fn chained k times; return per-iteration seconds.

    Every row body MUST thread a data dependency through its carry so
    XLA cannot hoist loop-invariant work out of the scan (LICM) — see
    the eps-threading in each body below. Differencing two chain
    lengths cancels dispatch + tunnel RTT; the min over ``reps`` runs
    rejects host-side noise (a single-shot diff produced negative rows
    in round 3)."""
    import jax
    from jax import lax

    def chain(k):
        def run(st):
            return lax.scan(lambda c, _: (fn(c), ()), st, None, length=k)[0]
        return jax.jit(run)

    times = {}
    for k in (k_lo, k_hi):
        f = chain(k)
        out = f(init)          # compile + warm
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(init)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    return (times[k_hi] - times[k_lo]) / (k_hi - k_lo)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--network", default=None)
    p.add_argument("--opts", nargs="*", default=[])
    p.add_argument("--ht", type=int, default=480)
    p.add_argument("--wd", type=int, default=640)
    p.add_argument("--device", default="",
                   help="jax platform override (env vars alone are "
                        "overridden by the device plugin here)")
    p.add_argument("--rows", default="",
                   help="comma-separated substring filter of rows to "
                        "measure (default: all)")
    args = p.parse_args()

    _want = [w for w in args.rows.split(",") if w]

    def sel(name):
        return not _want or any(w in name for w in _want)

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp

    from dpvo_tpu.config import load_config
    from dpvo_tpu.runtime import DPVO
    from dpvo_tpu.runtime.dpvo import _es_dict
    from dpvo_tpu.utils.synthetic import PlaneScene

    yaml = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "config", "default.yaml")
    overrides = dict(zip(args.opts[0::2], args.opts[1::2]))
    overrides.setdefault("PIPELINE_DEPTH", "4")
    if args.device == "cpu":
        # the XLA CPU backend cannot execute bf16 dots
        overrides.setdefault("MIXED_PRECISION", "False")
    cfg = load_config(yaml, overrides)

    network = args.network or os.environ.get("DPVO_BENCH_NETWORK")
    if network and network.lower() in ("none", "random"):
        network = None          # force random weights + fixed cull cadence
    elif network is None:
        cand = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                            "weights", "vonet_synth.npz")
        if os.path.exists(cand):
            network = cand

    n_warm = 30
    scene = PlaneScene(ht=args.ht, wd=args.wd, n_frames=n_warm, depth=4.0,
                       seed=7, tstep=0.035 if network is None else 0.06,
                       rstep=0.004)
    slam = DPVO(cfg, network, ht=args.ht, wd=args.wd, seed=0)
    if network is None:
        slam._motion_probe = lambda: 1e9
        orig = slam._keyframe_decide
        st = {"i": 0}

        def fixed(m, **kw):
            st["i"] += 1
            orig(0.0 if st["i"] % 4 == 0 else 1e9, **kw)

        slam._keyframe_decide = fixed
    for t in range(n_warm):
        slam(t, scene.render(t), scene.intrinsics.copy())
    slam._flush_pending()
    jax.block_until_ready(slam.state.poses)

    steps = slam.steps
    params = slam.params
    E_cap = slam._last_bucket
    buf = jnp.asarray(slam._framebufs[E_cap])
    img = jax.device_put(scene.render(n_warm - 1))
    key = jax.random.PRNGKey(9)
    es = _es_dict(slam.topo.edge_set())
    es = {k: jnp.asarray(v) for k, v in es.items()}
    n_edges = int(len(slam.topo.ii))
    t0v = jnp.int32(max(slam.n - cfg.OPTIMIZATION_WINDOW, 1))
    nfree = jnp.int32(int(max(slam.n - max(slam.n - cfg.OPTIMIZATION_WINDOW, 1), 0)))
    print(f"# backend={jax.default_backend()} E_cap={E_cap} live_edges={n_edges} "
          f"n={slam.n} corr_impl={steps.corr_impl} "
          f"weights={'trained' if network else 'random'}", file=sys.stderr)

    rows = []

    if sel("frame_step"):
        rows.append(("frame_step", scan_time(
        lambda s: steps._frame_step(params, s, img, buf, key, E_cap=E_cap)[0],
        slam.state)))

    # patchify: thread a data dep through the image so LICM cannot hoist
    # the loop-invariant body (acc*1e-30 is not provably zero for floats)
    def pf_body(c):
        imgf, acc = c
        imgf = imgf + acc * 1e-30
        fmap, gmap_p, imap_p, patches, clr = steps._patchify(params, imgf, key)
        return imgf, jnp.sum(fmap[0, 0, :1]).astype(jnp.float32)

    if sel("patchify"):
        rows.append(("patchify", scan_time(
        pf_body, (img.astype(jnp.float32), jnp.float32(0.0)))))

    def ingest_body(s):
        return steps._ingest(
            s, jnp.int32(slam.n - 1),
            s.fmap1[0], s.gmap[: cfg.PATCHES_PER_FRAME],
            s.imap[: cfg.PATCHES_PER_FRAME],
            s.patches[: cfg.PATCHES_PER_FRAME],
            jnp.zeros((cfg.PATCHES_PER_FRAME, 3)), s.intrinsics[0] * cfg.RES,
            jnp.float32(1.0), jnp.bool_(True), jnp.bool_(True), key)

    if sel("ingest"):
        rows.append(("ingest", scan_time(ingest_body, slam.state)))

    # edge_fwd: _update_noba leaves poses/patches untouched, so without
    # threading XLA hoists the (loop-invariant) reproject+corr out of
    # the scan — the round-3 4.73 ms row was only the update operator.
    # Feed an output-dependent epsilon back into poses each iteration.
    def ef_body(s):
        s2 = steps._update_noba(params, s, es)
        eps = (jnp.sum(s2.net[:1, :1]) * 1e-30).astype(s2.poses.dtype)
        return s2._replace(poses=s2.poses + eps)

    if sel("edge_fwd (corr+update-op)"):
        rows.append(("edge_fwd (corr+update-op)", scan_time(ef_body, slam.state)))

    # update+BA rewrites poses via the BA retraction — naturally threaded
    if sel("update+BA"):
        rows.append(("update+BA", scan_time(
        lambda s: steps._update(params, s, es, t0v, nfree), slam.state)))

    # corr only: reproject + correlate, carry threads coords via a scalar
    from dpvo_tpu.geom import projective as pops
    from dpvo_tpu.ops.corr import corr_features_xla
    from dpvo_tpu.ops.corr_pallas import (
        corr_features_pallas, corr_features_pallas_dma,
        corr_features_pallas_fused, corr_features_pallas_sw)

    corr_fn = {"pallas": corr_features_pallas,
               "pallas_sw": corr_features_pallas_sw,
               "pallas_dma": corr_features_pallas_dma,
               "pallas_fused": corr_features_pallas_fused}.get(
                   steps.corr_impl, corr_features_xla)
    state = slam.state

    def corr_body(c):
        eps, acc = c
        coords = pops.transform(
            state.poses, state.patches, state.intrinsics,
            es["ii"], es["jj"], es["kk"]) + eps
        corr = corr_fn(state.gmap, state.fmap1, state.fmap2,
                       coords.astype(jnp.float32), es["ii1"], es["jj1"],
                       es["valid"], radius=cfg.CORR_RADIUS)
        return jnp.sum(corr).astype(jnp.float32) * 1e-30, acc

    if sel("reproject+corr"):
        rows.append(("reproject+corr", scan_time(corr_body, (jnp.float32(0.0),) * 2)))

    # update operator only (net + fixed ctx/corr; carry threads net)
    E_full = int(es["ii"].shape[0])
    corr0 = jnp.zeros((E_full, cfg.CORR_WIDTH), steps.fdt)
    ctx0 = state.imap[es["ii1"]]

    def upd_body(net):
        net2, _, _ = steps.update_op.apply(
            params["update"], net, ctx0, corr0,
            es["ix"], es["jx"], es["mask_ix"], es["mask_jx"],
            es["kk_seg"], es["ij_seg"], es["valid"],
            num_segments=cfg.M_OPT_MAX, num_ij_segments=2 * steps.PAIR_MAX)
        return net2

    if sel("update-op"):
        rows.append(("update-op", scan_time(upd_body, state.net[:E_full])))

    # maintenance with an active cull (worst case: buffer shifts)
    perm = jnp.arange(E_cap, dtype=jnp.int32)
    z16 = jnp.zeros(E_cap, jnp.int32)
    k_cull = jnp.int32(max(slam.n - cfg.KEYFRAME_INDEX, 1))

    if sel("maintenance (cull)"):
        rows.append(("maintenance (cull)", scan_time(
        lambda s: steps._maintenance(s, perm, z16, z16, k_cull,
                                     jnp.int32(slam.n), jnp.int32(0)),
        slam.state)))

    # maintenance on a NO-cull, no-removal frame (k=-1, nstore=0): the
    # steady-state common case.  Ideally ~0; any cost here is the
    # unconditional edge-payload compaction gather / inactive-store
    # scatter / lax.cond pass-through copies (VERDICT r4 weak #3).
    if sel("maintenance (no-op frame)"):
        rows.append(("maintenance (no-op frame)", scan_time(
        lambda s: steps._maintenance(s, perm, z16, z16, jnp.int32(-1),
                                     jnp.int32(slam.n), jnp.int32(0)),
        slam.state)))

    # ---- residual itemization (VERDICT r4 next #2) ----
    # unpack_frame: payload buffer -> es/meta/ops (bitcasts, bit
    # unpacking, cumsum compactions, jj_inv scatter)
    def unpack_body(c):
        b, acc = c
        es_u, meta_u, (p_u, s_u, d_u) = steps.unpack_frame(b, E_cap)
        dep = (meta_u[0] * 0.0).astype(jnp.uint8)
        return b + dep, jnp.float32(p_u[0] + s_u[0] + d_u[0] + es_u["kk"][0])

    if sel("unpack payload"):
        rows.append(("unpack payload", scan_time(
        unpack_body, (buf, jnp.float32(0.0)))))

    # zero fresh edges (net/target/weight window clear)
    def zero_body(s):
        s2 = steps._zero_edges(s, jnp.int32(0), jnp.int32(cfg.PATCHES_PER_FRAME))
        eps = (jnp.sum(s2.net[:1, :1]) * 1e-30).astype(s2.net.dtype)
        return s2._replace(net=s2.net + eps)

    if sel("zero fresh edges"):
        rows.append(("zero fresh edges", scan_time(zero_body, slam.state)))

    # keyframe flow-magnitude (two _flowmag_pair calls, as in the step)
    M = cfg.PATCHES_PER_FRAME
    i_kf = jnp.int32(max(slam.n - cfg.KEYFRAME_INDEX, 1))
    kk_fm = jnp.arange(M, dtype=jnp.int32)

    def fm_body(c):
        s_eps, acc = c
        iif = jnp.full((M,), i_kf, jnp.int32)
        jjf = iif + 1
        val = jnp.ones((M,), jnp.float32)
        m1 = steps._flowmag_pair(state, iif, jjf, kk_fm + s_eps.astype(jnp.int32), val,
                                 jnp.float32(0.5))
        m2 = steps._flowmag_pair(state, jjf, iif, kk_fm, val, jnp.float32(0.5))
        return (m1 * 1e-30).astype(jnp.float32), acc + m2

    if sel("kf flow-magnitude"):
        rows.append(("kf flow-magnitude", scan_time(
        fm_body, (jnp.float32(0.0),) * 2)))

    r = dict(rows)
    parts = None
    if "update+BA" in r and "edge_fwd (corr+update-op)" in r:
        rows.append(("window BA (update+BA - edge_fwd)",
                     r["update+BA"] - r["edge_fwd (corr+update-op)"]))
    part_names = ("patchify", "ingest", "update+BA",
                  "maintenance (no-op frame)", "unpack payload",
                  "zero fresh edges", "kf flow-magnitude")
    if all(k in r for k in part_names):
        parts = sum(r[k] for k in part_names)
        rows.append(("sum(all steady-state parts)", parts))

    print("\n| component | ms/frame |\n|---|---|")
    bad = False
    for name, sec in rows:
        print(f"| {name} | {sec * 1e3:.2f} |")
        if sec <= 0:
            bad = True
    if bad:
        print("WARNING: non-positive row — measurement is untrustworthy "
              "(LICM hoist or host noise); re-run / inspect", file=sys.stderr)
    if parts is not None and "frame_step" in r and (
            parts > 1.35 * r["frame_step"] or parts < 0.65 * r["frame_step"]):
        print(f"WARNING: parts sum {parts*1e3:.2f} ms vs frame_step "
              f"{r['frame_step']*1e3:.2f} ms — rows are not sub-additive",
              file=sys.stderr)


if __name__ == "__main__":
    main()
