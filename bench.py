"""End-to-end tracking benchmark — frames/second on one chip.

Runs the full DPVO pipeline (patchify -> correlation -> update operator
-> sliding-window BA -> keyframing) on a deterministic synthetic
480x640 sequence and reports steady-state FPS.

Baseline: the reference repo commits no FPS numbers (BASELINE.md); the
DPVO paper's real-time claim for the default config is ~60 FPS on a
desktop GPU, so vs_baseline = fps / 60.0. The BASELINE.json target is
>= 2x reference FPS per chip (vs_baseline >= 2.0).

Prints exactly one JSON line:
  {"metric": "vo_fps", "value": N, "unit": "frames/s", "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from dpvo_tpu.config import load_config
    from dpvo_tpu.runtime import DPVO
    from dpvo_tpu.utils.synthetic import PlaneScene

    ht, wd = 480, 640
    n_warmup = 30  # covers init (frame 8) + all steady-state jit compiles
    n_bench = 100

    import os

    # the published-results profile (96 patches etc), like the reference's
    # eval scripts run
    yaml = os.path.join(os.path.dirname(os.path.abspath(__file__)), "config", "default.yaml")
    overrides = {}
    if "--opts" in sys.argv:  # e.g. --opts LOOP_CLOSURE True (GBA on-device)
        kv = []
        for a in sys.argv[sys.argv.index("--opts") + 1:]:
            if a.startswith("--"):  # K V pairs end at the next flag
                break
            kv.append(a)
        overrides = dict(zip(kv[0::2], kv[1::2]))
    # Headline number runs the ACCURACY-NEUTRAL config: pipeline depth
    # 1 is trajectory-identical to reference-exact keyframe timing
    # (scripts/kf_lag_ab.py, PARITY.md), while depth 4 changed keyframe
    # sets and cost ~15% rel-ATE on worst-case tiny scenes. Deeper
    # pipelining hides more tunnel RTT and raises FPS — measure it with
    # --opts PIPELINE_DEPTH 4, reported separately in PERF.md.
    overrides.setdefault("PIPELINE_DEPTH", "1")
    cfg = load_config(yaml if os.path.exists(yaml) else None, overrides)

    # trained weights: --network PATH, $DPVO_BENCH_NETWORK, or the
    # committed flagship checkpoint. With real weights the benchmark
    # runs the product's own gates (motion probe, flow-driven
    # keyframing) — no monkeypatches.
    network = None
    if "--network" in sys.argv:
        network = sys.argv[sys.argv.index("--network") + 1]
    elif os.environ.get("DPVO_BENCH_NETWORK"):
        network = os.environ["DPVO_BENCH_NETWORK"]
    else:
        cand = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "weights", "vonet_synth.npz")
        if os.path.exists(cand):
            network = cand

    # motion sized so trained weights pass the probe gate (~8 full-res
    # px/frame of flow at depth 4, fx=512 -> tstep ~ 8*4/512/3)
    scene = PlaneScene(ht=ht, wd=wd, n_frames=n_warmup + n_bench, depth=4.0,
                       seed=7, tstep=0.035 if network is None else 0.06,
                       rstep=0.004)
    frames = [scene.render(t) for t in range(n_warmup + n_bench)]

    slam = DPVO(cfg, network, ht=ht, wd=wd, seed=0)
    if network is None:
        # untrained weights would fail the motion-probe init gate
        # (dpvo.py:975-978); force initialization so the benchmark
        # exercises the full steady-state pipeline the way trained
        # weights would
        slam._motion_probe = lambda: 1e9
        # deterministic keyframe cadence: with random weights the flow
        # magnitude is chaotic, which makes the per-frame work mix (and
        # so the FPS) non-reproducible; cull every 4th frame like a
        # typical EuRoC run so regressions are attributable
        orig_decide = slam._keyframe_decide
        state = {"i": 0}

        def fixed_decide(m, **kw):
            state["i"] += 1
            orig_decide(0.0 if state["i"] % 4 == 0 else 1e9, **kw)

        slam._keyframe_decide = fixed_decide
    else:
        print(f"# benchmarking with trained weights: {network}", file=sys.stderr)

    # warmup covers initialization + the jit compiles the warmup path
    # itself reaches
    for t in range(n_warmup):
        slam(t, frames[t], scene.intrinsics.copy())
    jax.block_until_ready(slam.state.poses)

    # pre-compile every capacity bucket the steady state might cross:
    # with real (trained-weights) keyframing the live edge count drifts
    # across bucket boundaries mid-bench, and a single mid-run XLA
    # compile (~30 s) would dominate the 100-frame average. AOT
    # lower+compile executes nothing and is cached.
    slam._flush_pending()
    import jax.numpy as jnp
    import numpy as np
    for b in slam._buckets:
        if b not in slam._framebufs:
            slam._framebufs[b] = np.zeros(slam.steps.layout_for(b)[1], np.uint8)
        try:
            slam.steps.frame_step_for(b).lower(
                slam.params, slam.state, jax.device_put(frames[0]),
                jnp.asarray(slam._framebufs[b]), jax.random.PRNGKey(0),
            ).compile()
        except Exception as e:  # noqa: BLE001 — best-effort prewarm
            print(f"# bucket {b} prewarm failed: {e}", file=sys.stderr)

    bench_frames = frames
    if "--preupload" in sys.argv:
        # isolate the image-upload cost: device_put of an already
        # committed array is a no-op inside __call__
        bench_frames = list(frames[:n_warmup]) + [
            jax.device_put(f) for f in frames[n_warmup:]
        ]
        jax.block_until_ready(bench_frames[-1])

    pt0 = dict(slam.phase_times)
    t0 = time.perf_counter()
    for t in range(n_warmup, n_warmup + n_bench):
        slam(t, bench_frames[t], scene.intrinsics.copy())
    jax.block_until_ready(slam.state.poses)
    dt = time.perf_counter() - t0

    if "--device" in sys.argv:
        # tunnel-independent device-program time: chain frame_step K
        # times in one lax.scan and difference two K values, so tunnel
        # RTT/dispatch costs cancel
        import jax.numpy as jnp
        from jax import lax

        steps = slam.steps
        params = slam.params
        img = jax.device_put(frames[-1])
        # measure the capacity bucket the steady state actually ran
        E_cap = slam._last_bucket
        buf = jnp.asarray(slam._framebufs[E_cap])
        key = jax.random.PRNGKey(9)
        print(f"# device bucket: E_cap={E_cap}", file=sys.stderr)

        def scan_k(k):
            def fn(st):
                def body(s, _):
                    s2, _out = steps._frame_step(params, s, img, buf, key,
                                                 E_cap=E_cap)
                    return s2, ()
                return lax.scan(body, st, None, length=k)[0]
            return jax.jit(fn)

        slam._flush_pending()
        times = {}
        for k in (2, 12):
            f = scan_k(k)
            st = f(slam.state)
            jax.block_until_ready(st.poses)
            t1 = time.perf_counter()
            st = f(slam.state)
            jax.block_until_ready(st.poses)
            times[k] = time.perf_counter() - t1
        dev_ms = (times[12] - times[2]) / 10 * 1e3
        print(f"# device frame_step: {dev_ms:.1f} ms/frame", file=sys.stderr)

    # per-phase host-timeline split, always recorded in the JSON so the
    # committed BENCH artifact is diagnosable (a tunnel-weather drain
    # spike reads as exactly that, not as a framework regression)
    pt = slam.phase_times
    nf = max(pt["frames"] - pt0["frames"], 1)
    phases = {}
    other = dt
    for k in ("upload", "drain", "pack", "dispatch"):
        phases[k] = round((pt[k] - pt0[k]) / nf * 1e3, 2)
        other -= pt[k] - pt0[k]
    phases["other"] = round(other / nf * 1e3, 2)
    if "--phases" in sys.argv:
        for k, v in phases.items():
            print(f"# {k}: {v:.1f} ms/frame", file=sys.stderr)

    fps = n_bench / dt
    print(json.dumps({
        "metric": "vo_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 3),
        # self-describing artifact: which weights + pipeline depth ran
        "weights": network or "random",
        "pipeline_depth": cfg.PIPELINE_DEPTH,
        "phases_ms": phases,
    }))


if __name__ == "__main__":
    sys.exit(main())
