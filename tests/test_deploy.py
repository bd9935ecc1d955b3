"""StableHLO export/reload round-trip (ref ONNX deployment layer)."""

import numpy as np
import jax
import jax.numpy as jnp


def test_export_roundtrip(tmp_path):
    from dpvo_tpu.config import Config
    from dpvo_tpu.deploy import export_network, load_exported
    from dpvo_tpu.runtime.weights import init_params

    cfg = Config(BUFFER_SIZE=16, E_MAX=128, E_INAC_MAX=128, PMEM=4, MEM=4,
                 M_OPT_MAX=64)
    ht, wd = 64, 96
    params = init_params(cfg, jax.random.PRNGKey(0))
    outdir = export_network(params, cfg, ht, wd, str(tmp_path / "export"), e_max=128)
    net = load_exported(outdir)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (ht, wd, 3)), jnp.uint8)
    key = jax.random.PRNGKey(1)
    fmap, gmap, imap, patches, clr = net.patchify(img, key)
    assert fmap.shape == (ht // 4, wd // 4, cfg.FDIM)
    assert gmap.shape == (cfg.PATCHES_PER_FRAME, cfg.FDIM, 3, 3)

    # compare against the in-process model
    from dpvo_tpu.runtime.steps import StepFunctions
    steps = StepFunctions(cfg, ht, wd)
    fmap2, gmap2, *_ = steps.patchify(params, img, key)
    np.testing.assert_allclose(np.asarray(fmap, np.float32),
                               np.asarray(fmap2, np.float32), atol=0.06)  # bf16 encoder chains

    E, D = 128, cfg.DIM
    fdt = jnp.bfloat16 if cfg.MIXED_PRECISION else jnp.float32
    z = jnp.asarray(rng.standard_normal((E, D)), fdt)
    corr = jnp.asarray(rng.standard_normal((E, cfg.CORR_WIDTH)), fdt)
    idx = jnp.zeros(E, jnp.int32)
    msk = jnp.ones(E, bool)
    out_net, d, w = net.update(z, z, corr, idx, idx, msk, msk, idx, idx, msk)
    assert out_net.shape == (E, D) and d.shape == (E, 2) and w.shape == (E, 2)


def test_dpvo_consumes_export_dir(tmp_path):
    """DPVO auto-selects a StableHLO export directory as its network,
    like the reference's onnx-dir convention (dpvo/dpvo.py:187-268),
    and tracks identically to the in-process flax modules."""
    from dpvo_tpu.config import Config
    from dpvo_tpu.deploy import export_network
    from dpvo_tpu.runtime import DPVO
    from dpvo_tpu.runtime.weights import init_params

    cfg = Config(BUFFER_SIZE=32, E_MAX=256, E_INAC_MAX=128, PMEM=6, MEM=6,
                 M_OPT_MAX=64, PATCHES_PER_FRAME=8, MIXED_PRECISION=False,
                 KEYFRAME_INDEX=2, OPTIMIZATION_WINDOW=4, REMOVAL_WINDOW=5,
                 PATCH_LIFETIME=4, W_OPT_MAX=6)
    ht, wd = 64, 96
    params = init_params(cfg, jax.random.PRNGKey(0))
    outdir = export_network(params, cfg, ht, wd, str(tmp_path / "exp"))

    a = DPVO(cfg, network=params, ht=ht, wd=wd)
    b = DPVO(cfg, network=outdir, ht=ht, wd=wd)
    assert b.steps.exported is not None

    rng = np.random.default_rng(3)
    intr = np.array([60.0, 60.0, 48.0, 32.0], np.float32)
    for t in range(6):
        img = rng.integers(0, 255, (ht, wd, 3)).astype(np.uint8)
        a(t, img, intr)
        b(t, img, intr)
    pa, pb = a.poses_np(), b.poses_np()
    np.testing.assert_allclose(pb, pa, atol=1e-4)


def test_dpvo_rejects_mismatched_export(tmp_path):
    from dpvo_tpu.config import Config
    from dpvo_tpu.deploy import export_network
    from dpvo_tpu.runtime import DPVO
    from dpvo_tpu.runtime.weights import init_params
    import pytest

    cfg = Config(BUFFER_SIZE=16, E_MAX=128, E_INAC_MAX=128, PMEM=4, MEM=4,
                 M_OPT_MAX=64, MIXED_PRECISION=False)
    params = init_params(cfg, jax.random.PRNGKey(0))
    outdir = export_network(params, cfg, 64, 96, str(tmp_path / "exp"))
    with pytest.raises(ValueError, match="incompatible"):
        DPVO(cfg, network=outdir, ht=48, wd=64)
