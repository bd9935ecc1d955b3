"""Reference encoder weight import (onnx_models/{fnet,inet}.onnx).

Cross-checks the flax forward against an independent torch execution of
the same tensors (validates kernel transposition, SAME padding at
stride 2, instance-norm placement, and the residual wiring)."""

import os

import numpy as np
import pytest

REF = "/root/reference/onnx_models"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "fnet.onnx")), reason="no reference onnx"
)


def torch_encoder(tensors, net, x, instance_norm):
    import torch
    import torch.nn.functional as F

    def conv(x, name, stride=1, pad=0):
        w = torch.from_numpy(np.array(tensors[f"{net}.{name}.weight"]))
        b = torch.from_numpy(np.array(tensors[f"{net}.{name}.bias"]))
        return F.conv2d(x, w, b, stride=stride, padding=pad)

    def norm(x):
        return F.instance_norm(x) if instance_norm else x

    def block(x, name, stride=1):
        y = F.relu(norm(conv(x, f"{name}.conv1", stride, 1)))
        y = F.relu(norm(conv(y, f"{name}.conv2", 1, 1)))
        if f"{net}.{name}.downsample.0.weight" in tensors:
            x = norm(conv(x, f"{name}.downsample.0", stride, 0))
        return F.relu(x + y)

    x = F.relu(norm(conv(x, "conv1", 2, 3)))
    x = block(x, "layer1.0")
    x = block(x, "layer1.1")
    x = block(x, "layer2.0", 2)
    x = block(x, "layer2.1")
    return conv(x, "conv2")


def test_ported_fnet_matches_torch_execution():
    import jax
    import jax.numpy as jnp
    import torch

    from dpvo_tpu.models.extractor import BasicEncoder4
    from dpvo_tpu.runtime.torch_port import _encoder_params, parse_onnx_weights

    tensors = parse_onnx_weights(os.path.join(REF, "fnet.onnx"))
    flax_params = {"params": _encoder_params(dict(tensors), "fnet")}

    rng = np.random.default_rng(0)
    x = rng.uniform(-0.5, 1.5, (1, 32, 48, 3)).astype(np.float32)

    enc = BasicEncoder4(128, norm_fn="instance", dtype=jnp.float32)
    got = np.asarray(enc.apply(flax_params, jnp.asarray(x)))  # NHWC

    with torch.no_grad():
        want = torch_encoder(tensors, "fnet",
                             torch.from_numpy(x.transpose(0, 3, 1, 2)),
                             instance_norm=True)
    want = want.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_port_consumes_all_initializers():
    import jax

    from dpvo_tpu.config import Config
    from dpvo_tpu.runtime.torch_port import port_reference_encoders
    from dpvo_tpu.runtime.weights import init_params

    cfg = Config(BUFFER_SIZE=16, E_MAX=128, E_INAC_MAX=128, PMEM=4, MEM=4, M_OPT_MAX=64)
    params = init_params(cfg, jax.random.PRNGKey(0))
    p2 = port_reference_encoders(params, os.path.join(REF, "fnet.onnx"),
                                 os.path.join(REF, "inet.onnx"))
    k = p2["patchifier"]["params"]["fnet"]["Conv_0"]["kernel"]
    assert k.shape == (7, 7, 3, 32)
