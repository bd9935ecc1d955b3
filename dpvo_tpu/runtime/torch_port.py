"""Import reference-trained encoder weights.

The reference ships trained fnet/inet encoders as ONNX graphs
(onnx_models/{fnet,inet}.onnx, exported by export_fnet_inet.py with
plain torch state-dict initializer names like ``fnet.layer2.0.conv1
.weight``). This module parses the ONNX protobuf directly (no onnx
package needed — only ModelProto.graph.initializer is read) and maps
the tensors onto our flax Patchifier pytree:

  torch                      flax (params['patchifier']['params'])
  fnet.conv1.*            -> fnet.Conv_0            (7x7/s2 stem)
  fnet.layer1.{0,1}.*     -> fnet.ResidualBlock_{0,1}
  fnet.layer2.{0,1}.*     -> fnet.ResidualBlock_{2,3}
  ...conv1/conv2          ->   Conv_0 / Conv_1
  ...downsample.0         ->   Conv_2
  fnet.conv2.*            -> fnet.Conv_1            (1x1 head)
  (same for inet)

Conv kernels transpose from torch [O, I, KH, KW] to flax
[KH, KW, I, O]. Instance norms carry no parameters (affine=False),
matching our InstanceNorm.

NOTE on the update operator: its weights are intentionally NOT
portable — our correlation features use the canonical TPU layout
(ops/corr_pallas.py docstring), which permutes and widens the corr MLP
input relative to the reference's 882-wide stacking, so the update
operator must be trained with apps/train.py. Encoders are layout
-independent and port exactly.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

# --- minimal protobuf wire-format reader (ModelProto subset) ---


def _read_varint(b: bytes, i: int):
    x = 0
    s = 0
    while True:
        v = b[i]
        i += 1
        x |= (v & 0x7F) << s
        if not v & 0x80:
            return x, i
        s += 7


def _fields(b: bytes):
    i = 0
    while i < len(b):
        tag, i = _read_varint(b, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 2:
            ln, i = _read_varint(b, i)
            yield fn, b[i:i + ln]
            i += ln
        elif wt == 0:
            v, i = _read_varint(b, i)
            yield fn, v
        elif wt == 5:
            yield fn, b[i:i + 4]
            i += 4
        elif wt == 1:
            yield fn, b[i:i + 8]
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")


_ONNX_DTYPES = {1: np.float32, 6: np.int32, 7: np.int64, 10: np.float16}


def parse_onnx_weights(path: str) -> Dict[str, np.ndarray]:
    """Extract {initializer name: array} from an ONNX file."""
    data = open(path, "rb").read()
    graph = None
    for fn, v in _fields(data):
        if fn == 7:  # ModelProto.graph
            graph = v
    if graph is None:
        raise ValueError(f"{path}: no graph")
    out = {}
    for fn, v in _fields(graph):
        if fn != 5:  # GraphProto.initializer
            continue
        name, dims, dtype, raw = None, [], 1, b""
        for f2, v2 in _fields(v):
            if f2 == 1:
                dims.append(v2)
            elif f2 == 2:
                dtype = v2
            elif f2 == 8:
                name = v2.decode()
            elif f2 == 9:
                raw = v2
        arr = np.frombuffer(raw, _ONNX_DTYPES[dtype]).reshape(dims)
        out[name] = arr.astype(np.float32)
    return out


# --- mapping onto the flax Patchifier ---


def _conv(tensors, prefix):
    w = tensors.pop(prefix + ".weight").transpose(2, 3, 1, 0)  # OIHW -> HWIO
    b = tensors.pop(prefix + ".bias")
    return {"kernel": w, "bias": b}


def _encoder_params(tensors, net: str) -> Dict:
    p = {
        "Conv_0": _conv(tensors, f"{net}.conv1"),
        "Conv_1": _conv(tensors, f"{net}.conv2"),
    }
    blocks = [("layer1.0", 0), ("layer1.1", 1), ("layer2.0", 2), ("layer2.1", 3)]
    for tname, bi in blocks:
        blk = {
            "Conv_0": _conv(tensors, f"{net}.{tname}.conv1"),
            "Conv_1": _conv(tensors, f"{net}.{tname}.conv2"),
        }
        ds = f"{net}.{tname}.downsample.0.weight"
        if ds in tensors:
            blk["Conv_2"] = _conv(tensors, f"{net}.{tname}.downsample.0")
        p[f"ResidualBlock_{bi}"] = blk
    return p


def port_reference_encoders(params: Dict, fnet_onnx: str, inet_onnx: str) -> Dict:
    """Replace the Patchifier's fnet/inet weights with the reference's
    trained encoders; every initializer must be consumed exactly once."""
    import jax

    new_pf = dict(params["patchifier"]["params"]) if "params" in params["patchifier"] else dict(params["patchifier"])
    for net, path in (("fnet", fnet_onnx), ("inet", inet_onnx)):
        tensors = parse_onnx_weights(path)
        ported = _encoder_params(tensors, net)
        leftover = [k for k in tensors if k.startswith(net + ".")]
        if leftover:
            raise ValueError(f"unmapped reference tensors: {leftover}")
        # shape check against the existing tree
        old = new_pf[net]
        for path_k, arr in jax.tree_util.tree_flatten_with_path(ported)[0]:
            ref = old
            for k in path_k:
                ref = ref[k.key]
            if tuple(ref.shape) != tuple(arr.shape):
                raise ValueError(f"{net}{jax.tree_util.keystr(path_k)}: "
                                 f"shape {arr.shape} != {tuple(ref.shape)}")
        new_pf[net] = jax.tree_util.tree_map(np.asarray, ported)

    out = dict(params)
    if "params" in params["patchifier"]:
        out["patchifier"] = {"params": new_pf}
    else:
        out["patchifier"] = new_pf
    return out
