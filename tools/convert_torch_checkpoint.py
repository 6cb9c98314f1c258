"""Convert a PyTorch MD_RDM checkpoint into md_rdm_tpu flax variables.

Parity harness (SURVEY.md section 7, step 4): load a reference
``state_dict`` (from Lightning checkpoints: keys prefixed ``model.``),
convert to the NHWC flax layout, and save as an orbax-compatible pickle of
``{"params": ..., "batch_stats": ...}``.

Name mapping (reference RDM_Net.py structure -> models/*):
  encoder.conv_e1.{weight,bias}        -> encoder/conv_e1 {kernel OIHW->HWIO, bias}
  encoder.dense_eK.denselayerN.{norm1,conv1,norm2,conv2}
                                       -> encoder/dense_eK/denselayerN/...
  encoder.trans_eK.{norm,conv}         -> encoder/trans_eK/...
  d_I.dense_layer.denselayerN...       -> d_I/dense_layer/denselayerN/...
  d_I.wsm_block.WSM_J.*                -> d_I/wsm_block/WSM_J/* (ConvTranspose
                                          kernels flipped spatially: torch
                                          correlates the transposed kernel)
  d_I.conv1/conv2                      -> d_I/conv1, d_I/conv2
  weight_layer.{d0,f1..f7}             -> weight_layer/{d0,f1..f7}
BatchNorm: weight->scale, bias->bias, running_mean->mean (batch_stats),
running_var->var (batch_stats).

Usage:
  python tools/convert_torch_checkpoint.py ckpt.pth.tar out_variables.msgpack
"""
from __future__ import annotations

import argparse
import pickle
import re
import sys
from typing import Any, Dict

import numpy as np


def _set(tree: Dict, path, value):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def convert_state_dict(sd: Dict[str, "Any"]):
    """torch state_dict -> (params, batch_stats) nested dicts (numpy)."""
    params: Dict = {}
    stats: Dict = {}
    for name, tensor in sd.items():
        v = np.asarray(tensor.detach().cpu().numpy()
                       if hasattr(tensor, "detach") else tensor)
        name = re.sub(r"^model\.", "", name)
        if name.startswith("quantizers"):
            continue
        if v.size == 0:
            # zero-size fusion-weight slots (reference keeps empty frozen
            # tensors, RDM_Net.py:470-472); the flax model has no param
            continue
        parts = name.split(".")
        # torchvision dense layers appear as denselayerN.norm1 etc.; our
        # modules use identical names, so the path maps 1:1.  Bare numeric
        # components are torch Sequential indices (deconv1.0, wsm_wx3.1);
        # the flax modules fold those wrappers away.
        leaf = parts[-1]
        mod_path = [p for p in parts[:-1] if not p.isdigit()]

        is_norm = any(p.startswith("norm") or p == "bn" for p in mod_path[-1:])
        if leaf == "running_mean":
            _set(stats, (*mod_path, "mean"), v)
            continue
        if leaf == "running_var":
            _set(stats, (*mod_path, "var"), v)
            continue
        if leaf == "num_batches_tracked":
            continue
        if is_norm and leaf == "weight":
            _set(params, (*mod_path, "scale"), v)
            continue
        if leaf == "weight" and v.ndim == 4:
            if "deconv1" in mod_path:
                # ConvTranspose2d weight is (in, out, kh, kw); flax
                # ConvTranspose kernel is (kh, kw, in, out) and torch
                # computes correlation with the spatially flipped kernel.
                k = v.transpose(2, 3, 0, 1)[::-1, ::-1]
                _set(params, (*mod_path, "kernel"), np.ascontiguousarray(k))
            else:
                # Conv2d OIHW -> HWIO
                _set(params, (*mod_path, "kernel"), v.transpose(2, 3, 1, 0))
            continue
        if leaf == "weight" and v.ndim == 1:    # 1-ch BN or scale
            _set(params, (*mod_path, "scale"), v)
            continue
        if leaf == "bias":
            _set(params, (*mod_path, "bias"), v)
            continue
        if parts[0] == "weight_layer":          # d0/f1.. parameter leaves
            _set(params, ("weight_layer", parts[1]), v)
            continue
        _set(params, tuple(parts), v)
    return params, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help="torch checkpoint (.pth/.pth.tar/.ckpt)")
    ap.add_argument("dst", help="output pickle of flax variables")
    args = ap.parse_args()

    import torch
    ckpt = torch.load(args.src, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt.get("model", ckpt))
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params, stats = convert_state_dict(sd)
    with open(args.dst, "wb") as f:
        pickle.dump({"params": params, "batch_stats": stats}, f)
    n = sum(v.size for v in _iter_leaves(params))
    print(f"wrote {args.dst}: {n/1e6:.1f}M params")


def _iter_leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _iter_leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
