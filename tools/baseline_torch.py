"""Measure the PyTorch-CPU baseline: the reference's live forward path.

The reference itself cannot run in this image (torchvision and
pytorch_lightning are not installed), so this tool reconstructs the live
path's compute graph in plain torch - identical shapes and operations:
DenseNet encoder (RDM_Net.py:515-534), decoder-1 dense block + 180-channel
DORN head (RDM_Net.py:137-162,313-345), geometric-mean normalization,
3-level decomposition and fusion-weight application.  When the reference
mount is available its own ``network/computations.py`` is imported and used
for the fusion tail (oracle, not a copy).

Outputs JSON: images/sec at batch 16 on CPU (the BASELINE.md target basis).

Usage: python tools/baseline_torch.py [--batch 16] [--iters 10]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import torch
import torch.nn as nn


class DenseLayer(nn.Module):
    def __init__(self, in_ch, bn_size, growth):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(in_ch)
        self.conv1 = nn.Conv2d(in_ch, bn_size * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(bn_size * growth)
        self.conv2 = nn.Conv2d(bn_size * growth, growth, 3, padding=1,
                               bias=False)

    def forward(self, x):
        h = self.conv1(torch.relu(self.norm1(x)))
        return self.conv2(torch.relu(self.norm2(h)))


class DenseBlock(nn.Module):
    def __init__(self, layers, in_ch, bn_size, growth):
        super().__init__()
        self.layers = nn.ModuleList(
            [DenseLayer(in_ch + i * growth, bn_size, growth)
             for i in range(layers)])

    def forward(self, x):
        for layer in self.layers:
            x = torch.cat([x, layer(x)], 1)
        return x


class Transition(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.norm = nn.BatchNorm2d(in_ch)
        self.conv = nn.Conv2d(in_ch, out_ch, 1, bias=False)
        self.pool = nn.AvgPool2d(2, 2)

    def forward(self, x):
        return self.pool(self.conv(torch.relu(self.norm(x))))


class LiveForward(nn.Module):
    """Encoder + decoder-1 DORN head (the reference's live path)."""

    def __init__(self):
        super().__init__()
        self.conv_e1 = nn.Conv2d(3, 96, 7, stride=2, padding=3)
        self.max_e1 = nn.MaxPool2d(3, stride=2, padding=1)
        self.dense_e2 = DenseBlock(6, 96, 57, 48)
        self.trans_e2 = Transition(384, 192)
        self.dense_e3 = DenseBlock(12, 192, 29, 48)
        self.trans_e3 = Transition(768, 384)
        self.dense_e4 = DenseBlock(36, 384, 15, 48)
        self.trans_e4 = Transition(2112, 1056)
        self.pad_br = nn.ZeroPad2d((0, 1, 0, 1))
        self.dec_dense = DenseBlock(24, 1056, 8, 48)
        self.conv2 = nn.Conv2d(2208, 180, 1)
        self.w = nn.ParameterList(
            [nn.Parameter(torch.abs(torch.randn(1, 1))) for _ in range(4)])

    def forward(self, x):
        x = self.max_e1(self.conv_e1(x))
        x = self.trans_e2(self.pad_br(self.dense_e2(x)))
        x = self.trans_e3(self.pad_br(self.dense_e3(x)))
        x = self.trans_e4(self.pad_br(self.dense_e4(x)))
        x = self.conv2(self.dec_dense(x))
        # DORN decode
        n, c, h, w = x.shape
        a = x[:, 0::2].clamp(1e-8, 1e4)
        b = x[:, 1::2].clamp(1e-8, 1e4)
        probs = torch.sigmoid(b - a)
        decode = (probs > 0.5).sum(1, keepdim=True).float()
        return decode, probs


def fusion_tail(decode, ref_cp):
    b, _, h, w = decode.shape
    gm = ref_cp.quick_gm(decode.view(b, h * w, 1), h)
    normed = decode / gm.expand(b, h * w).view(b, 1, h, w)
    comps = ref_cp.decompose_depth_map([], normed, 3)[::-1]
    mats = ref_cp.relative_fine_detail_matrix([comps], cuda=False)
    return mats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--threads", type=int, default=0)
    args = ap.parse_args()

    if args.threads:
        torch.set_num_threads(args.threads)

    ref_cp = None
    if os.path.isdir("/root/reference"):
        sys.dont_write_bytecode = True
        sys.path.insert(0, "/root/reference")
        try:
            import network.computations as ref_cp  # type: ignore
        except Exception:
            ref_cp = None

    model = LiveForward().eval()
    x = torch.rand(args.batch, 3, 226, 226)

    with torch.no_grad():
        model(x)  # warmup
        t0 = time.perf_counter()
        for _ in range(args.iters):
            decode, probs = model(x)
            if ref_cp is not None:
                fusion_tail(decode.double(), ref_cp)
        dt = (time.perf_counter() - t0) / args.iters

    ips = args.batch / dt
    print(json.dumps({
        "torch_cpu_images_per_sec": ips,
        "batch": args.batch,
        "sec_per_batch": dt,
        "threads": torch.get_num_threads(),
        "includes_fusion_tail": ref_cp is not None,
    }))


if __name__ == "__main__":
    main()
