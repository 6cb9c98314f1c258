"""Full-model PyTorch replica of the reference's live path, with the
reference's module naming, for converted-weights parity testing.

The reference itself cannot be instantiated here (torchvision and
pytorch_lightning are absent), so this module rebuilds the same graph from
plain torch with state_dict keys that match the reference's exactly
(RDM_Net.py:515-534 encoder assembly, :137-162 Decoder, :443-491 Weights):

  encoder.conv_e1.{weight,bias}
  encoder.dense_eK.denselayerN.{norm1,conv1,norm2,conv2}.*
  encoder.trans_eK.{norm,conv}.*
  d_1.dense_layer.denselayerN.*   d_1.conv2.{weight,bias}
  weight_layer.{d0,f1..f7}

so ``tools/convert_torch_checkpoint.convert_state_dict`` maps them onto the
flax model 1:1.  The fusion tail (geometric-mean normalization, 3-level
decomposition, log-matrix build, weighted prediction, recombination) runs
through the reference's own ``network/computations.py`` when the read-only
mount is importable - an oracle, not a copy.
"""
from __future__ import annotations

import math
import os
import sys

import torch
import torch.nn as nn


def import_reference_computations():
    """Import the reference's computations.py as the fusion-tail oracle."""
    if not os.path.isdir("/root/reference"):
        return None
    sys.dont_write_bytecode = True
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        import network.computations as cp  # type: ignore
        return cp
    except Exception:
        return None


class DenseLayer(nn.Module):
    """torchvision _DenseLayer semantics (BN-ReLU-1x1-BN-ReLU-3x3)."""

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
        for i in range(layers):
            self.add_module(
                f"denselayer{i + 1}",
                DenseLayer(in_ch + i * growth, bn_size, growth))

    def forward(self, x):
        for layer in self.children():
            x = torch.cat([x, layer(x)], 1)
        return x


class Transition(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.norm = nn.BatchNorm2d(in_ch)
        self.conv = nn.Conv2d(in_ch, out_ch, 1, bias=False)

    def forward(self, x):
        return nn.functional.avg_pool2d(
            self.conv(torch.relu(self.norm(x))), 2, 2)


class Encoder(nn.Module):
    """RDM_Net.py:515-534 encoder, forward unrolled per :73-94."""

    def __init__(self):
        super().__init__()
        self.conv_e1 = nn.Conv2d(3, 96, 7, stride=2, padding=3)
        self.dense_e2 = DenseBlock(6, 96, 57, 48)
        self.trans_e2 = Transition(384, 192)
        self.dense_e3 = DenseBlock(12, 192, 29, 48)
        self.trans_e3 = Transition(768, 384)
        self.dense_e4 = DenseBlock(36, 384, 15, 48)
        self.trans_e4 = Transition(2112, 1056)

    def forward(self, x):
        pad = (0, 1, 0, 1)   # ZeroPad2d bottom/right (RDM_Net.py:532)
        x = nn.functional.max_pool2d(self.conv_e1(x), 3, 2, 1)
        x = self.trans_e2(nn.functional.pad(self.dense_e2(x), pad))
        x = self.trans_e3(nn.functional.pad(self.dense_e3(x), pad))
        x = self.trans_e4(nn.functional.pad(self.dense_e4(x), pad))
        return x


class Decoder1(nn.Module):
    """Decoder id 1: dense block + 180ch head + DORN (RDM_Net.py:137-162)."""

    def __init__(self, ordinal_channels=180):
        super().__init__()
        self.dense_layer = DenseBlock(24, 1056, 8, 48)
        self.conv2 = nn.Conv2d(2208, ordinal_channels, 1)

    def forward(self, x):
        x = self.conv2(self.dense_layer(x))
        # DORN decode (RDM_Net.py:313-345): clamp, pairwise softmax ==
        # sigmoid(B - A), decode = count of P > 0.5
        a = x[:, 0::2].clamp(1e-8, 1e4)
        b = x[:, 1::2].clamp(1e-8, 1e4)
        probs = torch.sigmoid(b - a)
        decode = (probs > 0.5).sum(1, keepdim=True).float()
        return decode, probs


class WeightLayer(nn.Module):
    """Fusion weights with the reference's parameter names (RDM_Net.py:449)."""

    def __init__(self, vector_sizes=(1, 1, 1, 1, 0, 0, 0, 0)):
        super().__init__()
        names = ["d0", "f1", "f2", "f3", "f4", "f5", "f6", "f7"]
        for name, size in zip(names, vector_sizes):
            setattr(self, name,
                    nn.Parameter(torch.abs(torch.randn(size, 1))))

    @property
    def weight_list(self):
        return [self.d0, self.f1, self.f2, self.f3,
                self.f4, self.f5, self.f6, self.f7]


class TorchRDM(nn.Module):
    """DepthEstimationNet live path (decoder 1), reference naming."""

    def __init__(self):
        super().__init__()
        self.encoder = Encoder()
        self.d_1 = Decoder1()
        self.weight_layer = WeightLayer()

    def forward(self, x, cp=None):
        """Returns dict of staged activations; ``cp`` is the reference's
        computations module (fusion-tail oracle)."""
        feats = self.encoder(x)
        decode, probs = self.d_1(feats)
        out = {"encoder": feats, "decode": decode, "probs": probs}
        if cp is None:
            return out
        b, _, h, w = decode.shape
        gm = cp.quick_gm(decode.view(b, h * w, 1), h)
        normed = decode / gm.expand(b, h * w).view(b, 1, h, w)
        comps = cp.decompose_depth_map([], normed, 3)[::-1]
        out["components"] = [c.clone() for c in comps]
        mats = cp.relative_fine_detail_matrix([comps], False)
        out["matrices"] = [m.clone() for m in mats]
        yhat = cp.make_pred(self.weight_layer.weight_list, mats, False, False)
        out["yhat"] = [y.clone() for y in yhat]
        out["final"] = cp.recombination(list(yhat), 7)
        return out


def randomize_batchnorm(model: nn.Module, seed: int = 0):
    """Give BN layers non-trivial running stats so eval-mode parity is a
    real test of the conversion, not of identity statistics."""
    g = torch.Generator().manual_seed(seed)
    for mod in model.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.5, generator=g)
            mod.running_var.uniform_(0.5, 1.5, generator=g)
            mod.weight.data.uniform_(0.5, 1.5, generator=g)
            mod.bias.data.normal_(0, 0.2, generator=g)


if __name__ == "__main__":
    torch.manual_seed(0)
    m = TorchRDM().eval()
    randomize_batchnorm(m)
    cp = import_reference_computations()
    with torch.no_grad():
        out = m(torch.rand(1, 3, 226, 226), cp=cp)
    for k, v in out.items():
        if isinstance(v, list):
            print(k, [tuple(t.shape) for t in v])
        else:
            print(k, tuple(v.shape))
