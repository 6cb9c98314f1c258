"""Activation parity through the torch->flax weight converter.

Builds small torch modules with reference naming, converts their
state_dicts with tools/convert_torch_checkpoint.py, and compares
activations against the flax modules - the per-stage parity harness of
SURVEY.md section 7 step 4 (torchvision itself is unavailable, so the
torch side mirrors its documented semantics).
"""
import sys
from pathlib import Path

import numpy as np
import torch
import torch.nn as nn

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from convert_torch_checkpoint import convert_state_dict

from md_rdm_tpu.models.densenet import DenseBlock, DenseLayer, Transition
from md_rdm_tpu.models.wsm import WSMLayer


class TorchDenseLayer(nn.Module):
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


def _randomize_bn(m):
    for mod in m.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.5)
            mod.running_var.uniform_(0.5, 1.5)
            mod.weight.data.uniform_(0.5, 1.5)
            mod.bias.data.normal_(0, 0.2)


def test_dense_layer_activation_parity():
    torch.manual_seed(0)
    tl = TorchDenseLayer(16, 2, 8).eval()
    _randomize_bn(tl)
    sd = {f"denselayer1.{k}": v for k, v in tl.state_dict().items()}
    params, stats = convert_state_dict(sd)

    x = torch.randn(2, 16, 10, 10)
    with torch.no_grad():
        want = tl(x).numpy()

    fl = DenseLayer(2, 8)
    out = fl.apply(
        {"params": params["denselayer1"],
         "batch_stats": stats["denselayer1"]},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False)
    got = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TorchDenseBlock(nn.Module):
    def __init__(self, layers, in_ch, bn_size, growth):
        super().__init__()
        for i in range(layers):
            self.add_module(f"denselayer{i+1}",
                            TorchDenseLayer(in_ch + i * growth, bn_size,
                                            growth))

    def forward(self, x):
        for layer in self.children():
            x = torch.cat([x, layer(x)], 1)
        return x


def test_dense_block_activation_parity():
    torch.manual_seed(1)
    tb = TorchDenseBlock(3, 8, 2, 4).eval()
    _randomize_bn(tb)
    sd = {f"blk.{k}": v for k, v in tb.state_dict().items()}
    params, stats = convert_state_dict(sd)

    x = torch.randn(1, 8, 6, 6)
    with torch.no_grad():
        want = tb(x).numpy()
    fl = DenseBlock(3, 2, 4)
    out = fl.apply({"params": params["blk"], "batch_stats": stats["blk"]},
                   jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False)
    got = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TorchTransition(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.norm = nn.BatchNorm2d(in_ch)
        self.conv = nn.Conv2d(in_ch, out_ch, 1, bias=False)
        self.pool = nn.AvgPool2d(2, 2)

    def forward(self, x):
        return self.pool(self.conv(torch.relu(self.norm(x))))


def test_transition_activation_parity():
    torch.manual_seed(2)
    tt = TorchTransition(8, 4).eval()
    _randomize_bn(tt)
    sd = {f"trans.{k}": v for k, v in tt.state_dict().items()}
    params, stats = convert_state_dict(sd)
    x = torch.randn(2, 8, 8, 8)
    with torch.no_grad():
        want = tt(x).numpy()
    fl = Transition(4)
    out = fl.apply({"params": params["trans"],
                    "batch_stats": stats["trans"]},
                   jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False)
    got = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TorchWSM(nn.Module):
    """Reference WSMLayer structure (RDM_Net.py:163-236) at toy size."""

    def __init__(self, c, size, raw):
        super().__init__()
        k_in, w_in = c // 4, c // 8
        self.deconv1 = nn.Sequential(nn.ConvTranspose2d(c, c, 2, 2))
        self.conv1_1 = nn.Conv2d(c, k_in, 1)
        self.conv1_2 = nn.Conv2d(c, k_in, 1)
        self.conv1_3 = nn.Conv2d(c, k_in, 1)
        self.conv1_4 = nn.Conv2d(c, w_in, 1)
        self.conv1_5 = nn.Conv2d(c, w_in, 1)
        self.conv2_1 = nn.Conv2d(k_in, k_in, 3, padding=1)
        self.conv2_2 = nn.Conv2d(k_in, k_in, 5, padding=2)
        self.wsm_wx3 = nn.Sequential(
            nn.ZeroPad2d((0, 0, 1, 1)), nn.Conv2d(w_in, w_in, (3, size),
                                                  (1, size)))
        self.wsm_3xh = nn.Sequential(
            nn.ZeroPad2d((1, 1, 0, 0)), nn.Conv2d(w_in, w_in, (size, 3),
                                                  (size, 1)))
        self.input_adjustment_layer = nn.Conv2d(raw, c, 1)

    def forward(self, x):
        x = self.input_adjustment_layer(x)
        up = self.deconv1(x)
        o11 = self.conv1_1(up)
        o21 = self.conv2_1(self.conv1_2(up))
        o22 = self.conv2_2(self.conv1_3(up))
        col = self.wsm_wx3(self.conv1_4(up))
        row = self.wsm_3xh(self.conv1_5(up))
        ch = col.repeat(1, 1, 1, col.shape[2])
        cv = row.repeat(1, 1, row.shape[3], 1)
        return torch.cat((o11, o21, o22, cv, ch), 1)


def test_wsm_layer_activation_parity():
    torch.manual_seed(3)
    c, size, raw = 16, 8, 24
    tw = TorchWSM(c, size, raw).eval()
    sd = {f"WSM_1.{k}": v for k, v in tw.state_dict().items()}
    params, stats = convert_state_dict(sd)
    x = torch.randn(1, raw, size // 2, size // 2)
    with torch.no_grad():
        want = tw(x).numpy()
    fl = WSMLayer(c, size)
    out = fl.apply({"params": params["WSM_1"]},
                   jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    got = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
