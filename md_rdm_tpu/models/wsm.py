"""Whole-strip-masking (WSM) upsampling layer (RDM_Net.py:163-236,493-513).

Each WSM layer doubles spatial resolution and mixes five branches:

  input-adjust 1x1 conv -> deconv(k2,s2) x2 upsample, then
  * 1x1 conv (C/4)
  * 1x1 -> 3x3 conv (C/4)
  * 1x1 -> 5x5 conv (C/4)
  * 1x1 -> vertical whole-strip conv (3 x W kernel -> one column, C/8)
  * 1x1 -> horizontal whole-strip conv (H x 3 kernel -> one row, C/8)

The strip outputs are broadcast back to the full map (``repeat`` in the
reference) and everything concatenates to C channels at 2x resolution.

The whole-strip convolutions compress an entire row/column extent into one
strip - the reference expresses them as huge-kernel Conv2d with stride=W.
On TPU a (3, W) kernel conv with stride W is a poor MXU fit; but since the
stride equals the input width there is exactly one output column, so the op
is mathematically a contraction of the (padded) 3-row window over the full
width: out[h] = sum_{dh, w, c_in} W[dh, w, c_in, c_out] * x[h+dh-1, w, c_in].
We keep ``lax.conv_general_dilated`` which XLA lowers to exactly that single
contraction (no sliding) - fine at these tiny sizes.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class WSMLayer(nn.Module):
    """One WSM cascade stage: in_channels at SxS -> in_channels at 2Sx2S.

    The incoming channel count (2208 for the first stage, 2*in_channels
    after - RDM_Net.py:194-200) is inferred by the 1x1 input adjustment;
    it needs no explicit field.
    """

    in_channels: int
    strip_size: int      # spatial size after the deconv (= kernel_size arg)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.in_channels
        kernel_in, wsm_in = c // 4, c // 8
        x = nn.Conv(c, (1, 1), dtype=self.dtype,
                    name="input_adjustment_layer")(x)
        up = nn.ConvTranspose(c, (2, 2), strides=(2, 2), dtype=self.dtype,
                              name="deconv1")(x)

        out1_1 = nn.Conv(kernel_in, (1, 1), dtype=self.dtype, name="conv1_1")(up)
        out1_2 = nn.Conv(kernel_in, (1, 1), dtype=self.dtype, name="conv1_2")(up)
        out1_3 = nn.Conv(kernel_in, (1, 1), dtype=self.dtype, name="conv1_3")(up)
        out1_4 = nn.Conv(wsm_in, (1, 1), dtype=self.dtype, name="conv1_4")(up)
        out1_5 = nn.Conv(wsm_in, (1, 1), dtype=self.dtype, name="conv1_5")(up)

        out2_1 = nn.Conv(kernel_in, (3, 3), padding=1, dtype=self.dtype,
                         name="conv2_1")(out1_2)
        out2_2 = nn.Conv(kernel_in, (5, 5), padding=2, dtype=self.dtype,
                         name="conv2_2")(out1_3)

        s = self.strip_size
        # vertical strip: ZeroPad H by (1,1), conv kernel (3, s) stride (1, s)
        # -> (H, 1) column (RDM_Net.py:493-502)
        col = nn.Conv(wsm_in, (3, s), strides=(1, s),
                      padding=((1, 1), (0, 0)), dtype=self.dtype,
                      name="wsm_wx3")(out1_4)
        # horizontal strip: ZeroPad W by (1,1), kernel (s, 3) stride (s, 1)
        # -> (1, W) row (RDM_Net.py:504-513)
        row = nn.Conv(wsm_in, (s, 3), strides=(s, 1),
                      padding=((0, 0), (1, 1)), dtype=self.dtype,
                      name="wsm_3xh")(out1_5)

        # broadcast strips back to full maps (repeat, RDM_Net.py:223-224):
        # the reference names the column output "completion_horizontal" and
        # tiles it along W; the row output tiles along H.
        completion_horizontal = jnp.tile(col, (1, 1, s, 1))
        completion_vertical = jnp.tile(row, (1, s, 1, 1))

        return jnp.concatenate(
            [out1_1, out2_1, out2_2, completion_vertical,
             completion_horizontal], axis=-1)


# Cascade table (RDM_Net.py:536-553): WSM_1(1664,16) .. WSM_4(208,128).
WSM_STAGES = ((1664, 16), (832, 32), (416, 64), (208, 128))


class WSMCascade(nn.Module):
    """num_layers stacked WSM stages; empty cascade is identity
    (RDM_Net.py:543-553)."""

    num_layers: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            ch, size = WSM_STAGES[i]
            x = WSMLayer(ch, size, dtype=self.dtype,
                         name=f"WSM_{i + 1}")(x)
        return x


def wsm_output_planes(decoder_id: int) -> int:
    """Channels after the cascade, by decoder id (RDM_Net.py:555-567)."""
    return {1: 2208, 6: 2208, 7: 1664, 8: 832, 9: 416, 10: 208}.get(
        decoder_id, 1)
