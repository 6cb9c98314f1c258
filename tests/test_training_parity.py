"""Golden test of the training-step loss assembly wiring vs the reference.

Reconstructs module.py:64-97/119-143 with the reference's own pure-torch
pieces (network/computations.py + utils.depth2label_sid formula) as the
oracle and compares against md_rdm_tpu.training.module on the same inputs -
this pins the *wiring* (masking, decomposition targets, ordinal overwrite,
loss sum), complementing the per-op golden tests.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

ref_cp = pytest.importorskip("network.computations")
import loss as ref_loss

from md_rdm_tpu.core.config import SIDConfig
from md_rdm_tpu.losses import mse_loss, ordinal_loss
from md_rdm_tpu.ops.resize import resize_bicubic
from md_rdm_tpu.training.module import (
    compute_final_depth,
    compute_ordinal_target,
    mask_target,
)


def ref_normalize(batch):
    b, c, h, w = batch.size()
    gm = ref_cp.quick_gm(batch.reshape(b, h * w, 1), h)
    return torch.div(batch, gm.expand(b, h * w).view(b, 1, h, w))


def ref_depth2label_sid(depth, K=90.0, alpha=0.02, beta=10.0):
    label = K * torch.log(depth / alpha) / torch.log(
        torch.tensor(beta / alpha))
    return torch.max(label, torch.zeros_like(label)).int()


def ref_compute_final_depth(fine_detail_list, target, has_ordinal):
    component_target = ref_cp.decompose_depth_map(
        [], ref_normalize(target), 7)[::-1]
    if has_ordinal:
        ord_components = ref_cp.decompose_depth_map(
            [], ref_normalize(ref_depth2label_sid(
                ref_cp.resize(target, 8)).double()), 3)[::-1]
        component_target[0] = ord_components[0]
    components, loss = ref_cp.optimize_components(
        fine_detail_list, component_target, cuda=False)
    final = ref_cp.recombination(components)
    return final, loss


def test_full_training_loss_assembly_matches_reference():
    rng = np.random.default_rng(0)
    # raw GT with invalid pixels, as the loader would deliver
    y_raw = rng.uniform(0.5, 9.5, (2, 1, 226, 226)).astype(np.float32)
    y_raw[:, :, :10, :10] = 0.0
    # network outputs: 4 fine-detail slot maps (log space) + ordinal probs
    yhat_np = [rng.standard_normal((2, 1, 2 ** k, 2 ** k)).astype(np.float32)
               * 0.1 for k in range(4)]
    probs_np = rng.uniform(0.01, 0.99, (2, 90, 8, 8)).astype(np.float32)

    # ---- reference composition (torch) ----
    yt = ref_cp.resize(torch.from_numpy(y_raw), 128)
    gt = yt
    mask1 = yt > 0
    mask2 = (yt <= 0) + 1e-4
    yt = (gt * mask1) + mask2
    final_t, fine_t = ref_compute_final_depth(
        [torch.from_numpy(a).double() for a in yhat_np], yt,
        has_ordinal=True)
    ord_y_t = ref_depth2label_sid(ref_cp.resize(yt, 8))
    ord_l_t = ref_loss.Ordinal_Loss().calc(
        torch.from_numpy(probs_np), ord_y_t, cuda=False)
    mse_t = torch.nn.MSELoss()(final_t, yt)
    total_t = float(mse_t + fine_t + ord_l_t)

    # ---- ours (jax) ----
    yj = mask_target(resize_bicubic(jnp.asarray(y_raw), 128))
    sid = SIDConfig(0.02, 10.0, 90.0)
    final_j, fine_j = compute_final_depth(
        [jnp.asarray(a) for a in yhat_np], yj, True, sid)
    ord_y_j = compute_ordinal_target(yj, 8, sid)
    ord_l_j = ordinal_loss(jnp.asarray(probs_np), ord_y_j)
    mse_j = mse_loss(final_j, yj)
    total_j = float(mse_j + fine_j + ord_l_j)

    np.testing.assert_allclose(np.asarray(final_j),
                               final_t.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(fine_j), float(fine_t), rtol=1e-4)
    np.testing.assert_allclose(float(ord_l_j), float(ord_l_t), rtol=1e-4)
    np.testing.assert_allclose(total_j, total_t, rtol=1e-4)

    # the ordinal targets themselves must agree exactly (integer labels)
    np.testing.assert_array_equal(np.asarray(ord_y_j),
                                  ord_y_t.numpy().astype(np.float32))
