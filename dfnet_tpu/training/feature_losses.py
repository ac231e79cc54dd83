"""Stage-2/3 losses: pose MSE, cosine feature matching, and triplet
losses with in-triplet hard-negative mining.

Functional parity:
  - PoseLoss                 /root/reference/script/feature/direct_feature_matching.py:138-142
  - feature_loss (cosine)    direct_feature_matching.py:114-136
  - triplet variants         /root/reference/script/feature/misc.py:355-435
    (negatives are the batch rolled by one; the *_plus variant picks the
    anchor/negative arrangement with the smallest pairwise MSE among 4
    cases, computed without gradient)

Feature layout here is (L, B, H, W, C) (NHWC), vs the reference's
(L, B, C, H, W). torch.nn.TripletMarginLoss reduces the pairwise
distance over the LAST axis, which on the reference layout is the image
W axis; on NHWC the default here reduces over C instead — a per-pixel
feature distance (slightly more natural on this layout, comparable
margins). For numerical parity with the reference — e.g. when
fine-tuning a ported released checkpoint — pass axis=-2 (our W axis,
the reference's reduction axis); the stage-2 trainer selects it via
--triplet_ref_axis (auto-on for .pt-ported models).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pose_loss(pred, target):
    """MSE over flattened 12-dim poses."""
    return jnp.mean((pred - target) ** 2)


def feature_mse(f1, f2):
    return jnp.mean((f1 - f2) ** 2, dtype=jnp.float32)


def cosine_feature_loss(feature_rgb, feature_target, per_channel: bool = False):
    """1 - mean cosine similarity.

    Inputs (C, H*W)-like 2-D arrays (channels first, matching the
    reference's preprocess_features_for_loss output). per_channel=False
    (default, dim=1): similarity per channel across pixels; True
    (dim=0): per pixel across channels.
    """
    axis = 1 if not per_channel else 0
    eps = 1e-6
    num = jnp.sum(feature_rgb * feature_target, axis=axis,
                  dtype=jnp.float32)
    sq = lambda f: jnp.sqrt(jnp.sum(f * f, axis=axis, dtype=jnp.float32))
    den = jnp.maximum(sq(feature_rgb), eps) * jnp.maximum(
        sq(feature_target), eps)
    cos = num / den
    return 1.0 - jnp.mean(cos)


def masked_loss(criterion, f1, f2, valid_mask):
    """Loss restricted to a validity mask (reference misc.py:332-353):
    f1 is masked, an elementwise criterion is evaluated, and the result
    is mask-weighted-averaged. criterion: (a, b) → elementwise loss."""
    f1 = f1 * valid_mask
    loss = criterion(f1, f2)
    return jnp.sum(loss * valid_mask) / jnp.sum(valid_mask)


def _pairwise_distance(x, y, axis: int = -1, eps: float = 1e-6):
    """torch.nn.functional.pairwise_distance: L2 norm of (x-y+eps) over
    one axis (torch reduces the last; see module docstring for the
    layout mapping)."""
    return jnp.sqrt(jnp.sum((x - y + eps) ** 2, axis=axis,
                            dtype=jnp.float32))


def _triplet_margin(anchor, positive, negative, margin: float,
                    axis: int = -1):
    d_ap = _pairwise_distance(anchor, positive, axis)
    d_an = _pairwise_distance(anchor, negative, axis)
    return jnp.mean(jax.nn.relu(d_ap - d_an + margin))


def triplet_loss(f1, f2, margin: float = 1.0, axis: int = -1):
    """anchor=f1 (real), positive=f2 (render), negative=f2 rolled by one
    along the batch axis (axis=1 of (L,B,...))."""
    return _triplet_margin(f1, f2, jnp.roll(f2, 1, axis=1), margin, axis)


def triplet_loss_hard_negative_mining(f1, f2, margin: float = 1.0,
                                      axis: int = -1):
    anchor, positive = f1, f2
    anchor_neg = jnp.roll(f1, 1, axis=1)
    negative = jnp.roll(f2, 1, axis=1)
    case1 = jax.lax.stop_gradient(feature_mse(anchor, negative))
    case2 = jax.lax.stop_gradient(feature_mse(positive, anchor_neg))
    return jnp.where(
        case1 < case2,
        _triplet_margin(anchor, positive, negative, margin, axis),
        _triplet_margin(positive, anchor, anchor_neg, margin, axis))


def triplet_loss_hard_negative_mining_plus(f1, f2, margin: float = 1.0,
                                           axis: int = -1):
    """Four-case anchor swap (misc.py:399-435): pick the arrangement
    whose (no-grad) pairwise MSE is smallest."""
    anchor, positive = f1, f2
    anchor_neg = jnp.roll(f1, 1, axis=1)
    negative = jnp.roll(f2, 1, axis=1)
    cases = jnp.stack([
        jax.lax.stop_gradient(feature_mse(anchor, negative)),
        jax.lax.stop_gradient(feature_mse(positive, anchor_neg)),
        jax.lax.stop_gradient(feature_mse(anchor, anchor_neg)),
        jax.lax.stop_gradient(feature_mse(positive, negative)),
    ])
    which = jnp.argmin(cases)
    branches = [
        lambda _: _triplet_margin(anchor, positive, negative, margin, axis),
        lambda _: _triplet_margin(positive, anchor, anchor_neg, margin, axis),
        lambda _: _triplet_margin(anchor, positive, anchor_neg, margin, axis),
        lambda _: _triplet_margin(positive, anchor, negative, margin, axis),
    ]
    return jax.lax.switch(which, branches, None)
