"""Detection losses (CenterNet-style), numerics matched to the reference.

Reference: project/models/model_wrapper.py:105-124 (weighted sum),
:235-247 (penalty-reduced focal loss), :302-308 (feature gather at GT
cells) - reimplemented as pure jnp over channels-last tensors.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def heatmap_focal_loss(
    pred_logits: jax.Array,
    gt: jax.Array,
    alpha: float = 2.0,
    beta: float = 4.0,
) -> jax.Array:
    """Penalty-reduced pixelwise focal loss, normalized by #positives.

    pred_logits, gt: [B, H, W, 1]. Positives are gt == 1 exactly; all other
    cells are beta-weighted negatives. Prediction clamped to
    [1e-4, 1 - 1e-4] as in the reference (model_wrapper.py:241).
    """
    pred = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    pred = jnp.clip(pred, 1e-4, 1.0 - 1e-4)
    gt = gt.astype(jnp.float32)

    pos_mask = (gt == 1.0).astype(jnp.float32)
    neg_mask = (gt < 1.0).astype(jnp.float32)
    neg_weights = jnp.power(1.0 - gt, beta)

    pos_loss = jnp.log(pred) * jnp.power(1.0 - pred, alpha) * pos_mask
    neg_loss = jnp.log(1.0 - pred) * jnp.power(pred, alpha) * neg_weights * neg_mask

    num_pos = jnp.maximum(jnp.sum(pos_mask), 1.0)
    return -(jnp.sum(pos_loss) + jnp.sum(neg_loss)) / num_pos


def gather_bev(feat: jax.Array, indices: jax.Array) -> jax.Array:
    """Gather channels-last BEV maps at flat cell indices.

    feat: [B, H, W, C]; indices: [B, K] int (gy * W + gx).
    Returns [B, K, C] (reference _gather_feat, model_wrapper.py:302-308).
    """
    B, H, W, C = feat.shape
    flat = feat.reshape(B, H * W, C)
    return jnp.take_along_axis(flat, indices[..., None], axis=1)


def masked_l1_loss(pred: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    """sum(|pred - target| * mask) / (sum(mask) + 1e-4), mask per-slot.

    pred/target: [B, K, C]; mask: [B, K]. The denominator counts slots
    (not slot*channel), matching the reference (model_wrapper.py:109-116).
    """
    m = mask[..., None].astype(jnp.float32)
    num = jnp.sum(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)) * m)
    den = jnp.sum(mask.astype(jnp.float32)) + 1e-4
    return num / den


def detection_loss(
    preds: Dict[str, jax.Array],
    targets: Dict[str, jax.Array],
    *,
    hm_alpha: float = 2.0,
    hm_beta: float = 4.0,
    hm_weight: float = 1.0,
    offset_weight: float = 1.0,
    size_weight: float = 0.1,
) -> Dict[str, jax.Array]:
    """Total detection loss (reference model_wrapper.py:105-124).

    preds: 'heatmap_logits' [B,H,W,1], 'offset' [B,H,W,2] (post-sigmoid),
           'size_raw' [B,H,W,2] (pre-exp).
    targets: from :func:`vsta_tpu.ops.splat.build_targets`.
    """
    hm_loss = heatmap_focal_loss(
        preds["heatmap_logits"], targets["heatmap"], hm_alpha, hm_beta
    )
    mask = targets["mask"]
    offset_pred = gather_bev(preds["offset"], targets["indices"])
    offset_loss = masked_l1_loss(offset_pred, targets["offset"], mask)
    size_pred = gather_bev(preds["size_raw"], targets["indices"])
    size_loss = masked_l1_loss(size_pred, targets["size_log"], mask)
    total = hm_weight * hm_loss + offset_weight * offset_loss + size_weight * size_loss
    return {
        "heatmap_loss": hm_loss,
        "offset_loss": offset_loss,
        "size_loss": size_loss,
        "total_loss": total,
    }
