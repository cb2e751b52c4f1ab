import numpy as np
import jax
import jax.numpy as jnp

from vsta_tpu.ops.losses import (
    heatmap_focal_loss,
    gather_bev,
    masked_l1_loss,
    detection_loss,
)
from vsta_tpu.ops.splat import build_targets

BOUNDS = (-24.0, 24.0, -7.2, 7.2)


def _focal_oracle(logits, gt, alpha=2.0, beta=4.0):
    """Reference _heatmap_focal_loss (model_wrapper.py:235-247) in numpy."""
    pred = 1.0 / (1.0 + np.exp(-logits))
    pred = np.clip(pred, 1e-4, 1 - 1e-4)
    pos = (gt == 1.0).astype(np.float64)
    neg = (gt < 1.0).astype(np.float64)
    negw = (1 - gt) ** beta
    pos_loss = np.log(pred) * (1 - pred) ** alpha * pos
    neg_loss = np.log(1 - pred) * pred**alpha * negw * neg
    num_pos = max(pos.sum(), 1.0)
    return -(pos_loss.sum() + neg_loss.sum()) / num_pos


def test_focal_loss_matches_oracle(rng):
    logits = rng.standard_normal((2, 16, 24, 1)).astype(np.float32)
    gt = np.zeros((2, 16, 24, 1), np.float32)
    gt[0, 4, 5, 0] = 1.0
    gt[0, 4, 6, 0] = 0.6
    gt[1, 10, 10, 0] = 1.0
    ours = float(heatmap_focal_loss(jnp.array(logits), jnp.array(gt)))
    oracle = _focal_oracle(logits.astype(np.float64), gt.astype(np.float64))
    np.testing.assert_allclose(ours, oracle, rtol=1e-4)


def test_focal_loss_no_positives_uses_denominator_one(rng):
    logits = rng.standard_normal((1, 8, 8, 1)).astype(np.float32)
    gt = np.zeros((1, 8, 8, 1), np.float32)
    ours = float(heatmap_focal_loss(jnp.array(logits), jnp.array(gt)))
    oracle = _focal_oracle(logits.astype(np.float64), gt.astype(np.float64))
    np.testing.assert_allclose(ours, oracle, rtol=1e-4)


def test_gather_bev(rng):
    feat = rng.standard_normal((2, 4, 6, 3)).astype(np.float32)
    indices = np.array([[5, 0], [23, 7]])
    out = np.asarray(gather_bev(jnp.array(feat), jnp.array(indices)))
    flat = feat.reshape(2, 24, 3)
    for b in range(2):
        for k in range(2):
            np.testing.assert_allclose(out[b, k], flat[b, indices[b, k]])


def test_masked_l1_denominator_counts_slots(rng):
    pred = rng.standard_normal((1, 4, 2)).astype(np.float32)
    tgt = rng.standard_normal((1, 4, 2)).astype(np.float32)
    mask = np.array([[1.0, 1.0, 0.0, 0.0]], np.float32)
    ours = float(masked_l1_loss(jnp.array(pred), jnp.array(tgt), jnp.array(mask)))
    expected = np.abs(pred[0, :2] - tgt[0, :2]).sum() / (2.0 + 1e-4)
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_detection_loss_gradients_flow(rng):
    B, H, W = 1, 24, 48
    boxes = np.zeros((B, 4, 4), np.float32)
    boxes[0, 0] = [0.0, 0.0, 0.6, 0.6]
    targets = build_targets(
        jnp.array(boxes), jnp.array([1]), bounds=BOUNDS, bev_hw=(H, W)
    )

    def loss_fn(params):
        preds = {
            "heatmap_logits": params["hm"],
            "offset": jax.nn.sigmoid(params["off"]),
            "size_raw": params["sz"],
        }
        return detection_loss(preds, targets)["total_loss"]

    params = {
        "hm": jnp.array(rng.standard_normal((B, H, W, 1)).astype(np.float32)),
        "off": jnp.array(rng.standard_normal((B, H, W, 2)).astype(np.float32)),
        "sz": jnp.array(rng.standard_normal((B, H, W, 2)).astype(np.float32)),
    }
    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    for g in jax.tree.leaves(grads):
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.abs(g).max()) > 0.0
