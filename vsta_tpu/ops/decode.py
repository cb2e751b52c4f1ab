"""Static-shape, on-device detection decoding.

Replaces the reference's host-side decode - boolean ``torch.where``
thresholding plus a per-peak O(K^2) Python greedy NMS
(reference: project/models/heads/detector.py:64-125) - with:

  * 3x3 maxpool peak suppression via ``lax.reduce_window``;
  * a fixed-K ``top_k`` (static shapes under jit);
  * a vectorized greedy center-distance NMS as a ``lax.scan`` over the
    score-sorted candidates (identical keep-set to the reference's loop).

Everything returns padded arrays + validity masks; nothing forces a
device->host sync.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Bounds = Tuple[float, float, float, float]


def nms2d(heatmap: jax.Array, kernel: int = 3) -> jax.Array:
    """Keep only local maxima of a [..., H, W] heatmap (3x3 plateau-keeping),
    matching reference detector.py:64-69 (x * (x == maxpool(x)))."""
    pad = kernel // 2
    nd = heatmap.ndim
    window = (1,) * (nd - 2) + (kernel, kernel)
    strides = (1,) * nd
    padding = ((0, 0),) * (nd - 2) + (((pad, pad), (pad, pad)))
    pooled = jax.lax.reduce_window(
        heatmap, -jnp.inf, jax.lax.max, window, strides, padding
    )
    keep = (heatmap == pooled).astype(heatmap.dtype)
    return heatmap * keep


def greedy_distance_nms(
    centers: jax.Array, scores: jax.Array, valid: jax.Array, dist_thresh: float
) -> jax.Array:
    """Greedy suppression of candidates within dist_thresh of a kept one.

    centers: [K, 2] (score-descending order); scores: [K]; valid: [K] bool.
    Returns keep mask [K] bool. Equivalent to the reference's sequential
    loop (detector.py:108-122): iterate in score order, keep a candidate
    iff no already-kept center is strictly closer than dist_thresh.
    """
    K = centers.shape[0]
    d2 = jnp.sum((centers[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    close = d2 < (dist_thresh * dist_thresh)

    def body(keep, i):
        # suppressed if any kept earlier candidate is too close
        sup = jnp.any(keep & close[i])
        keep_i = valid[i] & ~sup
        keep = keep.at[i].set(keep_i)
        return keep, keep_i

    keep0 = jnp.zeros((K,), dtype=bool)
    keep, _ = jax.lax.scan(body, keep0, jnp.arange(K))
    return keep & valid


def decode_detections(
    heatmap: jax.Array,
    offset: jax.Array,
    size_cells: jax.Array,
    *,
    bounds: Bounds,
    conf_thresh: float = 0.4,
    nms_dist_m: float = 0.5,
    max_dets: int = 128,
) -> Dict[str, jax.Array]:
    """Decode CenterNet outputs to world-coordinate boxes (padded, masked).

    heatmap:    [B, H, W, 1] sigmoid scores.
    offset:     [B, H, W, 2] sub-cell offsets in [0, 1).
    size_cells: [B, H, W, 2] footprint sizes in cells.
    Returns dict: 'boxes' [B, K, 4] (cx, cy, w, h meters), 'scores' [B, K],
    'valid' [B, K] bool - score-descending, NMS-applied, zero-padded.

    Matches reference decode math (detector.py:71-125): peak cells above
    conf_thresh, center = cell + learned offset (NOT +0.5 - the offset
    head learns the half-cell), size = cells * resolution, greedy
    distance NMS at nms_dist_m.
    """
    B, H, W, _ = heatmap.shape
    x_min, x_max, y_min, y_max = bounds
    res_x = (x_max - x_min) / float(W)
    res_y = (y_max - y_min) / float(H)

    peaks = nms2d(heatmap[..., 0])  # [B, H, W]
    flat = peaks.reshape(B, H * W)
    k = min(max_dets, H * W)
    scores, idx = jax.lax.top_k(flat, k)  # sorted descending
    if k < max_dets:  # pad to static K
        padn = max_dets - k
        scores = jnp.pad(scores, ((0, 0), (0, padn)))
        idx = jnp.pad(idx, ((0, 0), (0, padn)))
    above = scores > conf_thresh

    xs = (idx % W).astype(jnp.float32)
    ys = (idx // W).astype(jnp.float32)

    off = offset.reshape(B, H * W, 2)
    sz = size_cells.reshape(B, H * W, 2)
    off_k = jnp.take_along_axis(off, idx[..., None], axis=1)
    sz_k = jnp.take_along_axis(sz, idx[..., None], axis=1)

    cx = x_min + (xs + off_k[..., 0]) * res_x
    cy = y_min + (ys + off_k[..., 1]) * res_y
    bw = sz_k[..., 0] * res_x
    bh = sz_k[..., 1] * res_y
    boxes = jnp.stack([cx, cy, bw, bh], axis=-1)  # [B, K, 4]

    centers = boxes[..., :2]
    keep = jax.vmap(greedy_distance_nms, in_axes=(0, 0, 0, None))(
        centers, scores, above, nms_dist_m
    )

    keepf = keep.astype(boxes.dtype)
    return {
        "boxes": boxes * keepf[..., None],
        "scores": scores * keepf,
        "valid": keep,
    }
