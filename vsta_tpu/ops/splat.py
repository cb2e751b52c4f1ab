"""CenterNet training-target construction, fully vectorized and jittable.

Replaces the reference's per-object Python loop Gaussian splat
(reference: project/models/model_wrapper.py:126-300) with a
max-composited broadcast over padded object slots. Numerics are matched
to the reference exactly:

  * radius from the 3-case CenterNet IoU quadratic
    (model_wrapper.py:205-233 - the tensor variant, which divides r1 by 2
    and r2 by 2*a2; its scalar twin differs and is unused);
  * sigma = (2r + 1) / 6, Gaussian truncated to the Chebyshev-radius box
    (border clipping in the reference equals box truncation);
  * composition by elementwise max, so centers hit exactly 1.0 (the focal
    loss' pos_mask tests gt == 1).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Bounds = Tuple[float, float, float, float]


def gaussian_radius(
    width_cells: jax.Array,
    height_cells: jax.Array,
    min_overlap: float = 0.7,
    min_radius: int = 2,
) -> jax.Array:
    """CenterNet Gaussian radius (vectorized; int32 via floor)."""
    w = jnp.maximum(width_cells, 1.0)
    h = jnp.maximum(height_cells, 1.0)

    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1 * b1 - 4.0 * c1, 0.0))
    r1 = (b1 + sq1) / 2.0

    a2 = 4.0
    b2 = 2.0 * (h + w)
    c2 = (1 - min_overlap) * w * h
    sq2 = jnp.sqrt(jnp.maximum(b2 * b2 - 4.0 * a2 * c2, 0.0))
    r2 = (b2 + sq2) / (2.0 * a2)

    if min_overlap == 0:
        r3 = jnp.full_like(w, jnp.inf)
    else:
        a3 = 4.0 * min_overlap
        b3 = -2.0 * min_overlap * (h + w)
        c3 = (min_overlap - 1.0) * w * h
        sq3 = jnp.sqrt(jnp.maximum(b3 * b3 - 4.0 * a3 * c3, 0.0))
        r3 = (b3 + sq3) / (2.0 * a3)

    radius = jnp.minimum(jnp.minimum(r1, r2), r3)
    radius = jnp.maximum(radius, float(min_radius))
    return jnp.floor(radius).astype(jnp.int32)


def draw_gaussians(
    centers_xy: jax.Array,
    radii: jax.Array,
    valid: jax.Array,
    bev_hw: Tuple[int, int],
) -> jax.Array:
    """Max-composite truncated Gaussians onto a BEV heatmap.

    centers_xy: [N, 2] int cell coords (gx, gy); radii: [N] int;
    valid: [N] bool. Returns [H, W] float32.
    """
    H, W = bev_hw
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)

    gx = centers_xy[:, 0][:, None, None]
    gy = centers_xy[:, 1][:, None, None]
    r = radii[:, None, None]
    dx = xs[None] - gx
    dy = ys[None] - gy
    sigma = (2.0 * r.astype(jnp.float32) + 1.0) / 6.0
    g = jnp.exp(-(dx.astype(jnp.float32) ** 2 + dy.astype(jnp.float32) ** 2) / (2.0 * sigma * sigma))
    inside = (jnp.abs(dx) <= r) & (jnp.abs(dy) <= r) & (r > 0)
    ok = valid[:, None, None] & inside
    g = jnp.where(ok, g, 0.0)
    return jnp.max(g, axis=0) if centers_xy.shape[0] > 0 else jnp.zeros((H, W), jnp.float32)


def build_targets(
    boxes_world: jax.Array,
    num_boxes: jax.Array,
    *,
    bounds: Bounds,
    bev_hw: Tuple[int, int],
    min_overlap: float = 0.7,
    min_radius: int = 2,
) -> Dict[str, jax.Array]:
    """Build heatmap/offset/size/index targets from padded world boxes.

    boxes_world: [B, N, 4] (cx, cy, w, h) in meters, padded; num_boxes: [B].
    Returns dict with 'heatmap' [B,H,W,1], 'indices' [B,N] int32 (flat
    gy*W+gx), 'mask' [B,N], 'offset' [B,N,2], 'size_log' [B,N,2].

    Follows reference model_wrapper.py:126-203: objects outside BEV bounds
    are dropped (masked here rather than compacted - the loss is
    mask-weighted so slot order is irrelevant), sub-cell offsets are the
    fractional part of the cell coordinate, sizes regress log(cells).
    """
    B, N, _ = boxes_world.shape
    H, W = bev_hw
    x_min, x_max, y_min, y_max = bounds
    res_x = (x_max - x_min) / float(W)
    res_y = (y_max - y_min) / float(H)

    slot = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    in_count = slot < num_boxes[:, None]

    cx = boxes_world[..., 0]
    cy = boxes_world[..., 1]
    bw = boxes_world[..., 2]
    bh = boxes_world[..., 3]

    # normalize-then-scale instead of divide-by-f32-resolution: for the
    # (symmetric) flagship bounds, on-boundary points like (0, 0) land on
    # exact integer cell indices in float32 ((c-min)/range is exactly 0.5).
    rel_x = (cx - x_min) / (x_max - x_min) * float(W)
    rel_y = (cy - y_min) / (y_max - y_min) * float(H)
    in_bev = (rel_x >= 0) & (rel_x < W) & (rel_y >= 0) & (rel_y < H)
    valid = in_count & in_bev

    gx = jnp.floor(rel_x)
    gy = jnp.floor(rel_y)
    offset = jnp.stack([rel_x - gx, rel_y - gy], axis=-1)

    size_w_cells = jnp.maximum(bw / res_x, 1e-3)
    size_h_cells = jnp.maximum(bh / res_y, 1e-3)
    size_log = jnp.stack([jnp.log(size_w_cells), jnp.log(size_h_cells)], axis=-1)

    radii = gaussian_radius(size_w_cells, size_h_cells, min_overlap, min_radius)

    gxi = jnp.clip(gx.astype(jnp.int32), 0, W - 1)
    gyi = jnp.clip(gy.astype(jnp.int32), 0, H - 1)
    indices = gyi * W + gxi

    centers = jnp.stack([gxi, gyi], axis=-1)  # [B, N, 2]
    hm = jax.vmap(lambda c, r, v: draw_gaussians(c, r, v, (H, W)))(centers, radii, valid)

    maskf = valid.astype(jnp.float32)
    return {
        "heatmap": hm[..., None],  # [B, H, W, 1] channels-last
        "indices": jnp.where(valid, indices, 0),
        "mask": maskf,
        "offset": offset * maskf[..., None],
        "size_log": size_log * maskf[..., None],
    }
