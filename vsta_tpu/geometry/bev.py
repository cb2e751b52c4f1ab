"""BEV grid construction and meters<->cells conversion.

Conventions (identical to the reference's grid_sample warp path, which is
its canonical one - project/models/fusion/geometry.py:24-31, 142-162 and
project/utils/geometry.py:5-22):
  * BEV cell (iy, ix) has its center at
      x = x_min + (ix + 0.5) * res_x,  y = y_min + (iy + 0.5) * res_y
  * feature-space sample coordinate for torch
    ``grid_sample(align_corners=False)`` with the reference's
    ``(x + 0.5)/W * 2 - 1`` normalization reduces EXACTLY to bilinear
    sampling at floating pixel index ``x`` with zeros padding - so we
    sample the feature map directly at ``u * Wf / W_img``.

Note: the reference's preferred kornia path samples cell *corners*
instead of centers (geometry.py:129-133 builds the dst grid from integer
pixel indices); its grid_sample fallback uses centers. We standardize on
centers and document the half-cell divergence from the kornia path.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .homography import compute_homography, project_points

Bounds = Tuple[float, float, float, float]  # (x_min, x_max, y_min, y_max)


def ground_grid(bev_h: int, bev_w: int, bounds: Bounds) -> jax.Array:
    """Homogeneous world coordinates of BEV cell centers: [H, W, 3]."""
    x_min, x_max, y_min, y_max = bounds
    res_x = (x_max - x_min) / bev_w
    res_y = (y_max - y_min) / bev_h
    xs = jnp.linspace(x_min + 0.5 * res_x, x_max - 0.5 * res_x, bev_w)
    ys = jnp.linspace(y_min + 0.5 * res_y, y_max - 0.5 * res_y, bev_h)
    xx, yy = jnp.meshgrid(xs, ys, indexing="xy")  # [H, W] each
    return jnp.stack([xx, yy, jnp.ones_like(xx)], axis=-1).astype(jnp.float32)


def meters_to_bev_indices(xy: jax.Array, bounds: Bounds, bev_size: Tuple[int, int]) -> jax.Array:
    """World meters -> fractional BEV cell indices, clamped to the grid.

    xy: (..., 2). Returns (..., 2) as (ix, iy). Matches reference
    utils/geometry.py:5-14 (clamp to [0, W-1] / [0, H-1]).
    """
    x_min, x_max, y_min, y_max = bounds
    H, W = bev_size
    res_x = (x_max - x_min) / float(W)
    res_y = (y_max - y_min) / float(H)
    ix = jnp.clip((xy[..., 0] - x_min) / res_x, 0.0, W - 1)
    iy = jnp.clip((xy[..., 1] - y_min) / res_y, 0.0, H - 1)
    return jnp.stack([ix, iy], axis=-1)


def bev_indices_to_meters(idx: jax.Array, bounds: Bounds, bev_size: Tuple[int, int]) -> jax.Array:
    """BEV cell indices -> world meters at cell centers (ref utils/geometry.py:16-22)."""
    x_min, x_max, y_min, y_max = bounds
    H, W = bev_size
    res_x = (x_max - x_min) / float(W)
    res_y = (y_max - y_min) / float(H)
    x = x_min + (idx[..., 0] + 0.5) * res_x
    y = y_min + (idx[..., 1] + 0.5) * res_y
    return jnp.stack([x, y], axis=-1)


def bev_sample_coords(
    K: jax.Array,
    Rt: jax.Array,
    img_size: Tuple[int, int],
    feat_size: Tuple[int, int],
    grid: jax.Array,
) -> jax.Array:
    """Feature-space sampling coordinates for every BEV cell.

    K:    (..., 3, 3); Rt: (..., 4, 4) - any leading batch dims (e.g. [B, V]).
    grid: [Hbev, Wbev, 3] homogeneous ground points (from :func:`ground_grid`).
    Returns: (..., Hbev, Wbev, 2) float (x_feat, y_feat) pixel-index coords.

    Out-of-image samples are NOT masked here - the bilinear sampler applies
    zeros padding, reproducing ``grid_sample(padding_mode='zeros')``.
    Reference math: geometry.py:142-158.
    """
    H_img, W_img = img_size
    Hf, Wf = feat_size
    Hb, Wb = grid.shape[0], grid.shape[1]
    H_w2i = compute_homography(K, Rt)
    pts = grid.reshape(-1, 3)
    uv, _w = project_points(H_w2i, pts)  # (..., N, 2) pixel coords
    scale = jnp.array([Wf / float(W_img), Hf / float(H_img)], dtype=uv.dtype)
    feat_xy = uv * scale
    return feat_xy.reshape(H_w2i.shape[:-2] + (Hb, Wb, 2))


def bev_sample_coords_with_depth(
    K: jax.Array,
    Rt: jax.Array,
    img_size: Tuple[int, int],
    feat_size: Tuple[int, int],
    grid: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Like :func:`bev_sample_coords`, additionally returning the
    homogeneous scale w per cell ((..., Hbev, Wbev)).

    w > 0 means the ground point is in FRONT of the camera; w <= 0 means
    behind (the dehomogenized uv is then a mirrored phantom). The plain
    warp keeps the reference's unmasked semantics (geometry.py:142-162
    also doesn't test the sign); new model families (deformable fusion)
    use w to exclude behind-camera views from attention.
    """
    H_img, W_img = img_size
    Hf, Wf = feat_size
    Hb, Wb = grid.shape[0], grid.shape[1]
    H_w2i = compute_homography(K, Rt)
    pts = grid.reshape(-1, 3)
    uv, w = project_points(H_w2i, pts)
    scale = jnp.array([Wf / float(W_img), Hf / float(H_img)], dtype=uv.dtype)
    feat_xy = (uv * scale).reshape(H_w2i.shape[:-2] + (Hb, Wb, 2))
    return feat_xy, w.reshape(H_w2i.shape[:-2] + (Hb, Wb))
