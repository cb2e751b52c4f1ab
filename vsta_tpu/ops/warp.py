"""Homography warp of per-view feature maps onto the BEV grid.

This replaces the reference's per-(batch, view) Python loop over
``kornia.warp_perspective`` / ``F.grid_sample``
(reference: project/models/fusion/geometry.py:120-162) with fully
vectorized, jittable ops in channels-last (NHWC) layout.

Three levels:

1. :func:`bilinear_sample` / :func:`warp_views` - XLA gather-based
   bilinear resampling, semantically identical to
   ``grid_sample(mode='bilinear', padding_mode='zeros',
   align_corners=False)`` at the reference's sample locations.

2. :func:`precompute_warp_lut` - because bilinear warping is a fixed
   linear map once calibration is known, each BEV cell reduces to 4
   (source index, weight) pairs per view. The LUT makes the warp a
   gather + weighted sum and is shared across the whole dataset
   (Wildtrack cameras are static).

3. :func:`fused_warp_proj` - the TPU-first rewrite of the reference's
   warp -> concat -> 1x1-conv pipeline (model_wrapper.py:68-73). Since
   the warp is linear in features and ConcatFusion + 1x1 conv is
   ``sum_v feat_v @ W_v + b``, we PROJECT per-view features first (a
   matmul over the small image-space map, MXU-friendly), then warp the
   projected maps and sum over views. Mathematically identical, but never
   materializes the [B, V, C, H_bev, W_bev] tensor (1.5 GB at the
   reference's full config) and warps bev_proj_ch channels instead of
   V * feat_dim.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Bilinear weighted sums are 4-term dots: keep them exact in f32
# regardless of the platform's default matmul precision.
_HI = jax.lax.Precision.HIGHEST


def _gather_weights_indices(
    coords: jax.Array, feat_hw: Tuple[int, int]
) -> Tuple[jax.Array, jax.Array]:
    """Bilinear neighbor indices and weights with zeros padding semantics.

    coords: (..., 2) float (x, y) pixel-index coordinates.
    Returns (idx, wts): idx (..., 4) int32 flat indices into [Hf*Wf]
    (clamped in-range), wts (..., 4) float32 with out-of-image neighbors
    getting weight 0 - exactly torch grid_sample zeros padding.
    """
    Hf, Wf = feat_hw
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0).astype(jnp.float32)
    dy = (y - y0).astype(jnp.float32)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(xi, yi, w):
        inb = (xi >= 0) & (xi < Wf) & (yi >= 0) & (yi < Hf)
        xi_c = jnp.clip(xi, 0, Wf - 1)
        yi_c = jnp.clip(yi, 0, Hf - 1)
        return yi_c * Wf + xi_c, w * inb.astype(jnp.float32)

    i00, w00 = corner(x0i, y0i, (1.0 - dx) * (1.0 - dy))
    i01, w01 = corner(x0i + 1, y0i, dx * (1.0 - dy))
    i10, w10 = corner(x0i, y0i + 1, (1.0 - dx) * dy)
    i11, w11 = corner(x0i + 1, y0i + 1, dx * dy)

    idx = jnp.stack([i00, i01, i10, i11], axis=-1)
    wts = jnp.stack([w00, w01, w10, w11], axis=-1)
    # Guard against non-finite sample coords (e.g. behind-camera points
    # projected through the horizon): zero their contribution entirely.
    finite = jnp.all(jnp.isfinite(coords), axis=-1, keepdims=True)
    wts = jnp.where(finite, wts, 0.0)
    idx = jnp.where(finite, idx, 0)
    return idx, wts


def bilinear_sample(feat: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinearly sample a single feature map at float pixel coords.

    feat: [Hf, Wf, C] (channels last); coords: (..., 2) as (x, y).
    Returns (..., C). Out-of-image samples read as zeros.
    """
    Hf, Wf, C = feat.shape
    idx, wts = _gather_weights_indices(coords, (Hf, Wf))
    flat = feat.reshape(Hf * Wf, C)
    vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(idx.shape + (C,))
    return jnp.einsum(
        "...k,...kc->...c", wts, vals.astype(wts.dtype), precision=_HI
    ).astype(feat.dtype)


def warp_views(feats: jax.Array, coords: jax.Array) -> jax.Array:
    """Warp per-view feature maps to BEV (unfused; parity surface).

    feats:  [B, V, Hf, Wf, C]
    coords: [B, V, Hb, Wb, 2] feature-space sample coordinates
            (from :func:`vsta_tpu.geometry.bev_sample_coords`).
    Returns [B, V, Hb, Wb, C] per-view BEV maps (reference geometry.py:80-163
    output, transposed to channels-last).
    """
    return jax.vmap(jax.vmap(bilinear_sample))(feats, coords)


def precompute_warp_lut(
    coords: jax.Array, feat_hw: Tuple[int, int]
) -> Tuple[jax.Array, jax.Array]:
    """Materialize the (index, weight) LUT of the fixed linear warp.

    coords: (..., Hb, Wb, 2). Returns idx (..., Hb, Wb, 4) int32 and
    wts (..., Hb, Wb, 4) float32. Static calibration => compute once,
    reuse every step (Fast-BEV-style LUT, built on device).
    """
    return _gather_weights_indices(coords, feat_hw)


def _warp_one_lut(feat_flat: jax.Array, idx: jax.Array, wts: jax.Array) -> jax.Array:
    """feat_flat [P, C], idx [..., 4], wts [..., 4] -> (..., C)."""
    vals = jnp.take(feat_flat, idx.reshape(-1), axis=0).reshape(idx.shape + (feat_flat.shape[-1],))
    return jnp.einsum("...k,...kc->...c", wts, vals.astype(wts.dtype), precision=_HI)


def warp_views_lut(feats: jax.Array, idx: jax.Array, wts: jax.Array) -> jax.Array:
    """LUT-based warp: feats [B,V,Hf,Wf,C], idx/wts [B,V,Hb,Wb,4] -> [B,V,Hb,Wb,C]."""
    B, V, Hf, Wf, C = feats.shape
    flat = feats.reshape(B, V, Hf * Wf, C)
    out = jax.vmap(jax.vmap(_warp_one_lut))(flat, idx, wts)
    return out.astype(feats.dtype)


def fused_warp_proj(
    feats: jax.Array,
    coords: jax.Array,
    proj_kernel: jax.Array,
    proj_bias: Optional[jax.Array] = None,
    *,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Project-then-warp fusion: warp(concat_v feats) @ W + b, restructured.

    feats:       [B, V, Hf, Wf, C]
    coords:      [B, V, Hb, Wb, 2]
    proj_kernel: [V, C, C_out] - the ConcatFusion 1x1-conv kernel reshaped
                 per view (reference model_wrapper.py:69-73).
    proj_bias:   [C_out] or None.
    Returns [B, Hb, Wb, C_out].

    Correctness: warp is linear with zeros padding, so
    ``sum_v warp(F_v) @ W_v == sum_v warp(F_v @ W_v)``; projecting first
    moves the matmul to the small image-space map and shrinks the warped
    channel count from V*C to C_out.
    """
    B, V, Hf, Wf, C = feats.shape
    # Per-view 1x1 projection in image space (MXU): [B,V,Hf,Wf,C_out].
    # bf16 under AMP rides the MXU fast path; full f32 otherwise.
    prec = None if compute_dtype == jnp.bfloat16 else _HI
    proj = jnp.einsum(
        "bvhwc,vco->bvhwo",
        feats.astype(compute_dtype),
        proj_kernel.astype(compute_dtype),
        precision=prec,
    )
    idx, wts = precompute_warp_lut(coords, (Hf, Wf))
    warped = warp_views_lut(proj, idx, wts)  # [B, V, Hb, Wb, C_out]
    out = jnp.sum(warped, axis=1)
    if proj_bias is not None:
        out = out + proj_bias.astype(out.dtype)
    return out
