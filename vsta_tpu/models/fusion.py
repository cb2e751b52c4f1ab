"""Cross-view BEV fusion modules.

Reference surface (project/models/fusion/fusion.py:5-46): SimpleFusion
(sum/mean/max over the view axis), ConcatFusion (channel concat - the one
BEVNet actually uses), and an AttentionFusion that the reference only
stubs (it warns and falls back to mean, fusion.py:25-36). Here the
concat + 1x1-conv pipeline is algebraically fused into the warp
(:func:`vsta_tpu.ops.warp.fused_warp_proj`), and AttentionFusion is a
real implementation: per-cell content-based softmax gating over views
(visibility-aware - views that don't see a cell contribute zeros and are
masked out of the softmax).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class SimpleFusion(nn.Module):
    """sum/mean/max over the view axis: [B,V,H,W,C] -> [B,H,W,C]."""

    mode: str = "mean"

    @nn.compact
    def __call__(self, bev_views: jax.Array, valid: Optional[jax.Array] = None) -> jax.Array:
        if self.mode == "sum":
            return jnp.sum(bev_views, axis=1)
        if self.mode == "max":
            return jnp.max(bev_views, axis=1)
        if self.mode == "mean":
            return jnp.mean(bev_views, axis=1)
        raise ValueError(f"unknown SimpleFusion mode: {self.mode}")


class AttentionFusion(nn.Module):
    """Per-cell softmax view gating (the reference's declared-but-stubbed
    attention fusion, made real).

    Each view's warped BEV feature votes on its own relevance via a small
    projection; cells a view cannot see (all-zero features after zeros-
    padded warping) are masked out of the softmax using `coverage`.
    """

    hidden: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, bev_views: jax.Array, coverage: Optional[jax.Array] = None
    ) -> jax.Array:
        """bev_views: [B,V,H,W,C]; coverage: [B,V,H,W] in [0,1] or None."""
        x = bev_views.astype(self.dtype)
        s = nn.Dense(self.hidden, dtype=self.dtype)(x)
        s = nn.tanh(s)
        logits = nn.Dense(1, dtype=self.dtype)(s)[..., 0]  # [B,V,H,W]
        if coverage is not None:
            logits = jnp.where(coverage > 1e-6, logits, -1e9)
        w = jax.nn.softmax(logits, axis=1)
        return jnp.einsum("bvhw,bvhwc->bhwc", w, x)
