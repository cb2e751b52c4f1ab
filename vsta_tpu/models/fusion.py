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


class DeformableFusion(nn.Module):
    """Multi-view deformable cross-attention onto the BEV grid
    (MVDeTr-style; the reference only declares this capability -
    project/models/fusion/fusion.py:25-36 warns and falls back to mean).

    Each BEV cell is a query. Its reference point in view v is the
    projection of the cell's ground point into v's feature map
    (`coords`). The query predicts, per attention head, `points` 2D
    sampling offsets and attention logits per (view, point); values are
    bilinearly sampled from per-view image-space feature maps at
    refpoint + offset and combined with a softmax over (view, point) -
    deformable attention in the Deformable-DETR sense, with the view
    axis playing the role of the multi-scale axis.

    TPU notes: sampling reuses the gather-based bilinear sampler (no
    dynamic shapes; out-of-image taps read zeros), the softmax is masked
    by per-view validity (in-image AND in-front-of-camera, via `depth_w`),
    and everything is one fused XLA program - no per-view Python loop.
    """

    heads: int = 4
    points: int = 4
    out_ch: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: jax.Array,
        coords: jax.Array,
        query: jax.Array,
        depth_w: Optional[jax.Array] = None,
    ) -> jax.Array:
        """feats [B,V,Hf,Wf,C]; coords [B,V,Hb,Wb,2] (feature px);
        query [B,Hb,Wb,Cq]; depth_w [B,V,Hb,Wb] homogeneous scale (>0 =
        in front of camera) or None. Returns [B,Hb,Wb,out_ch]."""
        from ..ops.warp import bilinear_sample

        B, V, Hf, Wf, C = feats.shape
        Hb, Wb = query.shape[1], query.shape[2]
        M, P = self.heads, self.points
        assert self.out_ch % M == 0, "out_ch must divide by heads"
        hc = self.out_ch // M

        # Per-view value projection, image space (one big MXU matmul).
        values = nn.Dense(self.out_ch, dtype=self.dtype, name="value")(
            feats.astype(self.dtype)
        )  # [B,V,Hf,Wf,M*hc]
        values = values.reshape(B, V, Hf, Wf, M, hc)

        q = query.astype(self.dtype)
        # Offset head: zero kernel + ring-pattern bias (Deformable-DETR
        # init) so training starts from a stable local neighborhood.
        ring = _ring_offset_init(M, P)  # [M,P,2]
        off_bias = jnp.tile(ring.reshape(1, M, P, 2), (V, 1, 1, 1)).reshape(-1)
        offsets = nn.Dense(
            V * M * P * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: off_bias.astype(dtype),
            dtype=self.dtype,
            name="offsets",
        )(q).reshape(B, Hb, Wb, V, M, P, 2)
        logits = nn.Dense(
            V * M * P,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="attn",
        )(q).reshape(B, Hb, Wb, V, M, P)

        # Sampling locations: refpoint + offset, in feature pixels.
        base = jnp.transpose(coords, (0, 2, 3, 1, 4))  # [B,Hb,Wb,V,2]
        loc = base[:, :, :, :, None, None, :] + offsets.astype(
            base.dtype
        )  # [B,Hb,Wb,V,M,P,2]

        # Validity: base refpoint finite, inside the feature map, and in
        # front of the camera.
        finite = jnp.all(jnp.isfinite(base), axis=-1)  # [B,Hb,Wb,V]
        inimg = (
            (base[..., 0] >= -1.0)
            & (base[..., 0] <= Wf)
            & (base[..., 1] >= -1.0)
            & (base[..., 1] <= Hf)
        )
        valid = finite & inimg
        if depth_w is not None:
            infront = jnp.transpose(depth_w, (0, 2, 3, 1)) > 1e-6
            valid = valid & infront
        any_valid = jnp.any(valid, axis=-1)  # [B,Hb,Wb]

        # Masked softmax over (view, point) per head.
        neg = jnp.asarray(-1e9, logits.dtype)
        logits = jnp.where(valid[:, :, :, :, None, None], logits, neg)
        flat = logits.transpose(0, 1, 2, 4, 3, 5).reshape(B, Hb, Wb, M, V * P)
        attn = jax.nn.softmax(flat, axis=-1).reshape(B, Hb, Wb, M, V, P)

        # Bilinear-sample values per (view, head, point) through the
        # fast-VJP primitive (windowed Pallas scatter backward on TPU),
        # with the attention weights FOLDED into the bilinear tap weights
        # (sampling is linear in the weights, so this is exact): the
        # (view, point) weighting einsum disappears - its forward is a
        # free multiply inside the kernel's one-hot build and its
        # backward rides the kernel's exact d_wts instead of a [G,S,hc]
        # einsum cotangent. Measured A/B vs the unfused einsum at batch 8
        # (docs/PERFORMANCE.md "Deformable"): fwd 27.7 vs 28.1 ms,
        # fwd+bwd 58.2 vs 60.2 ms - a real but small ~2 ms win; XLA
        # already fuses most of the weighting it removes.
        loc_s = jnp.transpose(loc, (0, 3, 4, 1, 2, 5, 6))  # [B,V,M,Hb,Wb,P,2]
        vals_s = jnp.transpose(values, (0, 1, 4, 2, 3, 5))  # [B,V,M,Hf,Wf,hc]
        attn_s = jnp.transpose(attn, (0, 4, 3, 1, 2, 5))  # [B,V,M,Hb,Wb,P]
        from ..ops.warp import sample_bilinear_many_scaled

        G = B * V * M
        weighted = sample_bilinear_many_scaled(
            vals_s.reshape(G, Hf, Wf, hc),
            loc_s.reshape(G, Hb * Wb * P, 2),
            attn_s.reshape(G, Hb * Wb * P),
        ).reshape(B, V, M, Hb, Wb, P, hc)
        # sum over (view, point): the softmax already normalized over both
        per_head = jnp.sum(
            weighted.astype(self.dtype), axis=(1, 5)
        )  # [B,M,Hb,Wb,hc]
        fused = jnp.transpose(per_head, (0, 2, 3, 1, 4)).reshape(B, Hb, Wb, M * hc)
        fused = fused * any_valid[..., None].astype(fused.dtype)
        out = nn.Dense(self.out_ch, dtype=self.dtype, name="out")(fused)
        return out


def _ring_offset_init(heads: int, points: int) -> jax.Array:
    """Deformable-DETR-style initial offsets: head m points along angle
    2*pi*m/M; point p at radius (p+1). Returns [M, P, 2] float32."""
    import numpy as np

    ang = 2.0 * np.pi * np.arange(heads) / max(1, heads)
    dirs = np.stack([np.cos(ang), np.sin(ang)], axis=-1)  # [M,2]
    radii = np.arange(1, points + 1, dtype=np.float32)  # [P]
    ring = dirs[:, None, :] * radii[None, :, None]  # [M,P,2]
    return jnp.asarray(ring, jnp.float32)


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
