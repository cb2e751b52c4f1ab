"""CenterNet-style BEV detection head.

Reference: project/models/heads/detector.py:7-62 - a 3-conv stem
(512 -> 128 -> 128, middle conv dilation 2, GroupNorm(32) + ReLU) and three
3x3 output convs (1-ch heatmap, 2-ch offset, 2-ch size) with CenterNet
initialization: heatmap bias -2.19, offset head zeroed, size bias =
log(default footprint in cells). Decode lives in
:mod:`vsta_tpu.ops.decode` (on-device, static shapes).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class BEVDetectorHead(nn.Module):
    bev_bounds: Tuple[float, float, float, float]
    bev_size: Tuple[int, int]  # (H, W)
    default_box_wh: Tuple[float, float] = (0.6, 0.6)
    mid1: int = 512
    mid2: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, bev_feat: jax.Array) -> Dict[str, jax.Array]:
        """bev_feat: [B, H, W, C] -> heads dict (channels-last)."""
        # epsilon matches torch GroupNorm (1e-5; flax defaults to 1e-6) so
        # reference-converted weights reproduce the same activations
        gn = lambda: nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype)
        y = nn.Conv(self.mid1, (3, 3), use_bias=False, dtype=self.dtype, name="stem0")(
            bev_feat.astype(self.dtype)
        )
        y = gn()(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.mid2,
            (3, 3),
            kernel_dilation=(2, 2),
            use_bias=False,
            dtype=self.dtype,
            name="stem1",
        )(y)
        y = gn()(y)
        y = nn.relu(y)
        y = nn.Conv(self.mid2, (3, 3), use_bias=False, dtype=self.dtype, name="stem2")(y)
        y = gn()(y)
        shared = nn.relu(y)

        x_min, x_max, y_min, y_max = self.bev_bounds
        res_x = (x_max - x_min) / float(self.bev_size[1])
        res_y = (y_max - y_min) / float(self.bev_size[0])
        default_w_cells = max(self.default_box_wh[0] / max(res_x, 1e-6), 1e-3)
        default_h_cells = max(self.default_box_wh[1] / max(res_y, 1e-6), 1e-3)
        size_bias = jnp.log(jnp.array([default_w_cells, default_h_cells], jnp.float32))

        heatmap_logits = nn.Conv(
            1,
            (3, 3),
            bias_init=nn.initializers.constant(-2.19),
            name="heatmap_head",
        )(shared)
        offset_raw = nn.Conv(
            2,
            (3, 3),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="offset_head",
        )(shared)
        size_raw = nn.Conv(
            2,
            (3, 3),
            bias_init=lambda key, shape, dtype=jnp.float32: size_bias.astype(dtype),
            name="size_head",
        )(shared)

        f32 = lambda t: t.astype(jnp.float32)
        return {
            "heatmap_logits": f32(heatmap_logits),
            "heatmap": jax.nn.sigmoid(f32(heatmap_logits)),
            "offset_raw": f32(offset_raw),
            "offset": jax.nn.sigmoid(f32(offset_raw)),
            "size_raw": f32(size_raw),
            "size": jnp.exp(f32(size_raw)),
        }
