"""EfficientNet feature-pyramid backbone in Flax (NHWC).

Covers the reference full config's ``efficientnet_b0`` backbone
(reference: project/configs/wildtrack.yaml:8 via timm features_only,
project/models/encoders/cnn_encoder.py:26). Pyramid channels for b0 are
[16, 24, 40, 112, 320] at strides [2, 4, 8, 16, 32], matching timm's
feature_info - ``out_index=2`` selects the 40-channel stride-8 map.
"""

from __future__ import annotations

from functools import partial
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class SqueezeExcite(nn.Module):
    reduce_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduce_ch, (1, 1), dtype=self.dtype)(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype)(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    out_ch: int
    expand: int
    kernel: int
    strides: int
    norm: Any
    se_ratio: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        y = x
        if self.expand != 1:
            y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype)(y)
            y = self.norm()(y)
            y = nn.silu(y)
        y = nn.Conv(
            mid,
            (self.kernel, self.kernel),
            (self.strides, self.strides),
            feature_group_count=mid,
            use_bias=False,
            dtype=self.dtype,
        )(y)
        y = self.norm()(y)
        y = nn.silu(y)
        if self.se_ratio > 0:
            y = SqueezeExcite(max(1, int(in_ch * self.se_ratio)), dtype=self.dtype)(y)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = self.norm()(y)
        if self.strides == 1 and in_ch == self.out_ch:
            y = y + x
        return y


# (expand, out_ch, repeats, strides, kernel) per stage - EfficientNet-B0
_B0_STAGES: Sequence[Tuple[int, int, int, int, int]] = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)


class EfficientNetFeatures(nn.Module):
    """EfficientNet-B0 trunk returning 5 pyramid levels (timm order)."""

    variant: str = "efficientnet_b0"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-3,
            dtype=self.dtype,
        )
        x = x.astype(self.dtype)
        y = nn.Conv(32, (3, 3), (2, 2), use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        y = norm(name="stem_bn")(y)
        y = nn.silu(y)

        # Bank the running map right before each stride-2 stage; with B0's
        # stage layout this yields [16@s2, 24@s4, 40@s8, 112@s16, 320@s32],
        # identical to timm feature_info for efficientnet_b0.
        feats: List[jax.Array] = []
        for si, (expand, out_ch, repeats, strides, kernel) in enumerate(_B0_STAGES):
            if strides == 2:
                feats.append(y)
            for r in range(repeats):
                y = MBConv(
                    out_ch,
                    expand,
                    kernel,
                    strides if r == 0 else 1,
                    norm,
                    dtype=self.dtype,
                    name=f"stage{si}_block{r}",
                )(y)
        feats.append(y)
        return feats
