"""Per-view encoder: shared backbone over all B*V images + 1x1 projection.

Reference contract (project/models/encoders/base.py:6-28,
cnn_encoder.py:50-78): input [B, V, H, W, 3] -> output [B, V, Hf, Wf, C]
with C = feat_dim; all views share weights and are encoded in a single
flattened B*V pass (one big MXU-friendly batch). The reference's lazy
1x1 projection (cnn_encoder.py:43-46) is built eagerly here - shapes are
known from config, which also removes its strict=False checkpoint hack.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .resnet import ResNetFeatures, _RESNET_SPECS
from .efficientnet import EfficientNetFeatures
from .simple import SimpleConvFeatures


def build_backbone(
    name: str,
    dtype: Any = jnp.float32,
    module_name: str = "backbone",
    feat_dim: int = 32,
) -> nn.Module:
    if name in _RESNET_SPECS:
        return ResNetFeatures(variant=name, dtype=dtype, name=module_name)
    if name.startswith("efficientnet"):
        return EfficientNetFeatures(variant=name, dtype=dtype, name=module_name)
    # the reference's fallback stack is sized by FEAT_DIM directly
    # (cnn_encoder.py:31-37: out_channels = feat_dim)
    return SimpleConvFeatures(out_channels=feat_dim, dtype=dtype, name=module_name)


class ViewEncoder(nn.Module):
    backbone: str = "resnet18"
    feat_dim: int = 64
    out_index: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        """images: [B, V, H, W, 3] -> [B, V, Hf, Wf, feat_dim]."""
        B, V, H, W, C = images.shape
        x = images.reshape(B * V, H, W, C)
        pyramid = build_backbone(self.backbone, self.dtype, feat_dim=self.feat_dim)(
            x, train=train
        )
        feat = pyramid[self.out_index]
        feat = nn.Conv(self.feat_dim, (1, 1), dtype=self.dtype, name="proj")(feat)
        _, Hf, Wf, Cf = feat.shape
        return feat.reshape(B, V, Hf, Wf, Cf)
