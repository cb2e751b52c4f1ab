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
    norm: str = "batch",
) -> nn.Module:
    if name in _RESNET_SPECS:
        return ResNetFeatures(
            variant=name, dtype=dtype, name=module_name, norm_layer=norm
        )
    if norm != "batch":
        raise ValueError(
            f"MODEL.NORM={norm!r} is only supported for resnet backbones "
            f"(got backbone={name!r})"
        )
    if name.startswith("efficientnet"):
        return EfficientNetFeatures(variant=name, dtype=dtype, name=module_name)
    # the reference's fallback stack is sized by FEAT_DIM directly
    # (cnn_encoder.py:31-37: out_channels = feat_dim)
    return SimpleConvFeatures(out_channels=feat_dim, dtype=dtype, name=module_name)


class ViewEncoder(nn.Module):
    backbone: str = "resnet18"
    feat_dim: int = 64
    # single pyramid level, or a tuple of levels for multi-scale features
    # (coarser maps bilinearly upsampled to the finest selected level and
    # channel-concatenated before the 1x1 proj)
    out_index: Any = 2
    dtype: Any = jnp.float32
    # When True, skip APPLYING the 1x1 projection and instead return
    # (raw_pyramid_feat, proj_kernel, proj_bias). The caller folds the
    # projection into the next linear op (there is no nonlinearity after
    # proj - ref cnn_encoder.py:43-48 goes conv -> geometry warp). At the
    # flagship config (40ch pyramid -> FEAT_DIM 1280 -> view-proj 128)
    # this removes a 23 GFLOP conv and ~1.2 GB of HBM traffic per batch
    # while keeping the parameter tree (and checkpoints) identical.
    fold_proj: bool = False
    # backbone normalization: 'batch' (torch parity) or 'group' (resnets
    # only - see ResNetFeatures.norm_layer)
    norm: str = "batch"

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False):
        """images: [B, V, H, W, 3] -> [B, V, Hf, Wf, feat_dim], or
        ([B, V, Hf, Wf, C_raw], kernel [C_raw, feat_dim], bias [feat_dim])
        when ``fold_proj``."""
        B, V, H, W, C = images.shape
        x = images.reshape(B * V, H, W, C)
        pyramid = build_backbone(
            self.backbone, self.dtype, feat_dim=self.feat_dim, norm=self.norm
        )(
            x, train=train
        )
        idx = (
            tuple(self.out_index)
            if isinstance(self.out_index, (tuple, list))
            else (self.out_index,)
        )
        feats = [pyramid[i] for i in idx]
        if len(feats) > 1:
            # multi-scale: upsample coarser levels to the finest selected
            # one and concat channels (BASELINE configs[1] "multi-scale
            # features"); the existing 1x1 proj then mixes scales
            Ht = max(f.shape[1] for f in feats)
            Wt = max(f.shape[2] for f in feats)
            feats = [
                f
                if f.shape[1] == Ht and f.shape[2] == Wt
                else jax.image.resize(
                    f, (f.shape[0], Ht, Wt, f.shape[-1]), "bilinear"
                ).astype(f.dtype)
                for f in feats
            ]
            feat = jnp.concatenate(feats, axis=-1)
        else:
            feat = feats[0]
        proj = nn.Conv(self.feat_dim, (1, 1), dtype=self.dtype, name="proj")
        if self.fold_proj:
            # bind/initialize proj's params on a dummy pixel (identical
            # shapes + init draws as the applied path) without paying the
            # full-tensor conv
            proj(jnp.zeros((1, 1, 1, feat.shape[-1]), feat.dtype))
            kernel = proj.variables["params"]["kernel"][0, 0]  # [C_raw, F]
            bias = proj.variables["params"]["bias"]
            _, Hf, Wf, Cf = feat.shape
            return feat.reshape(B, V, Hf, Wf, Cf), kernel, bias
        feat = proj(feat)
        _, Hf, Wf, Cf = feat.shape
        return feat.reshape(B, V, Hf, Wf, Cf)
