"""ResNet feature-pyramid backbone in Flax (NHWC, XLA:TPU-friendly).

Replaces the reference's ``timm.create_model(..., features_only=True)``
usage (reference: project/models/encoders/cnn_encoder.py:26, 41-48): the
returned pyramid levels sit at strides [2, 4, 8, 16, 32] and
``out_index`` selects one, so index 2 = stride 8 (128 ch for resnet18,
512 ch for resnet50) - matching timm's feature_info for resnetN.

BatchNorm runs in inference mode by default and switches to batch stats
under ``train=True`` with a mutable 'batch_stats' collection.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

ModuleDef = Any


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    norm: ModuleDef = nn.BatchNorm
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        p1 = ((1, 1), (1, 1))  # torch-exact Conv2d padding=1 (see stem note)
        residual = x
        y = conv(self.filters, (3, 3), (self.strides, self.strides), padding=p1)(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3), padding=p1)(y)
        y = self.norm(scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = conv(self.filters, (1, 1), (self.strides, self.strides))(residual)
            residual = self.norm()(residual)
        return nn.relu(y + residual)


class BottleneckBlock(nn.Module):
    filters: int
    strides: int = 1
    norm: ModuleDef = nn.BatchNorm
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        residual = x
        y = conv(self.filters, (1, 1))(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3), (self.strides, self.strides), padding=((1, 1), (1, 1)))(y)
        y = self.norm()(y)
        y = nn.relu(y)
        y = conv(self.filters * 4, (1, 1))(y)
        y = self.norm(scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = conv(self.filters * 4, (1, 1), (self.strides, self.strides))(residual)
            residual = self.norm()(residual)
        return nn.relu(y + residual)


_RESNET_SPECS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2)),
    "resnet34": (BasicBlock, (3, 4, 6, 3)),
    "resnet50": (BottleneckBlock, (3, 4, 6, 3)),
    "resnet101": (BottleneckBlock, (3, 4, 23, 3)),
}


class ResNetFeatures(nn.Module):
    """ResNet trunk returning the full feature pyramid (5 levels).

    Levels (timm features_only order): [stem/2, C2/4, C3/8, C4/16, C5/32].
    """

    variant: str = "resnet18"
    width: int = 64
    dtype: Any = jnp.float32
    # 'batch' (torch parity, convertible from timm/torchvision weights) or
    # 'group' (GroupNorm-32: batch-independent, no running-stat state or
    # cross-replica dependence - a train-step lever because BN's stat
    # updates ride the step's critical path; GN weights have no torch
    # pretrained counterpart here)
    norm_layer: str = "batch"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        block_cls, stage_sizes = _RESNET_SPECS[self.variant]
        if self.norm_layer == "group":
            norm = partial(
                nn.GroupNorm, num_groups=32, epsilon=1e-5, dtype=self.dtype
            )
        else:
            norm = partial(
                nn.BatchNorm,
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
            )
        feats = []
        x = x.astype(self.dtype)
        # torch-exact symmetric padding: flax 'SAME' on stride-2 ops pads
        # asymmetrically ((0,1) for k=3), shifting every feature one pixel
        # vs torchvision and breaking converted-weight parity.
        y = nn.Conv(
            self.width,
            (7, 7),
            (2, 2),
            padding=((3, 3), (3, 3)),
            use_bias=False,
            dtype=self.dtype,
            name="stem_conv",
        )(x)
        y = norm(name="stem_bn")(y)
        y = nn.relu(y)
        feats.append(y)  # stride 2
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, n_blocks in enumerate(stage_sizes):
            for j in range(n_blocks):
                strides = 2 if (i > 0 and j == 0) else 1
                y = block_cls(
                    self.width * (2**i),
                    strides=strides,
                    norm=norm,
                    dtype=self.dtype,
                    name=f"stage{i}_block{j}",
                )(y)
            feats.append(y)  # strides 4, 8, 16, 32
        return feats
