"""Minimal conv fallback encoder (stride 4), mirroring the reference's
timm-less degradation path (project/models/encoders/cnn_encoder.py:31-37)."""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp
from flax import linen as nn


class SimpleConvFeatures(nn.Module):
    out_channels: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        x = x.astype(self.dtype)
        # torch-exact symmetric padding (Conv2d padding=1): flax 'SAME' on
        # stride-2 convs pads (0, 1) and shifts features one pixel vs the
        # reference - explicit (1, 1) keeps converted weights aligned
        p = ((1, 1), (1, 1))
        y = nn.Conv(16, (3, 3), (2, 2), padding=p, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (3, 3), (2, 2), padding=p, dtype=self.dtype)(y)
        y = nn.relu(y)
        # single stride-4 level; pad the pyramid so out_index still resolves
        return [y, y, y, y, y]
