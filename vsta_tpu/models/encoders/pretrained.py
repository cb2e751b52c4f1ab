"""Pretrained-backbone loading: torch state_dict -> Flax params.

The reference gets ImageNet weights for free from timm
(project/models/encoders/cnn_encoder.py:26-29) and exposes a tolerant
``load_pretrained`` that warns-and-continues on mismatch
(project/models/encoders/base.py:17-24). Here the equivalent is an
explicit converter from a torchvision/timm-style ResNet ``state_dict``
(a local ``.pth`` - this framework never downloads) into the
:class:`vsta_tpu.models.encoders.resnet.ResNetFeatures` parameter tree,
with the same warn-don't-crash semantics.

Key mapping (torchvision resnetN -> ResNetFeatures):
  conv1 / bn1                  -> stem_conv / stem_bn
  layer{i+1}.{j}.conv{k+1}     -> stage{i}_block{j}.Conv_{k}
  layer{i+1}.{j}.bn{k+1}       -> stage{i}_block{j}.BatchNorm_{k}
  layer{i+1}.{j}.downsample.0  -> stage{i}_block{j}.Conv_{n_convs}
  layer{i+1}.{j}.downsample.1  -> stage{i}_block{j}.BatchNorm_{n_convs}
Conv weights transpose OIHW -> HWIO; BN weight/bias -> scale/bias
(params) and running_mean/var -> mean/var (batch_stats).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from .resnet import _RESNET_SPECS, BottleneckBlock


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO


def convert_torch_resnet(
    state_dict: Dict[str, Any], variant: str = "resnet18"
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a torch ResNet state_dict (numpy-able values) into
    (params, batch_stats) subtrees for ``ResNetFeatures``.

    Unknown/extra torch keys (fc.*) are ignored; missing keys are
    skipped with a warning - tolerant like the reference loader.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    block_cls, stage_sizes = _RESNET_SPECS[variant]
    n_convs = 3 if block_cls is BottleneckBlock else 2

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    missing = []

    def take(key):
        if key not in sd:
            missing.append(key)
            return None
        return sd[key]

    def put_bn(dst_p: Dict, dst_s: Dict, name: str, prefix: str):
        w, b = take(f"{prefix}.weight"), take(f"{prefix}.bias")
        m, v = take(f"{prefix}.running_mean"), take(f"{prefix}.running_var")
        if w is None or b is None or m is None or v is None:
            return
        dst_p[name] = {"scale": w.astype(np.float32), "bias": b.astype(np.float32)}
        dst_s[name] = {"mean": m.astype(np.float32), "var": v.astype(np.float32)}

    w = take("conv1.weight")
    if w is not None:
        params["stem_conv"] = {"kernel": _conv(w).astype(np.float32)}
    put_bn(params, stats, "stem_bn", "bn1")

    for i, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            t = f"layer{i + 1}.{j}"
            for k in range(n_convs):
                cw = take(f"{t}.conv{k + 1}.weight")
                if cw is not None:
                    bp[f"Conv_{k}"] = {"kernel": _conv(cw).astype(np.float32)}
                put_bn(bp, bs, f"BatchNorm_{k}", f"{t}.bn{k + 1}")
            dw = take(f"{t}.downsample.0.weight") if f"{t}.downsample.0.weight" in sd else None
            if dw is not None:
                bp[f"Conv_{n_convs}"] = {"kernel": _conv(dw).astype(np.float32)}
                put_bn(bp, bs, f"BatchNorm_{n_convs}", f"{t}.downsample.1")
            params[f"stage{i}_block{j}"] = bp
            stats[f"stage{i}_block{j}"] = bs

    if missing:
        print(f"[pretrained] {len(missing)} torch keys missing, skipped: {missing[:5]}...")
    return params, stats


def load_pretrained_backbone(variables: Dict[str, Any], path: str, variant: str):
    """Merge converted torch weights into a fresh variables pytree.

    variables: output of model.init (dicts under 'params'/'batch_stats').
    Returns updated variables. Shape mismatches are skipped with a
    warning (the reference's strict=False load, base.py:17-24).
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    new_params, new_stats = convert_torch_resnet(sd, variant)

    import flax

    variables = flax.core.unfreeze(variables)

    def merge(dst, src, path=""):
        n_loaded = 0
        for k, v in src.items():
            if k not in dst:
                print(f"[pretrained] no target for {path}{k}, skipped")
                continue
            if isinstance(v, dict):
                n_loaded += merge(dst[k], v, path=f"{path}{k}/")
            else:
                if tuple(dst[k].shape) != tuple(v.shape):
                    print(
                        f"[pretrained] shape mismatch at {path}{k}: "
                        f"{dst[k].shape} vs {v.shape}, skipped"
                    )
                    continue
                dst[k] = v.astype(np.asarray(dst[k]).dtype)
                n_loaded += 1
        return n_loaded

    n_p = merge(variables["params"]["encoder"]["backbone"], new_params)
    n_s = 0
    if "batch_stats" in variables and variables["batch_stats"]:
        n_s = merge(variables["batch_stats"]["encoder"]["backbone"], new_stats)
    print(f"[pretrained] loaded {n_p} param + {n_s} batch-stat tensors from {path}")
    return flax.core.freeze(variables) if isinstance(variables, flax.core.FrozenDict) else variables
