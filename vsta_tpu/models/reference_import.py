"""Import a reference-framework BEVNet checkpoint into :class:`BEVNet`.

The reference (project/models/model_wrapper.py:13-103) is a torch model:
NCHW convs, a lazily-built 1x1 ``proj`` over the ConcatFusion output,
and a lazily-built ``BEVDetector`` (project/models/heads/detector.py:7-45).
This converter maps its ``state_dict`` onto the vsta_tpu parameter tree
so users migrating from the reference keep their trained weights.

Covered module mapping (torch key -> flax path):

  encoder.backbone.0 / .2          -> encoder/backbone/Conv_0 / Conv_1
      (the reference's timm-less fallback conv stack,
       cnn_encoder.py:31-37; our ``simple`` backbone)
  encoder.backbone.<torchvision>   -> encoder/backbone/** via
      :func:`convert_torch_resnet` (the timm resnet path)
  encoder.proj                     -> encoder/proj (1x1 feature proj);
      identity-initialized when the reference had none (fallback path)
  proj [C_out, V*C, 1, 1]          -> view_proj [V, C, C_out] (+bias) -
      the ConcatFusion + 1x1 conv is algebraically the per-view
      projection our fused warp uses (ops/warp.py:316-391)
  detector.stem.{0,3,6}            -> detector/stem{0,1,2}
  detector.stem.{1,4,7} (GN)       -> detector/GroupNorm_{0,1,2}
  detector.{heatmap,offset,size}_head -> detector/*_head

All convs transpose OIHW -> HWIO. Weights whose shapes mismatch are
skipped with a warning (the reference's own strict=False semantics,
project/inference.py:31).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from .encoders.pretrained import convert_torch_resnet


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO


def convert_reference_state_dict(
    sd: Dict[str, Any], views: int, feat_dim: int
) -> Dict[str, Any]:
    """Reference BEVNet state_dict -> partial vsta_tpu 'params' tree.

    sd: torch state_dict with numpy-able values.
    Returns a nested dict mirroring BEVNet.init()['params'] for every
    reference module that has a counterpart.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict[str, Any] = {}

    # --- encoder ---------------------------------------------------------
    enc: Dict[str, Any] = {}
    if "encoder.backbone.0.weight" in sd:
        # fallback conv stack (timm missing in the reference install)
        backbone = {
            "Conv_0": {
                "kernel": _conv(sd["encoder.backbone.0.weight"]).astype(np.float32),
                "bias": sd["encoder.backbone.0.bias"].astype(np.float32),
            },
            "Conv_1": {
                "kernel": _conv(sd["encoder.backbone.2.weight"]).astype(np.float32),
                "bias": sd["encoder.backbone.2.bias"].astype(np.float32),
            },
        }
        enc["backbone"] = backbone
        # the fallback has no 1x1 proj; ours always does -> identity
        C = sd["encoder.backbone.2.weight"].shape[0]
        enc["proj"] = {
            "kernel": np.eye(C, dtype=np.float32)[None, None],
            "bias": np.zeros((C,), np.float32),
        }
    elif any(k.startswith("encoder.backbone.conv1") for k in sd):
        # timm/torchvision resnet naming
        bb_sd = {
            k[len("encoder.backbone."):]: v
            for k, v in sd.items()
            if k.startswith("encoder.backbone.")
        }
        variant = _guess_resnet_variant(bb_sd)
        bb_params, bb_stats = convert_torch_resnet(bb_sd, variant)
        enc["backbone"] = bb_params
        enc["__batch_stats__"] = bb_stats
        if "encoder.proj.weight" in sd:
            enc["proj"] = {
                "kernel": _conv(sd["encoder.proj.weight"]).astype(np.float32),
                "bias": sd["encoder.proj.bias"].astype(np.float32),
            }
    if enc:
        params["encoder"] = enc

    # --- BEV 1x1 projection (ConcatFusion + proj == per-view proj) -------
    if "proj.weight" in sd:
        w = np.asarray(sd["proj.weight"])  # [C_out, V*C, 1, 1]
        c_out, vc = w.shape[0], w.shape[1]
        if vc % views == 0:
            C = vc // views
            params["view_proj"] = (
                w[:, :, 0, 0].reshape(c_out, views, C).transpose(1, 2, 0).astype(np.float32)
            )
            params["view_proj_bias"] = sd["proj.bias"].astype(np.float32)
        else:
            print(
                f"[reference-import] proj in_ch {vc} not divisible by V={views}; skipped"
            )

    # --- detector ---------------------------------------------------------
    det: Dict[str, Any] = {}

    def gn(dst_name: str, idx: int):
        w = sd.get(f"detector.stem.{idx}.weight")
        b = sd.get(f"detector.stem.{idx}.bias")
        if w is not None and b is not None:
            det[dst_name] = {
                "scale": w.astype(np.float32),
                "bias": b.astype(np.float32),
            }

    for i, (src, dst) in enumerate(((0, "stem0"), (3, "stem1"), (6, "stem2"))):
        w = sd.get(f"detector.stem.{src}.weight")
        if w is not None:
            det[dst] = {"kernel": _conv(w).astype(np.float32)}
        gn(f"GroupNorm_{i}", src + 1)
    for head in ("heatmap_head", "offset_head", "size_head"):
        w, b = sd.get(f"detector.{head}.weight"), sd.get(f"detector.{head}.bias")
        if w is not None and b is not None:
            det[head] = {
                "kernel": _conv(w).astype(np.float32),
                "bias": b.astype(np.float32),
            }
    if det:
        params["detector"] = det
    return params


def _guess_resnet_variant(bb_sd: Dict[str, np.ndarray]) -> str:
    n_layer1 = len({k.split(".")[1] for k in bb_sd if k.startswith("layer1.")})
    bottleneck = any("conv3" in k for k in bb_sd)
    if bottleneck:
        n_layer3 = len({k.split(".")[1] for k in bb_sd if k.startswith("layer3.")})
        return "resnet101" if n_layer3 > 10 else "resnet50"
    return "resnet34" if n_layer1 > 2 else "resnet18"


def load_reference_weights(
    variables: Dict[str, Any], sd: Dict[str, Any], views: int, feat_dim: int
) -> Tuple[Dict[str, Any], int]:
    """Merge a reference state_dict into fresh BEVNet variables.

    Returns (updated variables, number of tensors loaded). Mismatched
    shapes are skipped with a warning (ref inference.py:31 strict=False).
    """
    import flax

    converted = convert_reference_state_dict(sd, views, feat_dim)
    bstats = None
    if "encoder" in converted:
        bstats = converted["encoder"].pop("__batch_stats__", None)
    variables = flax.core.unfreeze(variables)

    def merge(dst, src, path=""):
        n = 0
        for k, v in src.items():
            if k not in dst:
                print(f"[reference-import] no target for {path}{k}, skipped")
                continue
            if isinstance(v, dict):
                n += merge(dst[k], v, path=f"{path}{k}/")
            else:
                if tuple(np.shape(dst[k])) != tuple(np.shape(v)):
                    print(
                        f"[reference-import] shape mismatch at {path}{k}: "
                        f"{np.shape(dst[k])} vs {np.shape(v)}, skipped"
                    )
                    continue
                dst[k] = np.asarray(v, dtype=np.asarray(dst[k]).dtype)
                n += 1
        return n

    n = merge(variables["params"], converted)
    if bstats is not None and variables.get("batch_stats"):
        n += merge(variables["batch_stats"]["encoder"]["backbone"], bstats)
    print(f"[reference-import] loaded {n} tensors from reference checkpoint")
    return variables, n
