"""Ahead-of-time serving export: StableHLO artifacts via ``jax.export``.

The reference has no deployment story — its ``inference.py`` re-runs the
eager torch model from a checkpoint every time (reference:
project/inference.py:17-48). For production serving we instead compile
the full forward + decode program ONCE, with the trained weights baked
in as constants, and serialize it to a portable StableHLO artifact:

- the artifact is self-contained: loading it needs jax but NOT this
  package's model code, the config, or the checkpoint;
- shapes and the decode contract (top-k, NMS radius, confidence
  threshold) are frozen at export time - serving gets static shapes and
  deterministic latency;
- ``platforms`` records which backends the lowering is valid for. The
  default export targets the platform of the exporting process; pass
  ``platforms=["tpu"]`` (with ``MODEL.WARP_IMPL: fused``, i.e. the pure
  XLA warp) to cross-export a TPU artifact from a CPU host - the Pallas
  kernel path lowers only on a real TPU backend.

Usage (see also the ``export.py`` CLI at the repo root):

    exp = export_serving(cfg, variables, batch_size=1)
    save_exported(exp, "model.stablehlo")
    ...
    serve = load_serving("model.stablehlo")
    out = serve(images, K, Rt)   # {'boxes','scores','valid','heatmap'}
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export

from .config import Config, to_dict as _config_to_dict
from .models import BEVNet
from .ops.decode import decode_detections

_MANIFEST_SUFFIX = ".json"


def build_serving_fn(
    cfg: Config, variables, quant_head=None, quant_encoder=None
) -> Callable:
    """Forward + decode with the weights closed over (baked as constants).

    Mirrors ``make_eval_step`` (training/state.py:133-162) minus the
    TrainState plumbing: serving has no optimizer and no mutable state.
    ``quant_head``/``quant_encoder``: int8 params from
    :func:`calibrate_quant_head` / :func:`calibrate_quant_encoder` - the
    stage then runs s8xs8->s32 on the MXU's int8 path.
    """
    model = BEVNet.from_config(cfg)
    e, m = cfg.eval, cfg.model

    def serve(images: jax.Array, K: jax.Array, Rt: jax.Array) -> Dict[str, jax.Array]:
        out = model.apply(
            variables, images, K, Rt, train=False,
            quant_head=quant_head, quant_encoder=quant_encoder,
        )
        det = decode_detections(
            out["heatmap"],
            out["offset"],
            out["size"],
            bounds=m.bev_bounds,
            conf_thresh=e.conf_thresh,
            nms_dist_m=e.nms_dist_m,
            max_dets=e.max_dets,
        )
        return {
            "boxes": det["boxes"],
            "scores": det["scores"],
            "valid": det["valid"],
            "heatmap": out["heatmap"],
        }

    return serve


def calibrate_quant_head(
    cfg: Config, variables, batches: Sequence[tuple], quant_encoder=None,
    conv_impl: str = None,
) -> Dict:
    """Build int8 head params from representative batches.

    ``batches``: (images, K, Rt) tuples (real frames when available,
    synthetic otherwise). Runs the float model to collect its own
    ``bev_feat`` maps, then calibrates/quantizes the detector stem
    (see :mod:`vsta_tpu.ops.quant`). Pass ``quant_encoder`` when the
    deployment combines both stages, so the head calibrates on the
    bev_feat distribution it will actually see.
    """
    from .ops.quant import quantize_head

    model = BEVNet.from_config(cfg)
    # jit: eager per-op dispatch would pay hundreds of device round-trips
    # per calibration batch on tunneled rigs
    fwd = jax.jit(
        lambda images, K, Rt: model.apply(
            variables, images, K, Rt, train=False, quant_encoder=quant_encoder
        )["bev_feat"]
    )
    feats = [fwd(images, K, Rt) for images, K, Rt in batches]
    return quantize_head(
        variables["params"]["detector"], feats, conv_impl=conv_impl
    )


def calibrate_quant_encoder(
    cfg: Config, variables, batches: Sequence[tuple], conv_impl: str = None
) -> Dict:
    """Build int8 ResNet-encoder params from representative batches.

    Same contract as :func:`calibrate_quant_head`. Supports the resnet
    backbone family (BatchNorm folds at serving time); raises for
    backbones without batch stats."""
    import jax.numpy as jnp

    from .ops.quant_resnet import quantize_encoder

    if cfg.model.backbone not in ("resnet18", "resnet34", "resnet50", "resnet101"):
        raise ValueError(
            f"encoder quantization supports the resnet family, not "
            f"{cfg.model.backbone!r} (BatchNorm-fold PTQ)"
        )
    if cfg.model.norm != "batch":
        raise ValueError(
            f"encoder quantization folds BatchNorm into the int8 convs; "
            f"MODEL.NORM={cfg.model.norm!r} has no running stats to fold"
        )
    fold = cfg.model.fusion == "concat" and cfg.model.warp_impl in ("fused", "pallas")
    imgs = []
    for images, _K, _Rt in batches:
        x = jnp.asarray(images)
        if x.dtype == jnp.uint8:
            # mirror BEVNet's on-device normalization (bevnet.py uint8 path)
            from .data.transforms import IMAGENET_MEAN, IMAGENET_STD

            mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
            scale = 1.0 / (jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0)
            x = (x.astype(jnp.float32) - mean) * scale
        B, V, H, W, _ = x.shape
        imgs.append(x.reshape(B * V, H, W, 3))
    return quantize_encoder(
        cfg.model.backbone,
        variables["params"]["encoder"],
        variables["batch_stats"]["encoder"],
        imgs,
        cfg.model.out_index,
        fold,
        conv_impl=conv_impl,
    )


def export_serving(
    cfg: Config,
    variables,
    batch_size: int = 1,
    platforms: Optional[Sequence[str]] = None,
    quant_head=None,
    quant_encoder=None,
) -> jax_export.Exported:
    """Lower + export the serving program for ``batch_size`` frames.

    Input spec matches the host pipeline: uint8 images when
    ``DATA.DEVICE_NORMALIZE`` (normalization runs inside the program,
    images ship at 1/4 the bytes), f32 otherwise.
    """
    V = cfg.data.views
    H, W = cfg.data.img_size
    img_dtype = jnp.uint8 if cfg.data.device_normalize else jnp.float32
    specs = (
        jax.ShapeDtypeStruct((batch_size, V, H, W, 3), img_dtype),
        jax.ShapeDtypeStruct((batch_size, V, 3, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, V, 4, 4), jnp.float32),
    )
    fn = jax.jit(build_serving_fn(
        cfg, variables, quant_head=quant_head, quant_encoder=quant_encoder
    ))
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jax_export.export(fn, **kwargs)(*specs)


def save_exported(exp: jax_export.Exported, path: str | Path, cfg: Optional[Config] = None) -> None:
    """Write the serialized artifact + a human-readable JSON manifest."""
    path = Path(path)
    path.write_bytes(exp.serialize())
    manifest: Dict[str, Any] = {
        "fn_name": exp.fun_name,
        "platforms": list(exp.platforms),
        "in_avals": [str(a) for a in exp.in_avals],
        "out_avals": [str(a) for a in exp.out_avals],
        "calling_convention_version": exp.calling_convention_version,
        "jax_version": jax.__version__,
    }
    if cfg is not None:
        manifest["config"] = _config_to_dict(cfg)
    Path(str(path) + _MANIFEST_SUFFIX).write_text(json.dumps(manifest, indent=2))


def load_serving(path: str | Path) -> Callable:
    """Load an artifact; returns ``serve(images, K, Rt) -> dict``.

    The returned callable is jitted (the deserialized program is a
    single XLA computation; jit avoids re-tracing its call wrapper).
    """
    exp = jax_export.deserialize(Path(path).read_bytes())
    return jax.jit(exp.call)
