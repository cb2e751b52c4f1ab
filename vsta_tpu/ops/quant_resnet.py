"""int8 post-training quantization for the ResNet encoder (serving).

Extends the detector-stem PTQ (ops/quant.py, docs/QUANTIZATION.md) to
the ResNet backbone family - the BASELINE-named Phase-1 config
(`wildtrack_v1_resnet50.yaml`) runs a ResNet-50 encoder that is the
largest stage of its serving forward. BatchNorm folds into the conv
weights at serving time (classic PTQ), every folded conv runs
s8 x s8 -> s32 (per-output-channel weight scales, per-tensor calibrated
activation scales), and the float pieces that remain - ReLU, residual
adds, maxpool, the 7x7 stem conv on the normalized input - are
bandwidth-trivial. On TPU the win is twofold: the int8 MXU path runs at
2x the bf16 rate, and the HBM-bound layers move half the bytes when XLA
keeps inter-layer tensors in int8.

The quantized twin mirrors ``ResNetFeatures``/``ViewEncoder``
(models/encoders/) exactly - topology, torch-exact padding, pyramid
levels, multi-scale concat, and the fold_proj contract - so
``BEVNet.apply(..., quant_encoder=qe)`` is a drop-in serving swap. The
reference has no quantization story at all (fp16 autocast only,
project/train.py:238-247).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from .quant import CONV_IMPL, conv_int8, quantize_act, quantize_weight_per_cout

_BN_EPS = 1e-5  # models/encoders/resnet.py:96


def _fold_bn(kernel: jax.Array, bn_p: Dict, bn_s: Dict) -> Tuple[jax.Array, jax.Array]:
    """conv (no bias) + BatchNorm -> folded (kernel', bias')."""
    s = bn_p["scale"].astype(jnp.float32) * jax.lax.rsqrt(
        bn_s["var"].astype(jnp.float32) + _BN_EPS
    )
    return (
        kernel.astype(jnp.float32) * s,
        bn_p["bias"].astype(jnp.float32) - bn_s["mean"].astype(jnp.float32) * s,
    )


def _block_convs(variant: str) -> Tuple[List[Tuple[str, int, bool]], str]:
    """Per-block conv site layout: (name, kernel, strided?) for the main
    path, plus the downsample conv name. Strided? marks which conv takes
    the block's stride (models/encoders/resnet.py BasicBlock/Bottleneck)."""
    if variant in ("resnet18", "resnet34"):
        return [("Conv_0", 3, True), ("Conv_1", 3, False)], "Conv_2"
    return [("Conv_0", 1, False), ("Conv_1", 3, True), ("Conv_2", 1, False)], "Conv_3"


def _fold_backbone(variant: str, params: Dict, stats: Dict) -> Dict:
    """Folded float (kernel, bias) per conv site, keyed 'block/Conv_k'."""
    from ..models.encoders.resnet import _RESNET_SPECS

    _, stage_sizes = _RESNET_SPECS[variant]
    main, down = _block_convs(variant)
    folded = {
        "stem": _fold_bn(
            params["stem_conv"]["kernel"], params["stem_bn"], stats["stem_bn"]
        )
    }
    for i, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            blk = f"stage{i}_block{j}"
            for k, (cname, _, _) in enumerate(main):
                folded[f"{blk}/{cname}"] = _fold_bn(
                    params[blk][cname]["kernel"],
                    params[blk][f"BatchNorm_{k}"],
                    stats[blk][f"BatchNorm_{k}"],
                )
            if down in params[blk]:
                folded[f"{blk}/{down}"] = _fold_bn(
                    params[blk][down]["kernel"],
                    params[blk][f"BatchNorm_{len(main)}"],
                    stats[blk][f"BatchNorm_{len(main)}"],
                )
    return folded


def _forward_backbone(variant: str, x: jax.Array, site, has_site) -> List[jax.Array]:
    """Shared topology walk (float calibration AND int8 apply).

    ``site(key, x, stride, kernel_size)`` returns the conv+folded-BN
    output (pre-activation); ``has_site(key)`` gates the downsample.
    Mirrors ResNetFeatures.__call__ exactly (incl. torch-exact padding,
    which both executors implement via pad = (K-1)//2).
    """
    from ..models.encoders.resnet import _RESNET_SPECS

    _, stage_sizes = _RESNET_SPECS[variant]
    main, down = _block_convs(variant)
    feats = []
    y = jax.nn.relu(site("stem", x.astype(jnp.float32), 2, 7))
    feats.append(y)  # stride 2
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )  # max_pool 3x3/2 pad 1 (flax nn.max_pool twin)
    for i, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            blk = f"stage{i}_block{j}"
            stride = 2 if (i > 0 and j == 0) else 1
            r = y
            z = y
            for idx, (cname, ksize, strided) in enumerate(main):
                z = site(f"{blk}/{cname}", z, stride if strided else 1, ksize)
                if idx < len(main) - 1:
                    z = jax.nn.relu(z)
            if has_site(f"{blk}/{down}"):
                r = site(f"{blk}/{down}", y, stride, 1)
            y = jax.nn.relu(z + r)
        feats.append(y)  # strides 4, 8, 16, 32
    return feats


def _conv_f32(x, kernel, stride, ksize):
    p = (ksize - 1) // 2
    return jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def quantize_encoder(
    variant: str,
    enc_params: Dict,
    enc_stats: Dict,
    calib_images: Sequence[jax.Array],
    out_index: Any,
    fold_proj: bool,
    clip_percentile: float = 99.99,
    conv_impl: str = None,
) -> Dict:
    """Build int8 serving params for the ViewEncoder.

    enc_params/enc_stats: ``variables['params']['encoder']`` and
    ``variables['batch_stats']['encoder']`` subtrees. calib_images: a few
    [N,H,W,3] normalized image tensors (B*V-flattened). Returns the
    ``quant_encoder`` pytree for ``BEVNet.apply``/:func:`apply_quant_encoder`.
    """
    assert len(calib_images) > 0, "need at least one calibration batch"
    folded = _fold_backbone(variant, enc_params["backbone"], enc_stats["backbone"])

    @jax.jit
    def _calib(x):
        recs = {}

        def site(key, xin, stride, ksize):
            if key != "stem":  # the stem conv stays float
                recs[key] = jnp.percentile(
                    jnp.abs(xin.astype(jnp.float32)), clip_percentile
                )
            w, b = folded[key]
            return _conv_f32(xin.astype(jnp.float32), w, stride, ksize) + b

        _forward_backbone(variant, x, site, lambda k: k in folded)
        return recs

    amax: Dict[str, float] = {}
    for x in calib_images:
        for k, v in _calib(jnp.asarray(x)).items():
            amax[k] = max(amax.get(k, 0.0), float(v))

    sites = {}
    for key, (w, b) in folded.items():
        if key == "stem":
            continue
        w_i8, w_scale = quantize_weight_per_cout(w)
        sites[key] = {
            "w_i8": w_i8,
            "w_scale": w_scale,
            "b": b,
            "x_scale": jnp.float32(max(amax[key], 1e-8) / 127.0),
        }
    return {
        "variant": variant,
        "stem": {"w": folded["stem"][0], "b": folded["stem"][1]},
        "sites": sites,
        "proj": {
            "kernel": enc_params["proj"]["kernel"][0, 0].astype(jnp.float32),
            "bias": enc_params["proj"]["bias"].astype(jnp.float32),
        },
        "out_index": out_index,
        "fold_proj": bool(fold_proj),
        # conv lowering captured at quantize time (see quant.CONV_IMPL):
        # trace-time reads of a mutable module global would not retrace
        "impl": conv_impl or CONV_IMPL,
    }


def apply_quant_encoder(qe: Dict, images: jax.Array, impl: str = None):
    """int8 twin of ``ViewEncoder.__call__`` (same output contract).

    images [B,V,H,W,3] (already normalized) -> [B,V,Hf,Wf,feat_dim], or
    (feat_raw, proj_kernel, proj_bias) when the encoder was exported
    with fold_proj (the concat families fold the 1x1 proj into the warp).
    """
    impl = impl or qe.get("impl") or CONV_IMPL
    B, V, H, W, C = images.shape
    x = images.reshape(B * V, H, W, C)
    sites = qe["sites"]

    def site(key, xin, stride, ksize):
        if key == "stem":
            return _conv_f32(xin, qe["stem"]["w"], stride, ksize) + qe["stem"]["b"]
        qs = sites[key]
        x_i8 = quantize_act(xin, qs["x_scale"])
        y = conv_int8(x_i8, qs["w_i8"], stride=stride, impl=impl)
        return y.astype(jnp.float32) * (qs["x_scale"] * qs["w_scale"]) + qs["b"]

    pyramid = _forward_backbone(
        qe["variant"], x, site, lambda k: k in sites or k == "stem"
    )

    oi = qe["out_index"]
    idx = tuple(oi) if isinstance(oi, (tuple, list)) else (oi,)
    feats = [pyramid[i] for i in idx]
    if len(feats) > 1:
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

    _, Hf, Wf, Cf = feat.shape
    if qe["fold_proj"]:
        return feat.reshape(B, V, Hf, Wf, Cf), qe["proj"]["kernel"], qe["proj"]["bias"]
    feat = jnp.einsum("nhwc,cf->nhwf", feat, qe["proj"]["kernel"]) + qe["proj"]["bias"]
    return feat.reshape(B, V, Hf, Wf, qe["proj"]["kernel"].shape[-1])
