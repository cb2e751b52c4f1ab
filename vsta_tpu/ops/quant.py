"""int8 post-training quantization for the detector head (serving path).

The CenterNet stem is 96% of the forward FLOPs and runs at ~79% of the
bf16 MXU roofline (docs/PERFORMANCE.md) - on paper the one stage where
faster *arithmetic* could buy latency (v5e datasheet: int8 at 2x the
bf16 MXU rate). MEASURED OUTCOME (TPU v5e, 2026-08-18,
docs/QUANTIZATION.md "Speed"): the runtime does not engage a faster
int8 rate - int8 serving is SLOWER than bf16 in every measured mode,
so on this runtime int8 is a *memory* lever (halved weight bytes),
not a latency lever, and stays off by default.

Scheme (standard PTQ):
  * weights: symmetric per-output-channel int8 (absmax / 127);
  * activations: symmetric per-tensor int8, scales calibrated from a few
    representative BEV feature maps;
  * the three 3x3 stem convs run as s8 x s8 -> s32; GroupNorm + ReLU
    between them stay float (they are bandwidth-trivial and normalize
    away quantization scale errors);
  * the three tiny output convs (128 -> 1/2/2 channels) stay float so
    the regression outputs keep full precision.

Two exact-integer lowerings (pinned equal by unit test):
  * 'conv' (the measured default): one native
    ``lax.conv_general_dilated(s8, s8) -> s32`` - reads the input once;
  * 'dots': nine shifted 1x1 ``lax.dot_general`` matmuls over fused
    zero-padded slices - backend-portable, but re-reads the padded
    input ~9x from HBM, which measures ~2x slower on the head modes.

The reference has no quantization story at all (pure fp16-autocast
torch, project/train.py:238-247); this is a new capability.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

# stem conv dilations by position, fixed by the head architecture
# (reference project/models/heads/detector.py:17-27: middle conv dilated 2)
_STEM_DILATIONS = (1, 2, 1)
_GN_GROUPS = 32
_GN_EPS = 1e-5  # torch/flax-parity epsilon (models/heads.py:34)


def quantize_weight_per_cout(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[3,3,Cin,Cout] f32 -> (int8 same shape, f32 scale [Cout])."""
    absmax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale.astype(jnp.float32)


def quantize_act(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Symmetric per-tensor int8: clip(round(x / scale))."""
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


# Default lowering for conv3x3_int8 (scripts/bench_quant.py --conv-impl
# measures both):
#   'dots' - nine shifted-slice s8xs8->s32 dot_generals. Dots reliably
#     hit the MXU int8 path, but each dot re-reads the padded input from
#     HBM (~9x traffic: matters for the 512-channel stem1 input).
#   'conv' - one native lax.conv_general_dilated(s8, s8)->s32. Reads the
#     input once; wins IF XLA:TPU lowers s8 convolutions at the int8 MXU
#     rate instead of silently upcasting.
# Both are exact integer math (the unit test pins them equal). The
# lowering actually used at serving time is CAPTURED into the quant
# pytree at quantize_* time (qparams['impl']) - a module global read at
# trace time would not retrace already-jitted serving functions when
# flipped, and is not thread-safe (advisor round 3).
#
# Default set FROM MEASUREMENT (TPU v5e, 2026-08-18, bench_quant
# batch 16, all modes x both lowerings): 'conv' beats 'dots' by
# ~1.8-2.6x in every quantized mode (flagship head 428.5 vs 184.1 f/s;
# resnet50 head 306.0 vs 156.7, encoder 308.9 vs 173.8, encoder+head
# 275.6 vs 107.8) - the 9x HBM re-read dominates. See
# docs/QUANTIZATION.md "Speed" for the full sweep (including the
# finding that int8 is a memory lever, not a latency lever, on this
# runtime: even the best int8 mode is 11% below float).
CONV_IMPL = "conv"


def conv_int8(
    x_i8: jax.Array,
    w_i8: jax.Array,
    stride: int = 1,
    dilation: int = 1,
    impl: str = None,
) -> jax.Array:
    """Odd-kernel torch-style (symmetric pad = dilation*(K-1)//2)
    convolution in exact int8 arithmetic.

    x_i8 [B,H,W,Cin] int8; w_i8 [KH,KW,Cin,Cout] int8 ->
    [B,Ho,Wo,Cout] int32 with Ho = (H + 2p - (d*(KH-1)+1))//stride + 1.
    ``impl``: 'dots' | 'conv' (default: module CONV_IMPL; see above).
    """
    impl = impl or CONV_IMPL
    KH, KW, Cin, Cout = w_i8.shape
    d, s = dilation, stride
    ph, pw = d * (KH - 1) // 2, d * (KW - 1) // 2
    if impl == "conv":
        return jax.lax.conv_general_dilated(
            x_i8,
            w_i8,
            window_strides=(s, s),
            padding=((ph, ph), (pw, pw)),
            rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
    B, H, W, _ = x_i8.shape
    Ho = (H + 2 * ph - (d * (KH - 1) + 1)) // s + 1
    Wo = (W + 2 * pw - (d * (KW - 1) + 1)) // s + 1
    x_pad = jnp.pad(x_i8, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    acc = jnp.zeros((B, Ho, Wo, Cout), jnp.int32)
    dn = (((3,), (0,)), ((), ()))  # contract x's channel dim with w's Cin
    for dy in range(KH):
        for dx in range(KW):
            xs = jax.lax.slice(
                x_pad,
                (0, dy * d, dx * d, 0),
                (B, dy * d + s * (Ho - 1) + 1, dx * d + s * (Wo - 1) + 1, Cin),
                strides=(1, s, s, 1),
            )
            acc = acc + jax.lax.dot_general(
                xs, w_i8[dy, dx], dn, preferred_element_type=jnp.int32
            )
    return acc


def conv3x3_int8(
    x_i8: jax.Array, w_i8: jax.Array, dilation: int = 1, impl: str = None
) -> jax.Array:
    """Stride-1 3x3 wrapper over :func:`conv_int8` (the detector stem)."""
    return conv_int8(x_i8, w_i8, stride=1, dilation=dilation, impl=impl)


def _group_norm(x: jax.Array, scale: jax.Array, bias: jax.Array) -> jax.Array:
    """flax nn.GroupNorm(num_groups=32, eps=1e-5) twin, f32 math."""
    B, H, W, C = x.shape
    g = x.reshape(B, H, W, _GN_GROUPS, C // _GN_GROUPS)
    mean = jnp.mean(g, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(g - mean), axis=(1, 2, 4), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + _GN_EPS)
    return g.reshape(B, H, W, C) * scale + bias


def _conv3x3_f32(x: jax.Array, kernel: jax.Array, bias: jax.Array) -> jax.Array:
    return (
        jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + bias
    )


def _stem_names() -> List[str]:
    return ["stem0", "stem1", "stem2"]


def _float_stem_inputs(det_params: Dict, bev_feat: jax.Array) -> List[jax.Array]:
    """Run the float stem, returning each conv's INPUT (for calibration)."""
    xs = []
    x = bev_feat.astype(jnp.float32)
    for i, name in enumerate(_stem_names()):
        xs.append(x)
        y = jax.lax.conv_general_dilated(
            x,
            det_params[name]["kernel"].astype(jnp.float32),
            window_strides=(1, 1),
            padding="SAME",
            rhs_dilation=(_STEM_DILATIONS[i], _STEM_DILATIONS[i]),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        gn = det_params[f"GroupNorm_{i}"]
        y = _group_norm(
            y, gn["scale"].astype(jnp.float32), gn["bias"].astype(jnp.float32)
        )
        x = jax.nn.relu(y)
    return xs


def quantize_head(
    det_params: Dict,
    calib_feats: Sequence[jax.Array],
    clip_percentile: float = 99.99,
    conv_impl: str = None,
) -> Dict:
    """Build int8 serving params for the detector head.

    det_params: the trained head's param subtree
    (``variables['params']['detector']``). calib_feats: a few
    representative ``bev_feat`` tensors [B,H,W,C] (the model's own
    output on real or synthetic frames); activation scales are the
    ``clip_percentile`` of |x| at each stem conv input across the set.

    Returns a pytree closable into a jitted serving function:
    ``{'stems': [{w_i8, w_scale, x_scale, gn_scale, gn_bias} x3],
    'out': {name: {kernel, bias} for the three float output convs},
    'impl': the conv lowering ('dots'|'conv', captured here so a jitted
    serving function can never silently mix lowerings)}``.
    """
    assert len(calib_feats) > 0, "need at least one calibration batch"
    names = _stem_names()

    # per-batch |x| percentile at each stem input, computed ON DEVICE
    # (one jitted pass per batch; pooling raveled host copies would cost
    # ~GBs at flagship shapes), then max across batches - a conservative
    # upper envelope of the per-pool percentile
    @jax.jit
    def _calib(feat):
        return [
            jnp.percentile(jnp.abs(x.astype(jnp.float32)), clip_percentile)
            for x in _float_stem_inputs(det_params, feat)
        ]

    amaxes = [0.0, 0.0, 0.0]
    for feat in calib_feats:
        for i, v in enumerate(_calib(jnp.asarray(feat))):
            amaxes[i] = max(amaxes[i], float(v))
    stems = []
    for i, name in enumerate(names):
        amax = amaxes[i]
        w_i8, w_scale = quantize_weight_per_cout(
            det_params[name]["kernel"].astype(jnp.float32)
        )
        gn = det_params[f"GroupNorm_{i}"]
        stems.append(
            {
                "w_i8": w_i8,
                "w_scale": w_scale,
                "x_scale": jnp.float32(max(amax, 1e-8) / 127.0),
                "gn_scale": gn["scale"].astype(jnp.float32),
                "gn_bias": gn["bias"].astype(jnp.float32),
            }
        )
    out = {
        name: {
            "kernel": det_params[name]["kernel"].astype(jnp.float32),
            "bias": det_params[name]["bias"].astype(jnp.float32),
        }
        for name in ("heatmap_head", "offset_head", "size_head")
    }
    return {"stems": stems, "out": out, "impl": conv_impl or CONV_IMPL}


def apply_quant_head(qparams: Dict, bev_feat: jax.Array) -> Dict[str, jax.Array]:
    """int8-stem twin of ``BEVDetectorHead.__call__`` (same output dict)."""
    impl = qparams.get("impl")  # captured at quantize_head time
    x = bev_feat.astype(jnp.float32)
    for i, qs in enumerate(qparams["stems"]):
        x_i8 = quantize_act(x, qs["x_scale"])
        y = conv3x3_int8(x_i8, qs["w_i8"], dilation=_STEM_DILATIONS[i], impl=impl)
        # dequantize: one fused elementwise rescale into the GroupNorm
        y = y.astype(jnp.float32) * (qs["x_scale"] * qs["w_scale"])
        y = _group_norm(y, qs["gn_scale"], qs["gn_bias"])
        x = jax.nn.relu(y)
    out = qparams["out"]
    heatmap_logits = _conv3x3_f32(x, out["heatmap_head"]["kernel"], out["heatmap_head"]["bias"])
    offset_raw = _conv3x3_f32(x, out["offset_head"]["kernel"], out["offset_head"]["bias"])
    size_raw = _conv3x3_f32(x, out["size_head"]["kernel"], out["size_head"]["bias"])
    return {
        "heatmap_logits": heatmap_logits,
        "heatmap": jax.nn.sigmoid(heatmap_logits),
        "offset_raw": offset_raw,
        "offset": jax.nn.sigmoid(offset_raw),
        "size_raw": size_raw,
        "size": jnp.exp(size_raw),
    }
