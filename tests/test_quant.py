"""int8 head quantization (vsta_tpu/ops/quant.py).

The int conv formulation must be EXACT (integer math); the end-to-end
quantized head must track the float head within PTQ tolerance, both
standalone and through the BEVNet serving seam.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsta_tpu.ops.quant import (
    _group_norm,
    apply_quant_head,
    conv3x3_int8,
    quantize_act,
    quantize_head,
    quantize_weight_per_cout,
)


def _rand_i8(rng, shape):
    return jnp.asarray(rng.integers(-127, 128, shape), jnp.int8)


@pytest.mark.parametrize("impl", ["dots", "conv"])
@pytest.mark.parametrize("dilation", [1, 2])
def test_conv3x3_int8_exact_vs_xla_conv(dilation, impl):
    rng = np.random.default_rng(0)
    x = _rand_i8(rng, (2, 9, 11, 6))
    w = _rand_i8(rng, (3, 3, 6, 8))
    got = conv3x3_int8(x, w, dilation=dilation, impl=impl)
    ref = jax.lax.conv_general_dilated(
        x.astype(jnp.int32),
        w.astype(jnp.int32),
        window_strides=(1, 1),
        padding="SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_group_norm_matches_flax():
    from flax import linen as nn

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 5, 7, 64)), jnp.float32)
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5)
    v = gn.init(jax.random.PRNGKey(0), x)
    # non-trivial scale/bias
    scale = jnp.asarray(rng.standard_normal(64), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(64), jnp.float32)
    v = {"params": {"scale": scale, "bias": bias}}
    ref = gn.apply(v, x)
    got = _group_norm(x, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_weight_quant_roundtrip_error_bounded():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 24)) * 0.1, jnp.float32)
    wq, scale = quantize_weight_per_cout(w)
    deq = wq.astype(jnp.float32) * scale
    # per-channel absmax/127 quantization: error <= scale/2 per element
    err = np.abs(np.asarray(deq - w))
    bound = np.asarray(scale)[None, None, None, :] * 0.5 + 1e-7
    assert (err <= bound).all()


def _tiny_head_params(rng, cin=34, mid1=64, mid2=32):
    """Random-but-realistic head params (32-divisible widths for GN)."""

    def k(*shape, s=0.05):
        return jnp.asarray(rng.standard_normal(shape) * s, jnp.float32)

    return {
        "stem0": {"kernel": k(3, 3, cin, mid1)},
        "stem1": {"kernel": k(3, 3, mid1, mid2)},
        "stem2": {"kernel": k(3, 3, mid2, mid2)},
        "GroupNorm_0": {"scale": 1.0 + 0.1 * k(mid1, s=1.0), "bias": 0.1 * k(mid1, s=1.0)},
        "GroupNorm_1": {"scale": 1.0 + 0.1 * k(mid2, s=1.0), "bias": 0.1 * k(mid2, s=1.0)},
        "GroupNorm_2": {"scale": 1.0 + 0.1 * k(mid2, s=1.0), "bias": 0.1 * k(mid2, s=1.0)},
        "heatmap_head": {"kernel": k(3, 3, mid2, 1), "bias": jnp.full((1,), -2.19)},
        "offset_head": {"kernel": jnp.zeros((3, 3, mid2, 2)), "bias": jnp.zeros((2,))},
        "size_head": {"kernel": k(3, 3, mid2, 2), "bias": jnp.asarray([1.5, 1.5])},
    }


def _float_head(det_params, x):
    """Float oracle mirroring BEVDetectorHead on the same param tree."""
    dil = (1, 2, 1)
    y = x.astype(jnp.float32)
    for i, name in enumerate(("stem0", "stem1", "stem2")):
        y = jax.lax.conv_general_dilated(
            y,
            det_params[name]["kernel"],
            window_strides=(1, 1),
            padding="SAME",
            rhs_dilation=(dil[i], dil[i]),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        gn = det_params[f"GroupNorm_{i}"]
        y = _group_norm(y, gn["scale"], gn["bias"])
        y = jax.nn.relu(y)
    outs = {}
    for name in ("heatmap_head", "offset_head", "size_head"):
        outs[name] = (
            jax.lax.conv_general_dilated(
                y,
                det_params[name]["kernel"],
                window_strides=(1, 1),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + det_params[name]["bias"]
        )
    return outs


def test_quantized_head_tracks_float_head():
    rng = np.random.default_rng(3)
    params = _tiny_head_params(rng)
    calib = [jnp.asarray(rng.standard_normal((2, 8, 12, 34)), jnp.float32) for _ in range(3)]
    qp = quantize_head(params, calib)
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 34)), jnp.float32)
    got = apply_quant_head(qp, x)
    ref = _float_head(params, x)
    # PTQ tolerance: logits live on an O(1) scale after GN
    err_hm = float(jnp.max(jnp.abs(got["heatmap_logits"] - ref["heatmap_head"])))
    err_sz = float(jnp.max(jnp.abs(got["size_raw"] - ref["size_head"])))
    assert err_hm < 0.15, err_hm
    assert err_sz < 0.15, err_sz
    # probabilities after sigmoid are even tighter
    err_p = float(jnp.max(jnp.abs(got["heatmap"] - jax.nn.sigmoid(ref["heatmap_head"]))))
    assert err_p < 0.05, err_p


def test_bevnet_quant_head_seam():
    """model.apply(..., quant_head=qp) must agree with the float model."""
    from vsta_tpu.data.synthetic import make_ring_camera
    from vsta_tpu.models import BEVNet

    B, V, H, W = 1, 2, 48, 64
    model = BEVNet(
        backbone="simple",
        feat_dim=16,
        out_index=1,
        views=V,
        bev_size=(16, 32),
        bev_bounds=(-8.0, 8.0, -4.0, 4.0),
        bev_proj_ch=32,
        head_mid1=64,
        head_mid2=32,
        warp_impl="fused",
    )
    rng = np.random.default_rng(4)
    images = jnp.asarray(rng.standard_normal((B, V, H, W, 3)), jnp.float32)
    Ks, Rts = zip(*(make_ring_camera(v, V, img_hw=(H, W), radius=8.0, height=3.0) for v in range(V)))
    K = jnp.asarray(np.stack(Ks), jnp.float32)[None]
    Rt = jnp.asarray(np.stack(Rts), jnp.float32)[None]
    variables = model.init(jax.random.PRNGKey(0), images, K, Rt, train=False)

    ref = model.apply(variables, images, K, Rt, train=False)
    qp = quantize_head(variables["params"]["detector"], [ref["bev_feat"]])
    got = model.apply(variables, images, K, Rt, train=False, quant_head=qp)

    assert set(got.keys()) == set(ref.keys())
    err = float(jnp.max(jnp.abs(got["heatmap"] - ref["heatmap"])))
    assert err < 0.05, err
    # jit-compiles with the quant pytree closed over (the serving shape)
    fn = jax.jit(lambda v, i, k, r: model.apply(v, i, k, r, train=False, quant_head=qp))
    out_j = fn(variables, images, K, Rt)
    np.testing.assert_allclose(
        np.asarray(out_j["heatmap"]), np.asarray(got["heatmap"]), atol=1e-5
    )


def test_quantize_act_clips_and_rounds():
    scale = jnp.float32(0.1)
    x = jnp.asarray([0.0, 0.06, -0.04, 100.0, -100.0], jnp.float32)
    q = quantize_act(x, scale)
    np.testing.assert_array_equal(np.asarray(q), [0, 1, 0, 127, -127])
