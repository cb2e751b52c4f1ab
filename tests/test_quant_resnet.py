"""int8 ResNet-encoder quantization (vsta_tpu/ops/quant_resnet.py).

The BN-folded float twin must reproduce the flax backbone exactly; the
int8 twin must track it within PTQ tolerance, standalone and through
the BEVNet serving seam.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsta_tpu.models.encoders.resnet import ResNetFeatures
from vsta_tpu.ops.quant_resnet import (
    _conv_f32,
    _fold_backbone,
    _forward_backbone,
    apply_quant_encoder,
    quantize_encoder,
)


def _backbone_vars(variant, hw=(32, 48), seed=0):
    m = ResNetFeatures(variant=variant)
    x = jnp.asarray(
        np.random.default_rng(seed).standard_normal((2, *hw, 3)), jnp.float32
    )
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    # non-trivial BN stats (init is mean 0 / var 1, which would make the
    # fold a no-op and hide sign/ordering bugs)
    rng = np.random.default_rng(seed + 1)
    stats = jax.tree_util.tree_map(
        lambda t: jnp.asarray(
            np.abs(rng.standard_normal(t.shape)) * 0.5 + 0.5, jnp.float32
        ),
        v["batch_stats"],
    )
    return m, {"params": v["params"], "batch_stats": stats}, x


@pytest.mark.parametrize("variant", ["resnet18", "resnet50"])
def test_folded_float_twin_matches_flax(variant):
    m, v, x = _backbone_vars(variant)
    ref = m.apply(v, x, train=False)
    folded = _fold_backbone(variant, v["params"], v["batch_stats"])

    def site(key, xin, stride, ksize):
        w, b = folded[key]
        return _conv_f32(xin.astype(jnp.float32), w, stride, ksize) + b

    got = _forward_backbone(variant, x, site, lambda k: k in folded)
    assert len(got) == len(ref) == 5
    for lvl, (g, r) in enumerate(zip(got, ref)):
        assert g.shape == r.shape, (lvl, g.shape, r.shape)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=2e-4, err_msg=f"level {lvl}"
        )


def test_quantized_encoder_tracks_float(tmp_path):
    from vsta_tpu.models.encoders.encoder import ViewEncoder

    B, V, H, W = 1, 2, 32, 48
    enc = ViewEncoder(backbone="resnet18", feat_dim=8, out_index=2, fold_proj=False)
    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.standard_normal((B, V, H, W, 3)), jnp.float32)
    v = enc.init(jax.random.PRNGKey(0), images, train=False)
    # realistic BN stats as above
    stats = jax.tree_util.tree_map(
        lambda t: jnp.asarray(
            np.abs(np.random.default_rng(4).standard_normal(t.shape)) * 0.5 + 0.5,
            jnp.float32,
        ),
        v["batch_stats"],
    )
    v = {"params": v["params"], "batch_stats": stats}
    ref = enc.apply(v, images, train=False)

    flat = images.reshape(B * V, H, W, 3)
    qe = quantize_encoder(
        "resnet18", v["params"], v["batch_stats"], [flat], 2, False
    )
    got = apply_quant_encoder(qe, images)
    assert got.shape == ref.shape
    # per-tensor int8 across ~20 folded convs: loose-but-meaningful bound
    scale = float(jnp.std(ref)) + 1e-6
    err = float(jnp.max(jnp.abs(got - ref))) / scale
    assert err < 0.35, err


def test_bevnet_quant_encoder_seam():
    from vsta_tpu.config import (
        Config,
        DataConfig,
        EvalConfig,
        LossConfig,
        ModelConfig,
        RuntimeConfig,
        TrainConfig,
    )
    from vsta_tpu.data.synthetic import make_ring_camera
    from vsta_tpu.export import calibrate_quant_encoder, calibrate_quant_head
    from vsta_tpu.models import BEVNet

    cfg = Config(
        data=DataConfig(batch_size=1, img_size=(32, 48), views=2, data_root=""),
        model=ModelConfig(
            backbone="resnet18", feat_dim=16, out_index=2,
            bev_size=(16, 32), bev_bounds=(-8.0, 8.0, -4.0, 4.0),
            bev_proj_ch=16, warp_impl="fused", fusion="concat",
            head_mid1=32, head_mid2=32,
        ),
        train=TrainConfig(epochs=1),
        loss=LossConfig(max_objects=8),
        runtime=RuntimeConfig(use_amp=False),
        eval=EvalConfig(conf_thresh=0.05, max_dets=8),
    )
    model = BEVNet.from_config(cfg)
    B, V = 1, 2
    H, W = cfg.data.img_size
    rng = np.random.default_rng(5)
    images = jnp.asarray(rng.standard_normal((B, V, H, W, 3)), jnp.float32)
    Ks, Rts = zip(*(make_ring_camera(v, V, img_hw=(H, W), radius=8.0, height=3.0)
                    for v in range(V)))
    K = jnp.asarray(np.stack(Ks), jnp.float32)[None]
    Rt = jnp.asarray(np.stack(Rts), jnp.float32)[None]
    variables = model.init(jax.random.PRNGKey(0), images, K, Rt, train=False)

    ref = model.apply(variables, images, K, Rt, train=False)
    qe = calibrate_quant_encoder(cfg, variables, [(images, K, Rt)])
    qh = calibrate_quant_head(cfg, variables, [(images, K, Rt)], quant_encoder=qe)
    got = model.apply(
        variables, images, K, Rt, train=False,
        quant_encoder=qe, quant_head=qh,
    )
    assert set(got.keys()) == set(ref.keys())
    err = float(jnp.max(jnp.abs(got["heatmap"] - ref["heatmap"])))
    assert err < 0.15, err
    # jit-compiles with both quant pytrees closed over
    fn = jax.jit(lambda v, i, k, r: model.apply(
        v, i, k, r, train=False, quant_encoder=qe, quant_head=qh))
    out_j = fn(variables, images, K, Rt)
    np.testing.assert_allclose(
        np.asarray(out_j["heatmap"]), np.asarray(got["heatmap"]), atol=1e-5
    )


def test_conv_int8_strided_exact():
    from vsta_tpu.ops.quant import conv_int8

    rng = np.random.default_rng(7)
    for K, stride in ((3, 2), (1, 2), (7, 2), (3, 1)):
        x = jnp.asarray(rng.integers(-127, 128, (2, 10, 14, 5)), jnp.int8)
        w = jnp.asarray(rng.integers(-127, 128, (K, K, 5, 6)), jnp.int8)
        for impl in ("dots", "conv"):
            got = conv_int8(x, w, stride=stride, impl=impl)
            p = (K - 1) // 2
            ref = jax.lax.conv_general_dilated(
                x.astype(jnp.int32), w.astype(jnp.int32), (stride, stride),
                ((p, p), (p, p)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            np.testing.assert_array_equal(
                np.asarray(got), np.asarray(ref),
                err_msg=f"K={K} s={stride} impl={impl}",
            )
