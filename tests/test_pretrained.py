"""Pretrained torch-weights conversion + backbone freezing
(reference surface: ViewEncoder.load_pretrained / .freeze,
project/models/encoders/base.py:17-28; timm pretrained backbones,
cnn_encoder.py:26-29)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vsta_tpu.models.encoders.pretrained import convert_torch_resnet
from vsta_tpu.models.encoders.resnet import ResNetFeatures


def _torch_style_resnet18_sd(rng):
    """Random tensors with torchvision resnet18 key names and shapes."""
    sd = {}

    def bn(prefix, n):
        sd[f"{prefix}.weight"] = rng.standard_normal(n).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.standard_normal(n).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.standard_normal(n).astype(np.float32) * 0.1
        sd[f"{prefix}.running_var"] = np.abs(rng.standard_normal(n)).astype(np.float32) + 0.5

    sd["conv1.weight"] = rng.standard_normal((64, 3, 7, 7)).astype(np.float32) * 0.05
    bn("bn1", 64)
    widths, blocks = [64, 128, 256, 512], [2, 2, 2, 2]
    in_ch = 64
    for i, (w, nb) in enumerate(zip(widths, blocks)):
        for j in range(nb):
            pre = f"layer{i + 1}.{j}"
            c_in = in_ch if j == 0 else w
            sd[f"{pre}.conv1.weight"] = rng.standard_normal((w, c_in, 3, 3)).astype(np.float32) * 0.05
            bn(f"{pre}.bn1", w)
            sd[f"{pre}.conv2.weight"] = rng.standard_normal((w, w, 3, 3)).astype(np.float32) * 0.05
            bn(f"{pre}.bn2", w)
            if j == 0 and i > 0:  # torchvision: downsample when shape changes
                sd[f"{pre}.downsample.0.weight"] = rng.standard_normal((w, c_in, 1, 1)).astype(np.float32) * 0.05
                bn(f"{pre}.downsample.1", w)
        in_ch = w
    sd["fc.weight"] = rng.standard_normal((1000, 512)).astype(np.float32)  # ignored
    sd["fc.bias"] = rng.standard_normal(1000).astype(np.float32)
    return sd


def test_convert_resnet18_covers_whole_tree(rng):
    sd = _torch_style_resnet18_sd(rng)
    params, stats = convert_torch_resnet(sd, "resnet18")

    model = ResNetFeatures(variant="resnet18")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    ref_p = variables["params"]
    ref_s = variables["batch_stats"]

    import flax.traverse_util as tu

    flat_ref_p = tu.flatten_dict(ref_p)
    flat_new_p = tu.flatten_dict(params)
    assert set(flat_new_p) == set(flat_ref_p), (
        f"missing: {set(flat_ref_p) - set(flat_new_p)}; "
        f"extra: {set(flat_new_p) - set(flat_ref_p)}"
    )
    for k, v in flat_new_p.items():
        assert tuple(v.shape) == tuple(flat_ref_p[k].shape), (k, v.shape, flat_ref_p[k].shape)

    flat_ref_s = tu.flatten_dict(ref_s)
    flat_new_s = tu.flatten_dict(stats)
    assert set(flat_new_s) == set(flat_ref_s)

    # converted weights actually run
    out = model.apply({"params": params, "batch_stats": stats}, jnp.ones((1, 64, 96, 3)))
    assert out[2].shape[-1] == 128  # stride-8 level of resnet18
    assert bool(jnp.all(jnp.isfinite(out[2])))


def test_conv_kernel_transposed_correctly(rng):
    sd = _torch_style_resnet18_sd(rng)
    params, _ = convert_torch_resnet(sd, "resnet18")
    # OIHW -> HWIO: element [o,i,h,w] lands at [h,w,i,o]
    torch_w = sd["conv1.weight"]
    flax_w = params["stem_conv"]["kernel"]
    assert flax_w.shape == (7, 7, 3, 64)
    np.testing.assert_allclose(flax_w[2, 3, 1, 5], torch_w[5, 1, 2, 3])


def test_freeze_backbone_blocks_updates():
    from vsta_tpu.config import Config, DataConfig, ModelConfig, TrainConfig, RuntimeConfig
    from vsta_tpu.training.optim import build_optimizer
    from vsta_tpu.training.state import create_state, make_train_step
    from test_train_step import make_batch

    cfg = Config(
        data=DataConfig(batch_size=2, img_size=(48, 64), views=2, data_root=""),
        model=ModelConfig(
            backbone="resnet18",
            feat_dim=16,
            out_index=1,
            bev_size=(12, 24),
            bev_bounds=(-6.0, 6.0, -3.0, 3.0),
            bev_proj_ch=16,
        ),
        train=TrainConfig(epochs=1, freeze_backbone=True),
        runtime=RuntimeConfig(use_amp=False),
    )
    batch = make_batch(cfg)
    tx = build_optimizer(cfg, steps_per_epoch=10)
    state = create_state(cfg, tx, jax.random.PRNGKey(0))
    bb_before = jax.tree.map(np.asarray, state.params["encoder"]["backbone"])
    step = jax.jit(make_train_step(cfg))
    for _ in range(2):
        state, _ = step(state, batch)
    bb_after = state.params["encoder"]["backbone"]
    import flax.traverse_util as tu

    flat_before = tu.flatten_dict(bb_before)
    flat_after = tu.flatten_dict(bb_after)
    assert set(flat_before) == set(flat_after)
    for k in flat_before:
        np.testing.assert_array_equal(np.asarray(flat_before[k]), np.asarray(flat_after[k]))
    # but the head did train
    hm_kernel_0 = create_state(cfg, tx, jax.random.PRNGKey(0)).params["detector"]
    moved = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.sum(jnp.abs(x))),
        jax.tree.map(
            lambda a, b: jnp.asarray(a) - jnp.asarray(b),
            state.params["detector"],
            hm_kernel_0,
        ),
        0.0,
    )
    assert moved > 0.0
