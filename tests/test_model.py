import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vsta_tpu.models import BEVNet


def _small_model(**kw):
    defaults = dict(
        backbone="simple",
        feat_dim=8,
        out_index=2,
        views=3,
        bev_size=(16, 32),
        bev_bounds=(-8.0, 8.0, -4.0, 4.0),
        bev_proj_ch=12,
        warp_impl="fused",
        fusion="concat",
    )
    defaults.update(kw)
    return BEVNet(**defaults)


def _batch(rng, B=1, V=3, H=48, W=64):
    import sys

    sys.path.insert(0, "tests")
    from conftest import make_camera

    imgs = jnp.array(rng.standard_normal((B, V, H, W, 3)).astype(np.float32))
    Ks, Rts = zip(*(make_camera(v, V, radius=10.0, height=4.0, img_hw=(H, W)) for v in range(V)))
    K = jnp.array(np.broadcast_to(np.stack(Ks), (B, V, 3, 3)))
    Rt = jnp.array(np.broadcast_to(np.stack(Rts), (B, V, 4, 4)))
    return imgs, K, Rt


def test_forward_shapes(rng):
    model = _small_model()
    imgs, K, Rt = _batch(rng)
    variables = model.init(jax.random.PRNGKey(0), imgs, K, Rt)
    out = model.apply(variables, imgs, K, Rt)
    assert out["heatmap"].shape == (1, 16, 32, 1)
    assert out["offset"].shape == (1, 16, 32, 2)
    assert out["size"].shape == (1, 16, 32, 2)
    assert out["bev_feat"].shape == (1, 16, 32, 14)  # proj_ch + 2 pos-enc


def test_fused_and_gather_paths_agree(rng):
    """warp_impl='fused' (proj-then-warp) and 'gather' (warp-concat-proj)
    share parameters and must produce the same outputs."""
    imgs, K, Rt = _batch(rng)
    m_fused = _small_model(warp_impl="fused")
    m_gather = _small_model(warp_impl="gather")
    variables = m_fused.init(jax.random.PRNGKey(0), imgs, K, Rt)
    out_f = m_fused.apply(variables, imgs, K, Rt)
    out_g = m_gather.apply(variables, imgs, K, Rt)
    np.testing.assert_allclose(
        np.asarray(out_f["heatmap"]), np.asarray(out_g["heatmap"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_f["bev_feat"]), np.asarray(out_g["bev_feat"]), atol=1e-4
    )


def test_centernet_init_heatmap_prior(rng):
    """With CenterNet init the initial heatmap should be ~sigmoid(-2.19)=0.1."""
    model = _small_model()
    imgs, K, Rt = _batch(rng)
    variables = model.init(jax.random.PRNGKey(0), imgs, K, Rt)
    out = model.apply(variables, imgs, K, Rt)
    hm = np.asarray(out["heatmap"])
    assert 0.02 < hm.mean() < 0.3
    # offset head zero-init -> sigmoid = 0.5 everywhere
    np.testing.assert_allclose(np.asarray(out["offset"]), 0.5, atol=1e-6)


@pytest.mark.parametrize("fusion", ["mean", "max", "attn"])
def test_alternative_fusions(rng, fusion):
    model = _small_model(fusion=fusion, warp_impl="gather")
    imgs, K, Rt = _batch(rng)
    variables = model.init(jax.random.PRNGKey(0), imgs, K, Rt)
    out = model.apply(variables, imgs, K, Rt)
    assert out["heatmap"].shape == (1, 16, 32, 1)
    assert np.isfinite(np.asarray(out["heatmap"])).all()


def test_resnet18_encoder_stride8(rng):
    model = _small_model(backbone="resnet18", feat_dim=16)
    imgs, K, Rt = _batch(rng, H=64, W=64)
    variables = model.init(jax.random.PRNGKey(0), imgs, K, Rt)
    assert "batch_stats" in variables
    out = model.apply(variables, imgs, K, Rt)
    assert np.isfinite(np.asarray(out["heatmap"])).all()


def test_bf16_amp_forward(rng):
    model = _small_model(dtype=jnp.bfloat16)
    imgs, K, Rt = _batch(rng)
    variables = model.init(jax.random.PRNGKey(0), imgs, K, Rt)
    out = model.apply(variables, imgs, K, Rt)
    # heads are cast back to f32
    assert out["heatmap"].dtype == jnp.float32
    assert np.isfinite(np.asarray(out["heatmap"])).all()


def test_uint8_input_matches_host_normalized(rng):
    """DATA.DEVICE_NORMALIZE: feeding raw uint8 must equal feeding the
    host-normalized float of the same image (normalize folded into jit)."""
    from vsta_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    model = _small_model()
    _, K, Rt = _batch(rng)
    u8 = rng.integers(0, 256, (1, 3, 48, 64, 3), dtype=np.uint8)
    f32 = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(f32), K, Rt)
    out_f = model.apply(variables, jnp.asarray(f32), K, Rt)
    out_u = model.apply(variables, jnp.asarray(u8), K, Rt)
    np.testing.assert_allclose(
        np.asarray(out_u["heatmap"]), np.asarray(out_f["heatmap"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_u["bev_feat"]), np.asarray(out_f["bev_feat"]), atol=1e-4
    )


def test_multiscale_out_index(rng):
    """OUT_INDEX as a tuple selects several pyramid levels: coarser maps
    upsample to the finest selected level and concat before the 1x1 proj
    (BASELINE configs[1] 'multi-scale features with max-fusion variant').
    The full model trains a step on the 2-view max-fusion combination."""
    from vsta_tpu.models.encoders.encoder import ViewEncoder

    # encoder level: resnet18 pyramid levels 1 (stride 4) + 2 (stride 8)
    imgs = jnp.array(rng.standard_normal((2, 2, 32, 48, 3)).astype(np.float32))
    enc_ms = ViewEncoder(backbone="resnet18", feat_dim=8, out_index=(1, 2))
    v = enc_ms.init(jax.random.PRNGKey(0), imgs)
    feat = enc_ms.apply(v, imgs)
    assert feat.shape == (2, 2, 8, 12, 8)  # finest level's (H/4, W/4)

    # single-level output is unchanged by the multi-scale plumbing
    enc_1 = ViewEncoder(backbone="resnet18", feat_dim=8, out_index=2)
    v1 = enc_1.init(jax.random.PRNGKey(0), imgs)
    f1 = enc_1.apply(v1, imgs)
    assert f1.shape == (2, 2, 4, 6, 8)

    # model level: 2-view max fusion over multi-scale features
    model = _small_model(out_index=(1, 2), views=2, fusion="max",
                         backbone="resnet18")
    imgs2, K, Rt = _batch(rng, V=2)
    variables = model.init(jax.random.PRNGKey(0), imgs2, K, Rt)
    out = model.apply(variables, imgs2, K, Rt)
    assert out["heatmap"].shape == (1, 16, 32, 1)
    assert bool(jnp.isfinite(out["heatmap"]).all())
