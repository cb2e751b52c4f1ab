"""Deformable multi-view BEV fusion (the reference's declared-but-stubbed
attention fusion, project/models/fusion/fusion.py:25-36, made real as
MVDeTr-style deformable cross-attention)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsta_tpu.models.fusion import DeformableFusion, _ring_offset_init


def _make_inputs(rng, B=1, V=3, Hf=8, Wf=12, C=6, Hb=5, Wb=7):
    feats = jnp.asarray(rng.standard_normal((B, V, Hf, Wf, C)), jnp.float32)
    # base coords inside the feature map for all views
    coords = jnp.asarray(
        rng.uniform(1.0, [Wf - 2, Hf - 2], size=(B, V, Hb, Wb, 2)), jnp.float32
    )
    query = jnp.asarray(rng.standard_normal((B, Hb, Wb, 10)), jnp.float32)
    depth_w = jnp.ones((B, V, Hb, Wb), jnp.float32)
    return feats, coords, query, depth_w


def test_scaled_sampler_is_exact_linearity(rng):
    """The attention-folded sampler must equal scale * plain sampling
    exactly (sampling is linear in the tap weights) - the deform module
    relies on this identity (round 5 optimization)."""
    from vsta_tpu.ops.warp import sample_bilinear_many, sample_bilinear_many_scaled

    G, Hf, Wf, C, S = 3, 6, 9, 8, 17
    feats = jnp.asarray(rng.standard_normal((G, Hf, Wf, C)), jnp.float32)
    coords = jnp.asarray(
        np.stack([rng.uniform(-1.5, Wf + 0.5, (G, S)),
                  rng.uniform(-1.5, Hf + 0.5, (G, S))], axis=-1),
        jnp.float32)
    scale = jnp.asarray(rng.standard_normal((G, S)), jnp.float32)
    plain = sample_bilinear_many(feats, coords) * scale[..., None]
    folded = sample_bilinear_many_scaled(feats, coords, scale)
    np.testing.assert_allclose(
        np.asarray(folded), np.asarray(plain), rtol=1e-5, atol=1e-5)
    # gradient flows to the scale (drives the attention weights)
    g = jax.grad(
        lambda s: jnp.sum(sample_bilinear_many_scaled(feats, coords, s))
    )(scale)
    assert float(jnp.max(jnp.abs(g))) > 0.0


def test_ring_init_shape():
    ring = _ring_offset_init(4, 4)
    assert ring.shape == (4, 4, 2)
    # point p of head 0 sits at radius p+1 along +x
    np.testing.assert_allclose(np.asarray(ring)[0, :, 0], [1, 2, 3, 4], atol=1e-6)


def test_output_shape_and_finite(rng):
    feats, coords, query, depth_w = _make_inputs(rng)
    mod = DeformableFusion(heads=2, points=3, out_ch=8)
    vars_ = mod.init(jax.random.PRNGKey(0), feats, coords, query, depth_w)
    out = mod.apply(vars_, feats, coords, query, depth_w)
    assert out.shape == (1, 5, 7, 8)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_behind_camera_view_excluded(rng):
    """A view with depth_w <= 0 must not influence the output."""
    feats, coords, query, depth_w = _make_inputs(rng)
    mod = DeformableFusion(heads=2, points=2, out_ch=8)
    vars_ = mod.init(jax.random.PRNGKey(0), feats, coords, query, depth_w)

    # poison view 0's features; mark it behind-camera
    poisoned = feats.at[:, 0].set(1e6)
    w_mask = depth_w.at[:, 0].set(-1.0)
    out_poisoned = mod.apply(vars_, poisoned, coords, query, w_mask)
    out_clean = mod.apply(vars_, feats, coords, query, w_mask)
    np.testing.assert_allclose(
        np.asarray(out_poisoned), np.asarray(out_clean), rtol=1e-5, atol=1e-5
    )


def test_all_views_invalid_gives_zero(rng):
    feats, coords, query, depth_w = _make_inputs(rng)
    mod = DeformableFusion(heads=2, points=2, out_ch=8)
    vars_ = mod.init(jax.random.PRNGKey(0), feats, coords, query, depth_w)
    out = mod.apply(vars_, feats, coords, query, -jnp.ones_like(depth_w))
    # masked-out cells carry only the out-projection bias of a zeroed input
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_gradients_flow_to_offsets(rng):
    feats, coords, query, depth_w = _make_inputs(rng)
    mod = DeformableFusion(heads=2, points=2, out_ch=8)
    vars_ = mod.init(jax.random.PRNGKey(0), feats, coords, query, depth_w)

    def loss(params):
        out = mod.apply({"params": params}, feats, coords, query, depth_w)
        return jnp.sum(out**2)

    grads = jax.grad(loss)(vars_["params"])
    g_off = grads["offsets"]["kernel"]
    g_attn = grads["attn"]["kernel"]
    assert float(jnp.max(jnp.abs(g_off))) > 0.0
    assert float(jnp.max(jnp.abs(g_attn))) > 0.0


def test_bevnet_deform_attn_forward(rng, cameras):
    from vsta_tpu.models import BEVNet

    Ks, Rts = cameras
    B, V, H, W = 1, 7, 64, 96
    model = BEVNet(
        backbone="simple",
        feat_dim=16,
        out_index=1,
        views=V,
        bev_size=(16, 32),
        bev_bounds=(-8.0, 8.0, -4.0, 4.0),
        bev_proj_ch=16,
        fusion="deform_attn",
        attn_heads=2,
        attn_points=2,
    )
    images = jnp.asarray(rng.standard_normal((B, V, H, W, 3)), jnp.float32)
    K = jnp.asarray(Ks, jnp.float32)[None]
    Rt = jnp.asarray(Rts, jnp.float32)[None]
    vars_ = model.init(jax.random.PRNGKey(0), images, K, Rt, train=False)
    out = model.apply(vars_, images, K, Rt, train=False)
    assert out["heatmap"].shape == (B, 16, 32, 1)
    assert bool(jnp.all(jnp.isfinite(out["heatmap"])))


def test_bevnet_deform_attn_strided(rng, cameras):
    """ATTN_STRIDE > 1 keeps output shapes and stays finite."""
    from vsta_tpu.models import BEVNet

    Ks, Rts = cameras
    B, V = 1, 7
    model = BEVNet(
        backbone="simple",
        feat_dim=16,
        out_index=1,
        views=V,
        bev_size=(16, 32),
        bev_bounds=(-8.0, 8.0, -4.0, 4.0),
        bev_proj_ch=16,
        fusion="deform_attn",
        attn_heads=2,
        attn_points=2,
        attn_stride=4,
    )
    images = jnp.asarray(rng.standard_normal((B, V, 64, 96, 3)), jnp.float32)
    K = jnp.asarray(Ks, jnp.float32)[None]
    Rt = jnp.asarray(Rts, jnp.float32)[None]
    vars_ = model.init(jax.random.PRNGKey(0), images, K, Rt, train=False)
    out = model.apply(vars_, images, K, Rt, train=False)
    assert out["heatmap"].shape == (B, 16, 32, 1)
    assert bool(jnp.all(jnp.isfinite(out["heatmap"])))
