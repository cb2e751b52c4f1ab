import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from vsta_tpu.geometry import ground_grid, bev_sample_coords
from vsta_tpu.ops.warp import (
    bilinear_sample,
    warp_views,
    warp_views_lut,
    precompute_warp_lut,
    fused_warp_proj,
)

BOUNDS = (-24.0, 24.0, -7.2, 7.2)
IMG = (270, 480)
FEAT = (34, 60)
BEV = (40, 120)


def _torch_reference_warp(feats_nchw, Ks, Rts, img_size, bev_grid_np):
    """Oracle replicating the reference's grid_sample warp path
    (project/models/fusion/geometry.py:142-162) from its specification:
    project BEV cell centers through H = K @ [r1 r2 t], rescale pixel
    coords to feature space, normalize with (x + 0.5)/W * 2 - 1, then
    grid_sample(bilinear, zeros, align_corners=False)."""
    B, V, C, Hf, Wf = feats_nchw.shape
    H_img, W_img = img_size
    Hb, Wb, _ = bev_grid_np.shape
    out = torch.zeros(B, V, C, Hb, Wb)
    for b in range(B):
        for v in range(V):
            K = torch.tensor(Ks[v][:3, :3])
            R = torch.tensor(Rts[v][:3, :3])
            t = torch.tensor(Rts[v][:3, 3:4])
            Hmat = K @ torch.cat([R[:, 0:1], R[:, 1:2], t], dim=1)
            g = torch.tensor(bev_grid_np.reshape(-1, 3).T, dtype=torch.float32)
            uvw = Hmat @ g
            w = uvw[2:3]
            w_safe = torch.where(w.abs() < 1e-6, torch.ones_like(w), w)
            u = uvw[0:1] / w_safe
            vv = uvw[1:2] / w_safe
            pts = torch.stack([u[0], vv[0]], dim=1).reshape(Hb, Wb, 2)
            pts[..., 0] *= Wf / float(W_img)
            pts[..., 1] *= Hf / float(H_img)
            norm = pts.clone()
            norm[..., 0] = (norm[..., 0] + 0.5) / Wf * 2.0 - 1.0
            norm[..., 1] = (norm[..., 1] + 0.5) / Hf * 2.0 - 1.0
            sampled = F.grid_sample(
                feats_nchw[b, v].unsqueeze(0),
                norm.unsqueeze(0),
                mode="bilinear",
                padding_mode="zeros",
                align_corners=False,
            )
            out[b, v] = sampled.squeeze(0)
    return out


def test_warp_matches_torch_grid_sample(rng, cameras):
    Ks, Rts = cameras
    B, V, C = 2, 7, 8
    feats = rng.standard_normal((B, V, FEAT[0], FEAT[1], C)).astype(np.float32)
    grid = ground_grid(BEV[0], BEV[1], BOUNDS)
    coords = bev_sample_coords(
        jnp.array(Ks)[None].repeat(B, 0),
        jnp.array(Rts)[None].repeat(B, 0),
        IMG,
        FEAT,
        grid,
    )
    ours = np.asarray(warp_views(jnp.array(feats), coords))  # [B,V,Hb,Wb,C]

    feats_t = torch.tensor(feats).permute(0, 1, 4, 2, 3).contiguous()
    ref = _torch_reference_warp(feats_t, Ks, Rts, IMG, np.asarray(grid))
    ref_np = ref.permute(0, 1, 3, 4, 2).numpy()

    np.testing.assert_allclose(ours, ref_np, atol=2e-4, rtol=1e-3)


def test_bilinear_sample_exact_grid_points(rng):
    feat = jnp.array(rng.standard_normal((8, 10, 4)).astype(np.float32))
    # sampling exactly at integer pixel coords returns the pixel value
    coords = jnp.array([[3.0, 2.0], [0.0, 0.0], [9.0, 7.0]])
    out = bilinear_sample(feat, coords)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(feat[2, 3]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(feat[0, 0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(feat[7, 9]), atol=1e-6)


def test_bilinear_sample_zero_padding(rng):
    feat = jnp.array(rng.standard_normal((8, 10, 4)).astype(np.float32))
    out = bilinear_sample(feat, jnp.array([[-5.0, 2.0], [3.0, 100.0], [jnp.nan, 1.0]]))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_bilinear_sample_halfway(rng):
    feat = jnp.array(rng.standard_normal((4, 4, 2)).astype(np.float32))
    out = bilinear_sample(feat, jnp.array([[1.5, 2.0]]))
    expected = 0.5 * (np.asarray(feat[2, 1]) + np.asarray(feat[2, 2]))
    np.testing.assert_allclose(np.asarray(out[0]), expected, atol=1e-6)


def test_lut_warp_equals_direct(rng, cameras):
    Ks, Rts = cameras
    feats = jnp.array(rng.standard_normal((1, 7, FEAT[0], FEAT[1], 8)).astype(np.float32))
    grid = ground_grid(BEV[0], BEV[1], BOUNDS)
    coords = bev_sample_coords(jnp.array(Ks)[None], jnp.array(Rts)[None], IMG, FEAT, grid)
    direct = warp_views(feats, coords)
    idx, wts = precompute_warp_lut(coords, FEAT)
    lut = warp_views_lut(feats, idx, wts)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(lut), atol=1e-5)


def test_fused_warp_proj_equals_concat_then_project(rng, cameras):
    """The flagship algebraic rewrite: warp->concat->1x1conv == proj->warp->sum."""
    Ks, Rts = cameras
    B, V, C, Cout = 2, 7, 8, 16
    feats = jnp.array(rng.standard_normal((B, V, FEAT[0], FEAT[1], C)).astype(np.float32))
    kernel = jnp.array(rng.standard_normal((V, C, Cout)).astype(np.float32) * 0.1)
    bias = jnp.array(rng.standard_normal((Cout,)).astype(np.float32) * 0.1)
    grid = ground_grid(BEV[0], BEV[1], BOUNDS)
    coords = bev_sample_coords(
        jnp.array(Ks)[None].repeat(B, 0), jnp.array(Rts)[None].repeat(B, 0), IMG, FEAT, grid
    )

    # Reference order: warp each view, concat channels, then 1x1 conv.
    import jax

    per_view = warp_views(feats, coords)  # [B,V,Hb,Wb,C]
    ref = (
        jnp.einsum(
            "bvhwc,vco->bhwo", per_view, kernel, precision=jax.lax.Precision.HIGHEST
        )
        + bias
    )

    fused = fused_warp_proj(feats, coords, kernel, bias)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-3, rtol=1e-3)


def test_fused_warp_proj_shared_camera_path_matches(rng, cameras):
    """coords [V,...] (batch-shared cameras, the Wildtrack fast path) must
    equal the per-batch coords [B,V,...] result exactly in semantics."""
    Ks, Rts = cameras
    B, V, C, Cout = 3, 7, 8, 16
    feats = jnp.array(rng.standard_normal((B, V, FEAT[0], FEAT[1], C)).astype(np.float32))
    kernel = jnp.array(rng.standard_normal((V, C, Cout)).astype(np.float32) * 0.1)
    bias = jnp.array(rng.standard_normal((Cout,)).astype(np.float32) * 0.1)
    grid = ground_grid(BEV[0], BEV[1], BOUNDS)
    coords_v = bev_sample_coords(jnp.array(Ks), jnp.array(Rts), IMG, FEAT, grid)
    coords_bv = jnp.broadcast_to(coords_v[None], (B,) + coords_v.shape)

    out_shared = fused_warp_proj(feats, coords_v, kernel, bias)
    out_perb = fused_warp_proj(feats, coords_bv, kernel, bias)
    np.testing.assert_allclose(
        np.asarray(out_shared), np.asarray(out_perb), atol=2e-4, rtol=2e-4
    )

    # also exercise the project-first branch (C_out < C)
    kernel2 = jnp.array(rng.standard_normal((V, C, 4)).astype(np.float32) * 0.1)
    out_shared2 = fused_warp_proj(feats, coords_v, kernel2, None)
    out_perb2 = fused_warp_proj(feats, coords_bv, kernel2, None)
    np.testing.assert_allclose(
        np.asarray(out_shared2), np.asarray(out_perb2), atol=2e-4, rtol=2e-4
    )


def test_bevnet_static_cameras_matches_dynamic(rng, cameras):
    """BEVNet(static_cameras=True) == BEVNet(static_cameras=False) when the
    batch genuinely shares one calibration."""
    import jax
    from vsta_tpu.models import BEVNet

    Ks, Rts = cameras
    B, V = 2, 7
    kwargs = dict(
        backbone="simple",
        feat_dim=8,
        out_index=1,
        views=V,
        bev_size=(12, 24),
        bev_bounds=(-8.0, 8.0, -4.0, 4.0),
        bev_proj_ch=8,
    )
    m_static = BEVNet(static_cameras=True, **kwargs)
    m_dyn = BEVNet(static_cameras=False, **kwargs)
    images = jnp.array(rng.standard_normal((B, V, 48, 64, 3)).astype(np.float32))
    K = jnp.broadcast_to(jnp.array(Ks)[None], (B, V, 3, 3))
    Rt = jnp.broadcast_to(jnp.array(Rts)[None], (B, V, 4, 4))
    vars_ = m_static.init(jax.random.PRNGKey(0), images, K, Rt, train=False)
    out_s = m_static.apply(vars_, images, K, Rt, train=False)
    out_d = m_dyn.apply(vars_, images, K, Rt, train=False)
    np.testing.assert_allclose(
        np.asarray(out_s["heatmap"]), np.asarray(out_d["heatmap"]), atol=1e-4, rtol=1e-3
    )


def test_sample_bilinear_many_coord_gradients(rng):
    """d/d(coords) through the fast-VJP primitive equals the plain
    autodiff of the patch-gather sampler (learned-offset support)."""
    import jax
    from vsta_tpu.ops.warp import bilinear_sample, sample_bilinear_many

    G, Hf, Wf, C, S = 2, 9, 11, 5, 40
    feats = jnp.array(rng.standard_normal((G, Hf, Wf, C)).astype(np.float32))
    coords = jnp.array(
        rng.uniform(0.6, [Wf - 1.6, Hf - 1.6], size=(G, S, 2)).astype(np.float32)
    )

    def loss_fast(c):
        return jnp.sum(sample_bilinear_many(feats, c) ** 2)

    def loss_ref(c):
        return jnp.sum(jax.vmap(bilinear_sample)(feats, c) ** 2)

    g_fast = jax.grad(loss_fast)(coords)
    g_ref = jax.grad(loss_ref)(coords)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref), rtol=1e-3, atol=1e-4)
