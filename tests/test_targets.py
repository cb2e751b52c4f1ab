import numpy as np
import jax.numpy as jnp

from vsta_tpu.ops.splat import gaussian_radius, draw_gaussians, build_targets

BOUNDS = (-24.0, 24.0, -7.2, 7.2)
BEV = (120, 360)


def _radius_oracle(w, h, min_overlap=0.7, min_radius=2):
    """Reference tensor-variant radius (model_wrapper.py:205-233) in numpy."""
    w = max(w, 1.0)
    h = max(h, 1.0)
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + np.sqrt(max(0.0, b1 * b1 - 4 * c1))) / 2
    a2 = 4.0
    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    r2 = (b2 + np.sqrt(max(0.0, b2 * b2 - 4 * a2 * c2))) / (2 * a2)
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    r3 = (b3 + np.sqrt(max(0.0, b3 * b3 - 4 * a3 * c3))) / (2 * a3)
    return int(np.floor(max(min_radius, min(r1, r2, r3))))


def test_gaussian_radius_matches_oracle():
    for w, h in [(1.0, 1.0), (4.5, 4.5), (10.0, 3.0), (0.5, 0.2), (30.0, 30.0)]:
        got = int(gaussian_radius(jnp.array(w), jnp.array(h)))
        assert got == _radius_oracle(w, h), (w, h)


def _splat_oracle(centers, radii, valid, H, W):
    """Reference _draw_gaussian loop (model_wrapper.py:278-300) in numpy."""
    hm = np.zeros((H, W), np.float32)
    for (gx, gy), r, ok in zip(centers, radii, valid):
        if not ok or r <= 0:
            continue
        if gx < 0 or gy < 0 or gx >= W or gy >= H:
            continue
        sigma = (2 * r + 1) / 6.0
        left, right = min(gx, r), min(W - gx - 1, r)
        top, bottom = min(gy, r), min(H - gy - 1, r)
        ys = np.arange(-top, bottom + 1)
        xs = np.arange(-left, right + 1)
        yy, xx = np.meshgrid(ys, xs, indexing="ij")
        g = np.exp(-(xx**2 + yy**2) / (2 * sigma * sigma))
        patch = hm[gy - top : gy + bottom + 1, gx - left : gx + right + 1]
        np.maximum(patch, g, out=patch)
    return hm


def test_draw_gaussians_matches_reference_loop():
    rng = np.random.default_rng(3)
    H, W = 40, 60
    N = 12
    centers = np.stack(
        [rng.integers(0, W, N), rng.integers(0, H, N)], axis=-1
    ).astype(np.int32)
    radii = rng.integers(1, 6, N).astype(np.int32)
    valid = rng.uniform(size=N) > 0.2
    ours = np.asarray(
        draw_gaussians(jnp.array(centers), jnp.array(radii), jnp.array(valid), (H, W))
    )
    oracle = _splat_oracle(centers, radii, valid, H, W)
    np.testing.assert_allclose(ours, oracle, atol=1e-6)


def test_draw_gaussians_center_is_one():
    hm = np.asarray(
        draw_gaussians(jnp.array([[30, 20]]), jnp.array([3]), jnp.array([True]), (40, 60))
    )
    assert hm[20, 30] == 1.0
    assert hm.max() == 1.0


def test_build_targets_basic():
    boxes = np.zeros((2, 8, 4), np.float32)
    boxes[0, 0] = [0.0, 0.0, 0.6, 0.6]
    boxes[0, 1] = [100.0, 0.0, 0.6, 0.6]  # out of bounds -> masked
    boxes[1, 0] = [-23.9, -7.1, 0.6, 0.6]
    t = build_targets(
        jnp.array(boxes), jnp.array([2, 1]), bounds=BOUNDS, bev_hw=BEV
    )
    assert t["heatmap"].shape == (2, 120, 360, 1)
    mask = np.asarray(t["mask"])
    assert mask[0, 0] == 1.0 and mask[0, 1] == 0.0 and mask[1, 0] == 1.0
    # center of BEV: x=0 -> cell 180, y=0 -> cell 60
    idx = int(np.asarray(t["indices"])[0, 0])
    assert idx == 60 * 360 + 180
    hm = np.asarray(t["heatmap"])[0, :, :, 0]
    assert hm[60, 180] == 1.0
    # offset is fractional cell position
    off = np.asarray(t["offset"])[0, 0]
    assert 0.0 <= off[0] < 1.0 and 0.0 <= off[1] < 1.0
    # size_log = log(0.6 / res)
    res_x = 48.0 / 360.0
    np.testing.assert_allclose(
        np.asarray(t["size_log"])[0, 0, 0], np.log(0.6 / res_x), rtol=1e-5
    )


def test_build_targets_respects_num_boxes():
    boxes = np.zeros((1, 4, 4), np.float32)
    boxes[0, :, :2] = [[0, 0], [1, 1], [2, 2], [3, 3]]
    boxes[0, :, 2:] = 0.6
    t = build_targets(jnp.array(boxes), jnp.array([2]), bounds=BOUNDS, bev_hw=BEV)
    mask = np.asarray(t["mask"])[0]
    np.testing.assert_array_equal(mask, [1, 1, 0, 0])
