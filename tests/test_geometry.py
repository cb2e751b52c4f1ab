import numpy as np
import jax.numpy as jnp

from vsta_tpu.geometry import (
    rodrigues,
    compute_homography,
    invert_homography,
    project_points,
    pixel_to_world,
    ground_grid,
    meters_to_bev_indices,
    bev_indices_to_meters,
    bev_sample_coords,
)

BOUNDS = (-24.0, 24.0, -7.2, 7.2)


def test_rodrigues_identity():
    R = rodrigues(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)


def test_rodrigues_is_rotation():
    rv = jnp.array([0.3, -0.5, 1.2])
    R = np.asarray(rodrigues(rv))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=2e-3)
    assert np.isclose(np.linalg.det(R), 1.0, atol=2e-3)
    # rotation angle equals |rvec|
    angle = np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1))
    assert np.isclose(angle, float(jnp.linalg.norm(rv)), atol=1e-2)


def test_homography_projects_ground_points(cameras):
    """A ground point projected by H_w2i must match the full pinhole model."""
    Ks, Rts = cameras
    pt_world = np.array([3.0, -2.0, 0.0, 1.0])
    for v in range(7):
        K, Rt = Ks[v], Rts[v]
        cam = Rt @ pt_world
        uvw = K @ cam[:3]
        uv_expected = uvw[:2] / uvw[2]
        H = compute_homography(jnp.array(K), jnp.array(Rt))
        uv, w = project_points(H, jnp.array([[3.0, -2.0, 1.0]]))
        np.testing.assert_allclose(np.asarray(uv[0]), uv_expected, rtol=1e-3)


def test_homography_roundtrip(cameras):
    """world -> image -> world must be the identity on the ground plane.

    This is the reference's _geom_consistency_loss property
    (project/models/model_wrapper.py:310-340) used as a test oracle.
    """
    Ks, Rts = cameras
    rng = np.random.default_rng(1)
    pts = rng.uniform(-10, 10, size=(64, 2)).astype(np.float32)
    pts_h = np.concatenate([pts, np.ones((64, 1), np.float32)], axis=1)
    for v in range(7):
        H = compute_homography(jnp.array(Ks[v]), jnp.array(Rts[v]))
        uv, w = project_points(H, jnp.array(pts_h))
        back, valid = pixel_to_world(uv, jnp.array(Ks[v]), jnp.array(Rts[v]))
        assert bool(jnp.all(valid))
        # float32 3x3 inversion conditioning bounds accuracy to ~decimeters
        # at 20 m camera distance; host-side annotation parsing uses float64
        # (vsta_tpu.data.calibration) where this roundtrip is ~1e-9.
        np.testing.assert_allclose(np.asarray(back), pts, atol=0.5)


def test_invert_homography_singular_falls_back_to_pinv():
    H = jnp.zeros((3, 3)).at[0, 0].set(1.0)  # rank 1, singular
    Hi = invert_homography(H)
    assert bool(jnp.all(jnp.isfinite(Hi)))
    expected = np.linalg.pinv(np.asarray(H))
    np.testing.assert_allclose(np.asarray(Hi), expected, atol=1e-5)


def test_ground_grid_centers():
    g = np.asarray(ground_grid(4, 6, (-3.0, 3.0, -2.0, 2.0)))
    assert g.shape == (4, 6, 3)
    np.testing.assert_allclose(g[0, 0], [-2.5, -1.5, 1.0], atol=1e-6)
    np.testing.assert_allclose(g[-1, -1], [2.5, 1.5, 1.0], atol=1e-6)
    np.testing.assert_allclose(g[..., 2], 1.0)


def test_meters_cells_roundtrip():
    xy = jnp.array([[0.0, 0.0], [-23.9, -7.1], [23.9, 7.1]])
    idx = meters_to_bev_indices(xy, BOUNDS, (120, 360))
    back = bev_indices_to_meters(idx - 0.5, BOUNDS, (120, 360))
    np.testing.assert_allclose(np.asarray(back), np.asarray(xy), atol=0.2)


def test_bev_sample_coords_shapes(cameras):
    Ks, Rts = cameras
    grid = ground_grid(40, 120, BOUNDS)
    coords = bev_sample_coords(
        jnp.array(Ks)[None], jnp.array(Rts)[None], (270, 480), (34, 60), grid
    )
    assert coords.shape == (1, 7, 40, 120, 2)
    # some cells must land inside every camera's feature map
    inside = (
        (coords[..., 0] >= 0)
        & (coords[..., 0] < 60)
        & (coords[..., 1] >= 0)
        & (coords[..., 1] < 34)
    )
    assert bool(jnp.all(jnp.any(jnp.any(inside, -1), -1)))
