"""Ground-plane homography math (pure jnp, batched).

Semantics match the reference's inverse-perspective-mapping pipeline
(reference: project/models/fusion/geometry.py:33-78 and
project/data/wildtrack_loader.py:18-44): for a pinhole camera with
intrinsics K and extrinsics [R|t] (world->camera), points on the ground
plane z=0 map to the image by the 3x3 homography

    H_w2i = K @ [r1  r2  t]

where r1, r2 are the first two columns of R. Everything here is shape-
polymorphic over leading batch dims and works under jit/vmap/grad.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Calibration math is tiny (3x3) but precision-critical: force full-f32
# matmuls (the platform default may use bf16 passes on TPU).
_HI = jax.lax.Precision.HIGHEST


def rodrigues(rvec: jax.Array) -> jax.Array:
    """Rotation-vector -> rotation-matrix (Rodrigues formula).

    Accepts shape (3,), (3,1) or (1,3). Near-zero angles return identity
    (reference: project/data/wildtrack_loader.py:404-415).
    """
    rv = jnp.reshape(rvec, (-1,)).astype(jnp.float32)
    theta = jnp.linalg.norm(rv)
    # Safe axis: avoid 0/0 under jit; masked out by the `where` below.
    k = rv / jnp.where(theta < 1e-8, 1.0, theta)
    kx, ky, kz = k[0], k[1], k[2]
    zero = jnp.zeros_like(kx)
    K = jnp.stack(
        [
            jnp.stack([zero, -kz, ky]),
            jnp.stack([kz, zero, -kx]),
            jnp.stack([-ky, kx, zero]),
        ]
    )
    eye = jnp.eye(3, dtype=jnp.float32)
    R = eye + jnp.sin(theta) * K + (1.0 - jnp.cos(theta)) * (K @ K)
    return jnp.where(theta < 1e-8, eye, R)


def compute_homography(K: jax.Array, Rt: jax.Array) -> jax.Array:
    """World(ground plane, z=0) -> image homography, H = K @ [r1 r2 t].

    K:  (..., 3, 3) intrinsics.
    Rt: (..., 4, 4) or (..., 3, 4) world->camera extrinsics.
    Returns (..., 3, 3).
    """
    K3 = K[..., :3, :3]
    R = Rt[..., :3, :3]
    t = Rt[..., :3, 3:4]
    G = jnp.concatenate([R[..., :, 0:1], R[..., :, 1:2], t], axis=-1)
    return jnp.matmul(K3, G, precision=_HI)


def invert_homography(H: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Inverse with pseudo-inverse fallback for (near-)singular H.

    Mirrors the reference's inv->pinv degradation
    (reference: project/models/fusion/geometry.py:66-78).
    """
    det = jnp.linalg.det(H)
    ok = jnp.isfinite(det) & (jnp.abs(det) >= eps)
    # Regularize the singular case so `inv` stays finite, then select pinv.
    H_safe = jnp.where(ok[..., None, None], H, jnp.eye(3, dtype=H.dtype))
    inv = jnp.linalg.inv(H_safe)
    pinv = jnp.linalg.pinv(H)
    return jnp.where(ok[..., None, None], inv, pinv)


def project_points(H: jax.Array, pts: jax.Array, w_eps: float = 1e-6):
    """Apply a 3x3 homography to homogeneous points with safe dehomogenization.

    H:   (..., 3, 3)
    pts: (..., N, 3) homogeneous points.
    Returns (uv, w): uv (..., N, 2) dehomogenized, w (..., N) raw third coord.
    The w<eps guard matches the reference (geometry.py:146-149).
    """
    uvw = jnp.einsum("...ij,...nj->...ni", H, pts, precision=_HI)
    w = uvw[..., 2]
    w_safe = jnp.where(jnp.abs(w) < w_eps, jnp.ones_like(w), w)
    uv = uvw[..., :2] / w_safe[..., None]
    return uv, w


def geom_consistency_error(
    K: jax.Array, Rt: jax.Array, points_xy: jax.Array
) -> jax.Array:
    """Round-trip projection error: world -> image -> world, mean L1 (m).

    The reference defines this as an (unused) auxiliary loss
    (project/models/model_wrapper.py:310-340); here it serves as a
    calibration-sanity diagnostic (scripts/check_dataset.py) and a test
    oracle for the homography math. Points behind the camera or beyond
    the horizon are excluded.

    K: (..., 3, 3); Rt: (..., 4, 4); points_xy: (N, 2) ground points.
    Returns (...) mean round-trip error in meters.
    """
    ones = jnp.ones(points_xy.shape[:-1] + (1,), points_xy.dtype)
    pts_h = jnp.concatenate([points_xy, ones], axis=-1)  # (N, 3)
    H_w2i = compute_homography(K, Rt)
    uv, w_fwd = project_points(H_w2i, pts_h)
    xy_back, valid = pixel_to_world(uv, K, Rt)
    valid = valid & (w_fwd > 1e-6)
    err = jnp.linalg.norm(xy_back - points_xy, axis=-1)
    vf = valid.astype(err.dtype)
    return jnp.sum(err * vf, axis=-1) / jnp.maximum(jnp.sum(vf, axis=-1), 1.0)


def pixel_to_world(uv: jax.Array, K: jax.Array, Rt: jax.Array):
    """Back-project image pixels to ground-plane world coordinates.

    uv: (..., N, 2) pixel coordinates.
    Returns ((..., N, 2) world xy, (..., N) valid mask) - invalid where the
    homogeneous scale w ~ 0 (point at infinity / horizon), matching
    reference wildtrack_loader.py:35-44.
    """
    H_w2i = compute_homography(K, Rt)
    H_i2w = invert_homography(H_w2i)
    ones = jnp.ones(uv.shape[:-1] + (1,), dtype=uv.dtype)
    pts = jnp.concatenate([uv, ones], axis=-1)
    xyw = jnp.einsum("...ij,...nj->...ni", H_i2w, pts, precision=_HI)
    w = xyw[..., 2]
    valid = jnp.isfinite(w) & (jnp.abs(w) >= 1e-8)
    w_safe = jnp.where(valid, w, jnp.ones_like(w))
    xy = xyw[..., :2] / w_safe[..., None]
    return xy, valid
