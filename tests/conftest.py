"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices (no TPU pod is
available in CI); the driver separately dry-runs the multi-chip path.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env may point at a TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# XLA compiles are ~0.4 s/op on this host; a persistent cache makes
# repeated test runs fast (7x on hits, including eager dispatches).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_camera(
    view: int,
    n_views: int = 7,
    radius: float = 20.0,
    height: float = 6.0,
    img_hw=(270, 480),
):
    """Synthetic plausible calibration: camera on a ring looking at origin.

    Intrinsics are scaled to `img_hw` (unlike the reference, which keeps
    1920x1080 intrinsics while resizing images to 270x480 - a real
    misalignment bug we fix in the data layer).
    Returns (K [3,3], Rt [4,4]) float32 numpy arrays, world->camera.
    """
    ang = 2.0 * np.pi * view / max(1, n_views)
    cam_pos = np.array([radius * np.cos(ang), radius * np.sin(ang), height])
    target = np.zeros(3)
    fwd = target - cam_pos
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    # rows of R: camera x (right), y (down), z (forward) in world coords
    R = np.stack([right, down, fwd], axis=0)
    t = -R @ cam_pos
    H_img, W_img = img_hw
    f = 0.47 * W_img  # ~horizontal FoV of 94 degrees
    K = np.array(
        [[f, 0.0, W_img / 2.0], [0.0, f, H_img / 2.0], [0.0, 0.0, 1.0]]
    )
    Rt = np.eye(4)
    Rt[:3, :3] = R
    Rt[:3, 3] = t
    return K.astype(np.float32), Rt.astype(np.float32)


@pytest.fixture
def cameras():
    Ks, Rts = [], []
    for v in range(7):
        K, Rt = make_camera(v)
        Ks.append(K)
        Rts.append(Rt)
    return np.stack(Ks), np.stack(Rts)
