"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices (no TPU pod is
available in CI); the driver separately dry-runs the multi-chip path.

IMPORTANT: this environment's `sitecustomize` imports jax at interpreter
startup, so jax.config has already latched the ambient env (e.g.
JAX_PLATFORMS=axon - the tunneled TPU) before this conftest runs.
Setting os.environ here is NOT enough; we must update jax.config
directly, before any backend is initialized.
"""

import os

# XLA_FLAGS is read when the CPU client is created (which hasn't happened
# yet - backends initialize lazily on first use), so the env var works.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

from vsta_tpu.utils.platform import enable_compile_cache

enable_compile_cache(os.path.dirname(os.path.dirname(__file__)))

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got "
    f"{jax.devices()[0].platform} - backend initialized before conftest?"
)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _clear_active_mesh():
    """The active-mesh registry is opt-in since round 4 (make_mesh
    register=False default), but tests exercising the set_active_mesh
    fallback must never leak it across tests."""
    yield
    from vsta_tpu.parallel.mesh import set_active_mesh

    set_active_mesh(None)


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
