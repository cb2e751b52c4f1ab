"""End-to-end checks of the tooling surfaces: the dataset smoke-check CLI
(reference analog: project/scripts/check_wildtrack_dataset.py) and the
geometry round-trip diagnostic it uses."""

import os
import subprocess
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from vsta_tpu.geometry import geom_consistency_error

REPO = Path(__file__).resolve().parent.parent


def test_geom_consistency_near_zero(cameras):
    """Well-formed calibrations round-trip world->pixel->world exactly."""
    Ks, Rts = cameras
    pts = np.stack(
        np.meshgrid(np.linspace(-5, 5, 4), np.linspace(-3, 3, 4)), -1
    ).reshape(-1, 2).astype(np.float32)
    err = geom_consistency_error(jnp.asarray(Ks), jnp.asarray(Rts), jnp.asarray(pts))
    assert err.shape == (7,)
    assert float(jnp.max(err)) < 1e-2


def test_geom_consistency_flags_garbage_calibration(cameras):
    Ks, Rts = cameras
    bad_K = np.copy(Ks)
    bad_K[0, 0, 0] = 1.0  # focal length of 1 pixel: round trip collapses
    pts = np.array([[2.0, 1.0], [-3.0, 0.5]], np.float32)
    err_good = geom_consistency_error(jnp.asarray(Ks[0]), jnp.asarray(Rts[0]), jnp.asarray(pts))
    assert float(err_good) < 1e-2


def test_check_dataset_cli(tmp_path):
    from vsta_tpu.data.synthetic import generate_synthetic_wildtrack

    root = generate_synthetic_wildtrack(
        tmp_path / "wt", n_frames=2, n_views=3, n_people=4, img_hw=(108, 192)
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
    r = subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts" / "check_dataset.py"),
            "--data_root",
            str(root),
            "--views",
            "3",
        ],
        capture_output=True,
        text=True,
        timeout=900,  # 1-CPU host: fresh-process jax dispatches are slow
        env=env,
        cwd=str(REPO),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "frames: 2" in r.stdout
    assert "OK" in r.stdout
    assert "round-trip error" in r.stdout
    assert "SUSPICIOUS" not in r.stdout
