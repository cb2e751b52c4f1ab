"""serve.py CLI: stream a StableHLO artifact over a synthetic sequence.

The deployment surface the reference lacks (its only inference path
re-runs the eager torch model, project/inference.py:17-48): export once,
then serve from the artifact alone - no checkpoint, no config file -
with per-frame prediction JSON, online tracking, and latency stats.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import jax
import pytest

REPO = Path(__file__).resolve().parent.parent


def _tiny_cfg(root):
    from vsta_tpu.config import (
        Config, DataConfig, EvalConfig, LossConfig, ModelConfig,
        RuntimeConfig, TrainConfig,
    )

    return Config(
        data=DataConfig(batch_size=2, img_size=(54, 96), views=2,
                        data_root=str(root)),
        model=ModelConfig(
            backbone="simple", feat_dim=8, out_index=1,
            bev_size=(12, 24), bev_bounds=(-12.0, 12.0, -6.0, 6.0),
            bev_proj_ch=8, warp_impl="fused", fusion="concat",
        ),
        train=TrainConfig(epochs=1, lr=1e-3, accum_steps=1),
        loss=LossConfig(max_objects=8),
        runtime=RuntimeConfig(use_amp=False, device="cpu", num_workers=1),
        eval=EvalConfig(conf_thresh=0.05, max_dets=16),
    )


def test_serve_cli_streams_artifact(tmp_path):
    from vsta_tpu.data.synthetic import generate_synthetic_wildtrack
    from vsta_tpu.export import export_serving, save_exported
    from vsta_tpu.models import BEVNet

    root = generate_synthetic_wildtrack(
        tmp_path / "wt", n_frames=4, n_views=2, n_people=3, img_hw=(108, 192)
    )
    cfg = _tiny_cfg(root)
    model = BEVNet.from_config(cfg)
    import jax.numpy as jnp

    B, V = cfg.data.batch_size, cfg.data.views
    H, W = cfg.data.img_size
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, V, H, W, 3), jnp.float32),
        jnp.broadcast_to(jnp.eye(3), (B, V, 3, 3)).astype(jnp.float32),
        jnp.broadcast_to(jnp.eye(4), (B, V, 4, 4)).astype(jnp.float32),
        train=False,
    )
    exp = export_serving(cfg, variables, batch_size=2)
    artifact = tmp_path / "model.stablehlo"
    save_exported(exp, artifact, cfg=cfg)
    assert (tmp_path / "model.stablehlo.json").exists()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
    out_dir = tmp_path / "served"
    # --limit 3 with batch 2: the second (timed, post-warmup) batch is a
    # padded partial batch with ONE real frame - per-frame stats must
    # count real frames, not padding rows
    r = subprocess.run(
        [sys.executable, str(REPO / "serve.py"), "--artifact", str(artifact),
         "--track", "--out", str(out_dir), "--warmup", "1", "--limit", "3"],
        capture_output=True, text=True, timeout=900, env=env, cwd=str(REPO),
    )
    assert r.returncode == 0, r.stderr[-2000:]

    outs = sorted(out_dir.glob("frame_*.json"))
    assert len(outs) == 3
    rec = json.loads(outs[0].read_text())
    assert set(rec) >= {"frame_idx", "boxes", "scores", "tracks"}

    stats_line = [l for l in r.stdout.splitlines() if l.startswith("[serve] ")]
    assert stats_line, r.stdout
    stats = json.loads(stats_line[0][len("[serve] "):])
    assert stats["frames"] == 3 and stats["batch"] == 2
    # 2 batches, 1 warmup -> 1 timed, holding 1 real frame
    assert stats["batches_timed"] == 1
    assert stats["frames_timed"] == 1
    assert stats["latency_ms_mean"] > 0
    # per-frame latency reflects the single real frame (== batch latency)
    assert abs(stats["latency_ms_per_frame"] - stats["latency_ms_mean"]) < 0.02


def test_serve_cli_multi_clip(tmp_path):
    """--clips N: batched temporal-window streaming - every frame JSON
    carries its clip id, both clips cover their contiguous window in
    order, and track ids are per-clip (scripts/bench_serve_e2e.py scores
    on exactly this contract)."""
    from vsta_tpu.data.synthetic import generate_synthetic_wildtrack
    from vsta_tpu.export import export_serving, save_exported
    from vsta_tpu.models import BEVNet

    root = generate_synthetic_wildtrack(
        tmp_path / "wt", n_frames=6, n_views=2, n_people=3, img_hw=(108, 192)
    )
    cfg = _tiny_cfg(root)
    model = BEVNet.from_config(cfg)
    import jax.numpy as jnp

    B, V = 2, cfg.data.views
    H, W = cfg.data.img_size
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, V, H, W, 3), jnp.float32),
        jnp.broadcast_to(jnp.eye(3), (B, V, 3, 3)).astype(jnp.float32),
        jnp.broadcast_to(jnp.eye(4), (B, V, 4, 4)).astype(jnp.float32),
        train=False,
    )
    exp = export_serving(cfg, variables, batch_size=2)
    artifact = tmp_path / "model.stablehlo"
    save_exported(exp, artifact, cfg=cfg)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
    out_dir = tmp_path / "served"
    r = subprocess.run(
        [sys.executable, str(REPO / "serve.py"), "--artifact", str(artifact),
         "--track", "--clips", "2", "--out", str(out_dir)],
        capture_output=True, text=True, timeout=900, env=env, cwd=str(REPO),
    )
    assert r.returncode == 0, r.stderr[-2000:]

    outs = sorted(out_dir.glob("frame_*.json"))
    assert len(outs) == 6
    by_clip = {}
    for p in outs:
        d = json.loads(p.read_text())
        assert "clip" in d and "tracks" in d
        by_clip.setdefault(d["clip"], []).append(d["frame_idx"])
    # two contiguous temporal windows covering 0..5
    assert sorted(by_clip) == [0, 1]
    assert sorted(by_clip[0]) == [0, 1, 2]
    assert sorted(by_clip[1]) == [3, 4, 5]

    # --clips must match the artifact's frozen batch size
    r2 = subprocess.run(
        [sys.executable, str(REPO / "serve.py"), "--artifact", str(artifact),
         "--track", "--clips", "3", "--out", str(out_dir)],
        capture_output=True, text=True, timeout=300, env=env, cwd=str(REPO),
    )
    assert r2.returncode != 0
    assert "must equal the artifact's frozen batch size" in (
        r2.stderr + r2.stdout
    )


def test_serve_cli_overlap_matches_sync(tmp_path):
    """--overlap (one-deep pipelining) must produce byte-identical
    predictions and tracks to the synchronous mode - only the timing
    semantics change."""
    from vsta_tpu.data.synthetic import generate_synthetic_wildtrack
    from vsta_tpu.export import export_serving, save_exported
    from vsta_tpu.models import BEVNet

    root = generate_synthetic_wildtrack(
        tmp_path / "wt", n_frames=5, n_views=2, n_people=3, img_hw=(108, 192)
    )
    cfg = _tiny_cfg(root)
    model = BEVNet.from_config(cfg)
    import jax.numpy as jnp

    B, V = cfg.data.batch_size, cfg.data.views
    H, W = cfg.data.img_size
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, V, H, W, 3), jnp.float32),
        jnp.broadcast_to(jnp.eye(3), (B, V, 3, 3)).astype(jnp.float32),
        jnp.broadcast_to(jnp.eye(4), (B, V, 4, 4)).astype(jnp.float32),
        train=False,
    )
    exp = export_serving(cfg, variables, batch_size=2)
    artifact = tmp_path / "model.stablehlo"
    save_exported(exp, artifact, cfg=cfg)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
    outs = {}
    for mode, extra in (("sync", []), ("overlap", ["--overlap"])):
        out_dir = tmp_path / f"served_{mode}"
        r = subprocess.run(
            [sys.executable, str(REPO / "serve.py"), "--artifact",
             str(artifact), "--track", "--out", str(out_dir)] + extra,
            capture_output=True, text=True, timeout=900, env=env,
            cwd=str(REPO),
        )
        assert r.returncode == 0, r.stderr[-2000:]
        outs[mode] = {
            p.name: json.loads(p.read_text())
            for p in sorted(out_dir.glob("frame_*.json"))
        }
        stats = json.loads(
            [l for l in r.stdout.splitlines() if l.startswith("[serve] ")][0][
                len("[serve] "):
            ]
        )
        assert stats["frames"] == 5
        assert stats["overlap"] == (mode == "overlap")
    assert outs["sync"] == outs["overlap"]


def test_serve_batch_from_manifest():
    sys.path.insert(0, str(REPO))
    from serve import _batch_from_manifest

    assert _batch_from_manifest({"in_avals": ["uint8[3,7,270,480,3]"]}, 1) == 3
    assert _batch_from_manifest({}, 5) == 5
