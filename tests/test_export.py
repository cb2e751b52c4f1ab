"""StableHLO serving export: round-trip parity + artifact contract.

The reference ships no deployment path (inference re-runs the eager
model from a checkpoint, project/inference.py:17-48); vsta_tpu.export
compiles forward+decode once with weights baked in. These tests check
the serialized artifact reproduces the live model exactly and records a
usable manifest.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsta_tpu.config import (
    Config,
    DataConfig,
    EvalConfig,
    LossConfig,
    ModelConfig,
    RuntimeConfig,
    TrainConfig,
)
from vsta_tpu.data.synthetic import make_ring_camera
from vsta_tpu.export import (
    build_serving_fn,
    export_serving,
    load_serving,
    save_exported,
)
from vsta_tpu.models import BEVNet


def tiny_cfg(device_normalize=False) -> Config:
    return Config(
        data=DataConfig(
            batch_size=2, img_size=(48, 64), views=3, data_root="",
            device_normalize=device_normalize,
        ),
        model=ModelConfig(
            backbone="simple", feat_dim=8, out_index=2,
            bev_size=(16, 32), bev_bounds=(-8.0, 8.0, -4.0, 4.0),
            bev_proj_ch=12, warp_impl="fused", fusion="concat",
        ),
        train=TrainConfig(epochs=1, lr=1e-3, accum_steps=1),
        loss=LossConfig(max_objects=8),
        runtime=RuntimeConfig(use_amp=False),
        eval=EvalConfig(conf_thresh=0.05, max_dets=16),
    )


def _inputs(cfg, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    B, V = cfg.data.batch_size, cfg.data.views
    H, W = cfg.data.img_size
    if dtype == jnp.uint8:
        images = jnp.asarray(rng.integers(0, 255, (B, V, H, W, 3)), jnp.uint8)
    else:
        images = jnp.asarray(rng.standard_normal((B, V, H, W, 3)), jnp.float32)
    Ks, Rts = zip(*(make_ring_camera(v, V, radius=10.0, height=4.0,
                                     img_hw=(H, W)) for v in range(V)))
    K = jnp.asarray(np.broadcast_to(np.stack(Ks), (B, V, 3, 3)), jnp.float32)
    Rt = jnp.asarray(np.broadcast_to(np.stack(Rts), (B, V, 4, 4)), jnp.float32)
    return images, K, Rt


def _variables(cfg, images, K, Rt):
    model = BEVNet.from_config(cfg)
    return model.init(jax.random.PRNGKey(0), images, K, Rt, train=False)


def test_export_round_trip_matches_live_model(tmp_path):
    cfg = tiny_cfg()
    images, K, Rt = _inputs(cfg)
    variables = _variables(cfg, images, K, Rt)

    live = jax.jit(build_serving_fn(cfg, variables))(images, K, Rt)

    exp = export_serving(cfg, variables, batch_size=cfg.data.batch_size)
    path = tmp_path / "model.stablehlo"
    save_exported(exp, path, cfg=cfg)
    serve = load_serving(path)
    out = serve(images, K, Rt)

    assert set(out) == {"boxes", "scores", "valid", "heatmap"}
    for k in out:
        np.testing.assert_allclose(
            np.asarray(out[k], np.float32), np.asarray(live[k], np.float32),
            rtol=1e-6, atol=1e-6, err_msg=k,
        )


def test_export_manifest_and_uint8_spec(tmp_path):
    cfg = tiny_cfg(device_normalize=True)
    images, K, Rt = _inputs(cfg, dtype=jnp.uint8)
    variables = _variables(cfg, images, K, Rt)

    exp = export_serving(cfg, variables, batch_size=cfg.data.batch_size)
    # uint8 input spec when the host ships raw bytes
    assert exp.in_avals[0].dtype == jnp.uint8

    path = tmp_path / "m.hlo"
    save_exported(exp, path, cfg=cfg)
    manifest = json.loads((path.parent / "m.hlo.json").read_text())
    assert manifest["platforms"] and manifest["in_avals"]
    assert manifest["config"]["MODEL"]["BACKBONE"] == "simple"

    # artifact stays runnable and respects the decode contract
    out = load_serving(path)(images, K, Rt)
    B = cfg.data.batch_size
    assert out["boxes"].shape == (B, cfg.eval.max_dets, 4)
    assert out["valid"].dtype == jnp.bool_


def test_export_batch_size_is_frozen(tmp_path):
    cfg = tiny_cfg()
    images, K, Rt = _inputs(cfg)
    variables = _variables(cfg, images, K, Rt)
    exp = export_serving(cfg, variables, batch_size=1)
    path = tmp_path / "b1.hlo"
    save_exported(exp, path)
    serve = load_serving(path)
    out = serve(images[:1], K[:1], Rt[:1])
    assert out["boxes"].shape[0] == 1
    with pytest.raises(Exception):
        jax.block_until_ready(serve(images, K, Rt))


def test_export_quantized_head_round_trip(tmp_path):
    """--quantize-head path: calibrate, export, reload; detections track
    the float artifact within PTQ tolerance."""
    from vsta_tpu.export import calibrate_quant_head

    cfg = tiny_cfg()
    images, K, Rt = _inputs(cfg)
    variables = _variables(cfg, images, K, Rt)

    qp = calibrate_quant_head(cfg, variables, [(images, K, Rt)])
    live = jax.jit(build_serving_fn(cfg, variables))(images, K, Rt)

    exp = export_serving(
        cfg, variables, batch_size=cfg.data.batch_size, quant_head=qp
    )
    path = tmp_path / "q.hlo"
    save_exported(exp, path, cfg=cfg)
    out = load_serving(path)(images, K, Rt)

    assert set(out) == {"boxes", "scores", "valid", "heatmap"}
    err = float(jnp.max(jnp.abs(out["heatmap"] - live["heatmap"])))
    assert err < 0.05, f"quantized heatmap drifted {err}"
