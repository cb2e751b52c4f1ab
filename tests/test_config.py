import yaml

from vsta_tpu.config import from_dict, load_config, to_dict


def test_load_reference_schema(tmp_path):
    raw = {
        "DATA": {"BATCH_SIZE": 2, "IMG_SIZE": [3, 270, 480], "VIEWS": 7, "DATA_ROOT": "x"},
        "MODEL": {
            "BACKBONE": "efficientnet_b0",
            "FEAT_DIM": 1280,
            "OUT_INDEX": 2,
            "BEV_SIZE": [32, 120, 360],
            "BEV_BOUNDS": [-24.0, 24.0, -7.2, 7.2],
            "BEV_PROJ_CH": 128,
        },
        "TRAIN": {"EPOCHS": 50, "LR": "1e-3", "OPT": "Adam", "WEIGHT_DECAY": "1e-4",
                  "LR_SCHEDULER": "cosine_warm", "WARMUP_EPOCHS": 3, "ACCUM_STEPS": 2},
        "LOSS": {"DEFAULT_BOX_WH": [0.6, 0.6], "MAX_OBJECTS": 64},
        "RUNTIME": {"DEVICE": "cuda", "NUM_WORKERS": 0, "SAVE_DIR": "checkpoints/",
                    "OUTPUT_DIR": "out/", "USE_AMP": True, "DEBUG_MAX_STEPS": 50},
        "EVAL": {"CONF_THRESH": 0.4, "NMS_DIST_M": 0.5, "INTERVAL": 1},
    }
    cfg = from_dict(raw)
    assert cfg.data.img_size == (270, 480)
    assert cfg.model.bev_size == (120, 360)
    assert cfg.model.res_x == 48.0 / 360.0
    assert cfg.train.lr == 1e-3  # string scientific notation accepted
    assert cfg.loss.hm_alpha == 2.0  # defaults fill in
    assert cfg.eval.max_dets == 128

    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(raw))
    cfg2 = load_config(str(p))
    assert cfg2.model.bev_bounds == cfg.model.bev_bounds


def test_repo_configs_parse():
    for name in ("wildtrack", "wildtrack_sanity", "wildtrack_v1_resnet50"):
        cfg = load_config(f"configs/{name}.yaml")
        assert cfg.data.views == 7
        assert cfg.model.bev_bounds == (-24.0, 24.0, -7.2, 7.2)
    cfg = load_config("configs/wildtrack_ms_max.yaml")
    assert cfg.data.views == 2
    assert cfg.model.out_index == (1, 2)
    assert cfg.model.fusion == "max"
    cfg = load_config("configs/wildtrack_deform.yaml")
    assert cfg.model.fusion == "deform_attn"


def test_roundtrip_to_dict():
    cfg = load_config("configs/wildtrack.yaml")
    d = to_dict(cfg)
    cfg2 = from_dict(d)
    assert cfg2.model == cfg.model
    assert cfg2.loss == cfg.loss


def test_roundtrip_to_dict_all_sections():
    """from_dict(to_dict(cfg)) must equal cfg EXACTLY, for every section
    including the new keys and TRACK (VERDICT round 1, item 9)."""
    from vsta_tpu.config import (
        Config,
        DataConfig,
        EvalConfig,
        LossConfig,
        ModelConfig,
        RuntimeConfig,
        TrackConfig,
        TrainConfig,
    )

    cfg = Config(
        data=DataConfig(batch_size=3, img_size=(100, 200), views=5,
                        data_root="/x", cache_images=False, use_position_id=True),
        model=ModelConfig(backbone="resnet50", pretrained=True,
                          pretrained_path="/w.pth", feat_dim=96, out_index=1,
                          bev_size=(60, 180), bev_bounds=(-10.0, 10.0, -5.0, 5.0),
                          bev_proj_ch=64, warp_impl="pallas", fusion="deform_attn",
                          static_cameras=False, head_mid1=256, head_mid2=64,
                          attn_heads=2, attn_points=8, attn_stride=2),
        train=TrainConfig(epochs=7, lr=3e-4, opt="AdamW", weight_decay=1e-5,
                          lr_scheduler="cosine", warmup_epochs=1, accum_steps=4,
                          patience=3, seed=42, freeze_backbone=True),
        loss=LossConfig(default_box_wh=(0.5, 0.7), max_objects=32, hm_alpha=3.0,
                        hm_beta=2.0, hm_weight=2.0, offset_weight=0.5,
                        size_weight=0.2, gaussian_min_radius=1, gaussian_iou=0.5),
        runtime=RuntimeConfig(device="cpu", num_workers=2, save_dir="s/",
                              output_dir="o/", use_amp=False, debug_max_steps=9,
                              debug_nans=True, memory_limit_percent=80,
                              mesh_data=2, mesh_view=2),
        eval=EvalConfig(conf_thresh=0.3, nms_dist_m=0.7, interval=2, max_dets=64,
                        baseline_model="m", baseline_f1=0.5,
                        improvement_threshold=1.0),
        track=TrackConfig(max_age=9, min_hits=3, match_dist_m=2.0),
    )
    cfg2 = from_dict(to_dict(cfg))
    assert cfg2 == cfg


def test_invalid_enums_fail_fast():
    import pytest as _pytest

    base = {"MODEL": {"FUSION": "bogus"}}
    with _pytest.raises(ValueError, match="FUSION"):
        from_dict(base)
    with _pytest.raises(ValueError, match="WARP_IMPL"):
        from_dict({"MODEL": {"WARP_IMPL": "cuda"}})
    with _pytest.raises(ValueError, match="BACKBONE"):
        from_dict({"MODEL": {"BACKBONE": "vgg99"}})
    with _pytest.raises(ValueError, match="HEAD_MID1"):
        from_dict({"MODEL": {"HEAD_MID1": 100}})  # not a multiple of 32
    with _pytest.raises(ValueError, match="HEAD_MID2"):
        from_dict({"MODEL": {"HEAD_MID2": 0}})


def test_out_index_multiscale_roundtrip():
    """OUT_INDEX accepts a list of pyramid levels and round-trips."""
    cfg = from_dict({"MODEL": {"OUT_INDEX": [1, 2]}})
    assert cfg.model.out_index == (1, 2)
    cfg2 = from_dict(to_dict(cfg))
    assert cfg2.model.out_index == (1, 2)
    assert from_dict({"MODEL": {"OUT_INDEX": 3}}).model.out_index == 3
