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


def test_roundtrip_to_dict():
    cfg = load_config("configs/wildtrack.yaml")
    d = to_dict(cfg)
    cfg2 = from_dict(d)
    assert cfg2.model == cfg.model
    assert cfg2.loss == cfg.loss
