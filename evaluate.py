#!/usr/bin/env python
"""Standalone evaluation CLI (new over the reference - its eval lives
only inside the train loop, project/train.py:269-309): loads a
checkpoint, runs the val split (Wildtrack 400/100 protocol,
train.py:126-136), and prints precision/recall/F1/MLE plus the true
MODA/MODP the reference names as targets but never implements
(README.md:70).

Usage: python evaluate.py --config configs/wildtrack.yaml \
           --checkpoint checkpoints/best [--split val|train|all]
"""

import argparse
import json
from pathlib import Path

import jax
import numpy as np

from vsta_tpu.config import load_config
from vsta_tpu.data.pipeline import Prefetcher, split_train_val
from vsta_tpu.data.wildtrack import WildtrackDataset
from vsta_tpu.parallel.mesh import make_mesh, shard_batch
from vsta_tpu.training.checkpoint import CheckpointManager
from vsta_tpu.training.metrics import DetectionMetrics
from vsta_tpu.training.optim import build_optimizer
from vsta_tpu.training.state import create_state, make_eval_step


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, default="checkpoints/best")
    parser.add_argument("--split", type=str, default="val", choices=["val", "train", "all"])
    parser.add_argument("--quantize-head", action="store_true", default=False,
                        help="score the int8 detector-stem serving path "
                             "(calibrated on the split's first batches) "
                             "instead of the float head")
    parser.add_argument("--quantize-encoder", action="store_true", default=False,
                        help="score the int8 ResNet-encoder serving path "
                             "(BatchNorm-fold PTQ; resnet backbones only)")
    args = parser.parse_args()

    cfg = load_config(args.config)
    from vsta_tpu.utils.platform import select_platform

    select_platform(cfg.runtime.device)
    ds = WildtrackDataset(cfg, train=False)
    idx_train, idx_val = split_train_val(len(ds), cfg.train.seed)
    indices = {"val": idx_val, "train": idx_train, "all": list(range(len(ds)))}[args.split]

    mesh = make_mesh(
        cfg.runtime.mesh_data,
        cfg.runtime.mesh_view,
        batch_size=cfg.data.batch_size,
        views=cfg.data.views,
    )
    def make_dl():
        return Prefetcher(
            ds,
            indices,
            cfg.data.batch_size,
            shuffle=False,
            num_workers=cfg.runtime.num_workers,
            device_put=lambda b: shard_batch(b, mesh),
        )

    dl = make_dl()

    state = create_state(cfg, build_optimizer(cfg, 1), jax.random.PRNGKey(0), mesh=mesh)
    ckpt_path = Path(args.checkpoint)
    ckpt = CheckpointManager(str(ckpt_path.parent))
    state, epoch, f1 = ckpt.restore(ckpt_path.name, state)
    print(f"[ckpt] loaded {args.checkpoint} (epoch {epoch}, f1={f1:.3f})")

    quant_head = quant_encoder = None
    if args.quantize_head or args.quantize_encoder:
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        # calibrate activation scales on the TRAIN split, never on the
        # split being scored: same-split calibration makes the reported
        # int8 accuracy mildly optimistic vs deployment (advisor round 3)
        calib_dl = Prefetcher(
            ds,
            idx_train,
            cfg.data.batch_size,
            shuffle=False,
            num_workers=cfg.runtime.num_workers,
            device_put=lambda b: shard_batch(b, mesh),
        )
        calib = []
        for batch in calib_dl:
            calib.append((batch["images"], batch["K"], batch["Rt"]))
            if len(calib) >= 2:
                break
        if args.quantize_encoder:
            from vsta_tpu.export import calibrate_quant_encoder

            quant_encoder = calibrate_quant_encoder(cfg, variables, calib)
            print(f"[quant] int8 encoder calibrated on {len(calib)} train-split batches")
        if args.quantize_head:
            from vsta_tpu.export import calibrate_quant_head

            quant_head = calibrate_quant_head(
                cfg, variables, calib, quant_encoder=quant_encoder
            )
            print(f"[quant] int8 head calibrated on {len(calib)} train-split batches")

    eval_step = jax.jit(
        make_eval_step(cfg, quant_head=quant_head, quant_encoder=quant_encoder)
    )
    acc = DetectionMetrics(match_dist=cfg.eval.nms_dist_m)
    for batch in dl:
        out = eval_step(state, batch)
        acc.update_batch(
            np.asarray(out["boxes"]),
            np.asarray(out["scores"]),
            np.asarray(out["valid"]),
            np.asarray(batch["boxes_world"]),
            np.asarray(batch["num_boxes"]),
            np.asarray(batch["batch_mask"]),
        )
    summary = acc.summary()
    # zero-frame evals yield NaN metrics; NaN is not valid JSON, so map it
    # to null to keep the output parseable by strict consumers
    clean = {
        k: (None if isinstance(v, float) and np.isnan(v) else round(float(v), 4))
        for k, v in summary.items()
    }
    print(json.dumps(clean, indent=2))


if __name__ == "__main__":
    main()
