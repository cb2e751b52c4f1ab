#!/usr/bin/env python
"""Batch inference CLI - public surface kept identical to the reference
(`python inference.py --config ... --checkpoint ...`,
reference: project/inference.py:17-48): runs the full dataset and writes
per-frame prediction JSON ({"frame_idx", "boxes", "scores"}) to
RUNTIME.OUTPUT_DIR.

New over the reference: `--track` runs the Phase-3 SORT tracker (which
the reference only stubs, project/models/heads/detector.py:128-130) over
the decoded sequence and adds a "tracks" field per frame; `--save_vis`
writes BEV heatmap PNGs like train.py's flag.
"""

import argparse
from pathlib import Path

import jax
import numpy as np

from vsta_tpu.config import load_config
from vsta_tpu.data.pipeline import Prefetcher, multi_clip_plan
from vsta_tpu.data.wildtrack import WildtrackDataset
from vsta_tpu.parallel.mesh import make_mesh, shard_batch
from vsta_tpu.tracking import SortTracker
from vsta_tpu.training.checkpoint import CheckpointManager
from vsta_tpu.training.optim import build_optimizer
from vsta_tpu.training.state import create_state, make_eval_step
from vsta_tpu.utils.visualization import save_bev_heatmap, save_predictions_json


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, default="checkpoints/best")
    parser.add_argument("--track", action="store_true", default=False)
    parser.add_argument("--clips", type=int, default=1,
                        help="with --track: run N temporal windows (clips) "
                             "as N batch rows, one online tracker per clip "
                             "- one forward pass advances every stream "
                             "(batched multi-clip inference)")
    parser.add_argument("--save_vis", action="store_true", default=False)
    parser.add_argument("--quantize-head", action="store_true", default=False,
                        help="run the int8 detector-stem serving path "
                             "(calibrated on the first batches; see "
                             "docs/QUANTIZATION.md)")
    parser.add_argument("--quantize-encoder", action="store_true", default=False,
                        help="run the int8 ResNet-encoder serving path "
                             "(BatchNorm-fold PTQ; resnet backbones only)")
    args = parser.parse_args()
    if args.clips > 1 and not args.track:
        parser.error("--clips requires --track")

    cfg = load_config(args.config)
    from vsta_tpu.utils.platform import select_platform

    select_platform(cfg.runtime.device)
    ds = WildtrackDataset(cfg, train=False)
    # multi-clip mode: the batch axis carries one temporal window per row
    # (row c = clip c's next frame), so batch_size := n_clips
    batch_size = args.clips if args.clips > 1 else cfg.data.batch_size
    mesh = make_mesh(
        cfg.runtime.mesh_data,
        cfg.runtime.mesh_view,
        batch_size=batch_size,
        views=cfg.data.views,
    )
    plan = (
        multi_clip_plan(range(len(ds)), args.clips) if args.clips > 1 else None
    )

    def make_dl():
        return Prefetcher(
            ds,
            range(len(ds)),
            batch_size,
            shuffle=False,
            num_workers=cfg.runtime.num_workers,
            device_put=lambda b: shard_batch(b, mesh),
            plan=plan,
        )

    dl = make_dl()

    state = create_state(cfg, build_optimizer(cfg, 1), jax.random.PRNGKey(0), mesh=mesh)
    ckpt_path = Path(args.checkpoint)
    ckpt = CheckpointManager(str(ckpt_path.parent))
    state, epoch, f1 = ckpt.restore(ckpt_path.name, state)
    print(f"[ckpt] loaded {args.checkpoint} (epoch {epoch}, f1={f1:.3f})")

    trackers = None
    if args.track:
        # one ONLINE tracker per clip; single-clip mode is one tracker
        # consuming every batch row in dataset order
        trackers = [
            SortTracker(
                max_age=cfg.track.max_age,
                min_hits=cfg.track.min_hits,
                match_dist_m=cfg.track.match_dist_m,
            )
            for _ in range(max(1, args.clips))
        ]

    quant_head = quant_encoder = None
    if args.quantize_head or args.quantize_encoder:
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        # calibrate activation scales on the TRAIN split so the scored
        # frames never calibrate themselves (advisor round 3; export.py
        # has the same held-in-calibration contract)
        from vsta_tpu.data.pipeline import split_train_val

        idx_train, _ = split_train_val(len(ds), cfg.train.seed)
        calib_dl = Prefetcher(
            ds,
            idx_train,
            batch_size,
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
    out_dir = cfg.runtime.output_dir
    n_frames = 0
    for batch in dl:
        out = eval_step(state, batch)
        boxes = np.asarray(out["boxes"])
        scores = np.asarray(out["scores"])
        valid = np.asarray(out["valid"])
        frame_idx = np.asarray(batch["frame_idx"]).tolist()
        batch_mask = np.asarray(batch["batch_mask"])

        tracks_per_frame = None
        if trackers is not None:
            # frames arrive in temporal order per stream (shuffle=False;
            # in multi-clip mode row b IS clip b): step each row's tracker
            tracks_per_frame = []
            for b in range(boxes.shape[0]):
                if not batch_mask[b]:
                    tracks_per_frame.append([])
                    continue
                keep = valid[b]
                trk = trackers[b if args.clips > 1 else 0]
                trks = trk.update(boxes[b][keep, :2], scores[b][keep])
                tracks_per_frame.append(
                    [
                        {
                            "id": int(t["id"]),
                            "xy": [float(t["xy"][0]), float(t["xy"][1])],
                            "velocity": [
                                float(t["velocity"][0]),
                                float(t["velocity"][1]),
                            ],
                            "score": float(t["score"]),
                        }
                        for t in trks
                    ]
                )

        save_predictions_json(
            boxes, scores, valid, out_dir, frame_idx, batch_mask,
            tracks=tracks_per_frame,
            clips=list(range(args.clips)) if args.clips > 1 else None,
        )
        if args.save_vis and n_frames == 0:
            save_bev_heatmap(
                np.asarray(out["heatmap"]), str(Path(out_dir) / "heatmap_first.png")
            )
        n_frames += int(batch_mask.sum())
    print(f"Saved predictions JSON for {n_frames} frames to {out_dir}")


if __name__ == "__main__":
    main()
