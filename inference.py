#!/usr/bin/env python
"""Batch inference CLI - public surface kept identical to the reference
(`python inference.py --config ... --checkpoint ...`,
reference: project/inference.py:17-48): runs the full dataset and writes
per-frame prediction JSON ({"frame_idx", "boxes", "scores"}) to
RUNTIME.OUTPUT_DIR."""

import argparse
from pathlib import Path

import jax
import numpy as np

from vsta_tpu.config import load_config
from vsta_tpu.data.pipeline import Prefetcher
from vsta_tpu.data.wildtrack import WildtrackDataset
from vsta_tpu.parallel.mesh import make_mesh, shard_batch
from vsta_tpu.training.checkpoint import CheckpointManager
from vsta_tpu.training.optim import build_optimizer
from vsta_tpu.training.state import create_state, make_eval_step
from vsta_tpu.utils.visualization import save_predictions_json


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, default="checkpoints/best")
    args = parser.parse_args()

    cfg = load_config(args.config)
    ds = WildtrackDataset(cfg, train=False)
    mesh = make_mesh(cfg.runtime.mesh_data, cfg.runtime.mesh_view)
    dl = Prefetcher(
        ds,
        range(len(ds)),
        cfg.data.batch_size,
        shuffle=False,
        num_workers=cfg.runtime.num_workers,
        device_put=lambda b: shard_batch(b, mesh),
    )

    state = create_state(cfg, build_optimizer(cfg, 1), jax.random.PRNGKey(0))
    ckpt_path = Path(args.checkpoint)
    ckpt = CheckpointManager(str(ckpt_path.parent))
    state, epoch, f1 = ckpt.restore(ckpt_path.name, state)
    print(f"[ckpt] loaded {args.checkpoint} (epoch {epoch}, f1={f1:.3f})")

    eval_step = jax.jit(make_eval_step(cfg))
    out_dir = cfg.runtime.output_dir
    for batch in dl:
        out = eval_step(state, batch)
        save_predictions_json(
            np.asarray(out["boxes"]),
            np.asarray(out["scores"]),
            np.asarray(out["valid"]),
            out_dir,
            np.asarray(batch["frame_idx"]).tolist(),
            np.asarray(batch["batch_mask"]),
        )
    print(f"Saved predictions JSON to {out_dir}")


if __name__ == "__main__":
    main()
