#!/usr/bin/env python
"""Training CLI - public surface kept identical to the reference
(`python train.py --config configs/wildtrack.yaml [--save_vis]`,
reference: project/train.py:107-111) plus `--resume` (new: the reference
had no resume path)."""

import argparse

from vsta_tpu.config import load_config
from vsta_tpu.training import run_training


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--save_vis", action="store_true", default=False)
    parser.add_argument("--resume", action="store_true", default=False)
    parser.add_argument("--work_dir", type=str, default=".")
    parser.add_argument(
        "--profile",
        type=int,
        default=0,
        metavar="N",
        help="capture a jax.profiler trace of the first N train steps "
        "(written to SAVE_DIR/profile; the reference only had pynvml "
        "polling, train.py:310-323)",
    )
    args = parser.parse_args()

    cfg = load_config(args.config)
    # honor RUNTIME.DEVICE: cpu before any backend init (ref train.py:114)
    from vsta_tpu.utils.platform import select_platform

    select_platform(cfg.runtime.device)
    metrics = run_training(
        cfg,
        work_dir=args.work_dir,
        save_vis=args.save_vis,
        resume=args.resume,
        profile_steps=args.profile,
    )
    print("[done]", {k: round(v, 4) for k, v in metrics.items()})


if __name__ == "__main__":
    main()
