#!/usr/bin/env python
"""Dataset smoke check CLI.

Covers the reference's hard-coded smoke script
(project/scripts/check_wildtrack_dataset.py:1-19) but takes --config /
--data_root instead of an editable constant, and validates more: frame
count, view folders, calibration shapes + plausibility (camera heights),
per-frame annotation counts, and one decoded sample's tensor shapes.

Usage:
  python scripts/check_dataset.py --config configs/wildtrack.yaml
  python scripts/check_dataset.py --data_root /path/to/Wildtrack --views 7
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--views", type=int, default=7)
    parser.add_argument("--device", type=str, default=None,
                        help="force a JAX platform (e.g. cpu) - a dataset "
                             "check needs no accelerator, and on hosts where "
                             "the ambient backend is a flaky remote device "
                             "this makes the run deterministic")
    args = parser.parse_args()

    from vsta_tpu.config import Config, DataConfig, load_config

    if args.config:
        cfg = load_config(args.config)
    elif args.data_root:
        cfg = Config(data=DataConfig(data_root=args.data_root, views=args.views))
    else:
        parser.error("pass --config or --data_root")

    from vsta_tpu.utils.platform import select_platform

    select_platform(args.device or cfg.runtime.device)

    from vsta_tpu.data.wildtrack import WildtrackDataset

    ds = WildtrackDataset(cfg, train=False)
    print(f"frames: {len(ds)}")
    print(f"views:  {ds.views} ({[d.name for d in ds.cam_dirs]})")
    print(f"native resolution: {ds.orig_hw[1]}x{ds.orig_hw[0]}")
    print(f"K (rescaled to {cfg.data.img_size[1]}x{cfg.data.img_size[0]}): {ds.Ks.shape}")
    print(f"Rt: {ds.Rts.shape}")

    # extrinsics plausibility: camera center height above ground
    for v in range(ds.views):
        R = ds.Rts[v, :3, :3]
        t = ds.Rts[v, :3, 3]
        cam_pos = -R.T @ t
        print(f"  C{v + 1}: cam height {cam_pos[2]:+.2f} m, dist {np.linalg.norm(cam_pos[:2]):.1f} m")

    counts = [len(c) for c in ds.centers_per_frame]
    print(f"annotations: mean {np.mean(counts):.1f} / max {max(counts)} people per frame"
          f" ({sum(1 for c in counts if c == 0)} empty frames)")

    # homography round-trip sanity (reference's _geom_consistency_loss
    # math, model_wrapper.py:310-340, as a diagnostic)
    import jax.numpy as jnp

    from vsta_tpu.geometry import geom_consistency_error

    pts = np.stack(
        np.meshgrid(np.linspace(-5, 5, 5), np.linspace(-3, 3, 5)), -1
    ).reshape(-1, 2).astype(np.float32)
    err = geom_consistency_error(
        jnp.asarray(ds.Ks), jnp.asarray(ds.Rts), jnp.asarray(pts)
    )
    for v in range(ds.views):
        e = float(err[v])
        flag = "" if e < 1e-2 else "  <-- SUSPICIOUS"
        print(f"  C{v + 1}: homography round-trip error {e:.2e} m{flag}")

    s = ds[0]
    print(f"sample[0]: images {s['images'].shape} {s['images'].dtype},"
          f" boxes_world {s['boxes_world'].shape}, num_boxes {int(s['num_boxes'])}")
    print("OK")


if __name__ == "__main__":
    main()
