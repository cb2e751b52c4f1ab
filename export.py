#!/usr/bin/env python
"""Export a trained checkpoint to a portable StableHLO serving artifact.

New over the reference (which redeploys eager torch + checkpoint,
project/inference.py:17-48): compiles forward+decode once with weights
baked in; the artifact loads anywhere with jax alone.

Usage:
  python export.py --config configs/wildtrack.yaml \
      --checkpoint checkpoints/best --out model.stablehlo --batch 1
  # cross-export a TPU artifact from a CPU host (pure-XLA warp only):
  python export.py --config ... --checkpoint ... --out m.hlo \
      --platform tpu --warp_impl fused
"""

import argparse
import dataclasses
from pathlib import Path

from vsta_tpu.config import load_config


def _calibration_batches(cfg, batch_size, n_batches):
    """(images, K, Rt) tuples from DATA_ROOT when it exists, else
    synthetic ring-camera frames at the configured shapes."""
    import numpy as np

    out = []
    root = Path(cfg.data.data_root) if cfg.data.data_root else None
    ds = None
    if root and root.exists():
        from vsta_tpu.data.wildtrack import WildtrackDataset

        ds = WildtrackDataset(cfg, train=False)
        if len(ds) == 0:
            print(f"[quant] DATA_ROOT {root} has no frames; calibrating "
                  "on synthetic inputs instead")
            ds = None
    if ds is not None:
        idx = 0
        for _ in range(n_batches):
            ims, Ks, Rts = [], [], []
            for _ in range(batch_size):
                s = ds[idx % len(ds)]
                idx += 1
                ims.append(np.asarray(s["images"]))
                Ks.append(np.asarray(s["K"]))
                Rts.append(np.asarray(s["Rt"]))
            out.append((np.stack(ims), np.stack(Ks), np.stack(Rts)))
        return out

    from vsta_tpu.data.synthetic import make_ring_camera

    V = cfg.data.views
    H, W = cfg.data.img_size
    rng = np.random.default_rng(0)
    Ks, Rts = zip(*(make_ring_camera(v, V, img_hw=(H, W)) for v in range(V)))
    K = np.broadcast_to(np.stack(Ks), (batch_size, V, 3, 3)).astype(np.float32)
    Rt = np.broadcast_to(np.stack(Rts), (batch_size, V, 4, 4)).astype(np.float32)
    for _ in range(n_batches):
        images = rng.standard_normal((batch_size, V, H, W, 3)).astype(np.float32)
        out.append((images, K, Rt))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, required=True)
    ap.add_argument("--checkpoint", type=str, default="checkpoints/best")
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--platform", type=str, default=None,
                    help="target platform (default: exporting process's)")
    ap.add_argument("--warp_impl", type=str, default=None,
                    help="override MODEL.WARP_IMPL (use 'fused' when "
                         "cross-exporting for another platform)")
    ap.add_argument("--quantize-head", action="store_true", default=False,
                    help="serve the detector stem in int8 (2x MXU peak "
                         "on TPU); calibrated on DATA_ROOT frames when "
                         "available, synthetic frames otherwise")
    ap.add_argument("--quantize-encoder", action="store_true", default=False,
                    help="serve the ResNet encoder in int8 (BatchNorm-fold "
                         "PTQ; resnet backbones only)")
    ap.add_argument("--calib-batches", type=int, default=4,
                    help="calibration batches for --quantize-*")
    args = ap.parse_args()

    cfg = load_config(args.config)
    if args.warp_impl:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, warp_impl=args.warp_impl)
        )
    from vsta_tpu.utils.platform import select_platform

    select_platform(cfg.runtime.device)

    import jax

    from vsta_tpu.export import export_serving, save_exported
    from vsta_tpu.training.checkpoint import CheckpointManager
    from vsta_tpu.training.optim import build_optimizer
    from vsta_tpu.training.state import create_state

    state = create_state(cfg, build_optimizer(cfg, 1), jax.random.PRNGKey(0))
    ckpt_path = Path(args.checkpoint)
    state, epoch, f1 = CheckpointManager(str(ckpt_path.parent)).restore(
        ckpt_path.name, state
    )
    print(f"[ckpt] loaded {args.checkpoint} (epoch {epoch}, f1={f1:.3f})")

    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    quant_head = quant_encoder = None
    if args.quantize_head or args.quantize_encoder:
        calib = _calibration_batches(cfg, args.batch, args.calib_batches)
        if args.quantize_encoder:
            from vsta_tpu.export import calibrate_quant_encoder

            quant_encoder = calibrate_quant_encoder(cfg, variables, calib)
            print(f"[quant] int8 encoder calibrated on {args.calib_batches} batches")
        if args.quantize_head:
            from vsta_tpu.export import calibrate_quant_head

            quant_head = calibrate_quant_head(
                cfg, variables, calib, quant_encoder=quant_encoder
            )
            print(f"[quant] int8 head calibrated on {args.calib_batches} batches")

    platforms = [args.platform] if args.platform else None
    exp = export_serving(
        cfg, variables, batch_size=args.batch, platforms=platforms,
        quant_head=quant_head, quant_encoder=quant_encoder,
    )
    save_exported(exp, args.out, cfg=cfg)
    size_mb = Path(args.out).stat().st_size / 1e6
    print(f"[export] {args.out} ({size_mb:.1f} MB, platforms={list(exp.platforms)}, "
          f"batch={args.batch})")


if __name__ == "__main__":
    main()
