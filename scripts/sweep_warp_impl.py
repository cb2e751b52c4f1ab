#!/usr/bin/env python
"""End-to-end forward fps for each WARP_IMPL at flagship shapes.

The flagship config pins one warp implementation, but which one is
fastest has flipped once already: the grouped Pallas sampler (round 2,
built for deformable attention) also accelerates the XLA "fused" warp's
shared-camera path, so the VMEM-resident kernel is no longer the obvious
winner. This sweep times the FULL forward+decode program (the bench.py
headline) per implementation so the flagship default is chosen from
end-to-end evidence, not per-stage numbers.

Usage: python scripts/sweep_warp_impl.py [--batch 16] [--impls pallas,fused]
"""

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_LO, N_HI, N_REPEAT = 2, 12, 3


def fps_for(cfg, batch):
    import jax
    import jax.numpy as jnp

    from vsta_tpu.data.synthetic import make_ring_camera
    from vsta_tpu.models import BEVNet
    from vsta_tpu.ops.decode import decode_detections

    model = BEVNet.from_config(cfg)
    B, V = batch, cfg.data.views
    H, W = cfg.data.img_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((B, V, H, W, 3)), jnp.float32)
    Ks, Rts = zip(*(make_ring_camera(v, V, img_hw=(H, W)) for v in range(V)))
    K = jnp.asarray(np.broadcast_to(np.stack(Ks), (B, V, 3, 3)), jnp.float32)
    Rt = jnp.asarray(np.broadcast_to(np.stack(Rts), (B, V, 4, 4)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images, K, Rt, train=False)

    def step_scalar(variables, images, K, Rt):
        out = model.apply(variables, images, K, Rt, train=False)
        det = decode_detections(
            out["heatmap"], out["offset"], out["size"],
            bounds=cfg.model.bev_bounds,
            conf_thresh=cfg.eval.conf_thresh,
            nms_dist_m=cfg.eval.nms_dist_m,
            max_dets=cfg.eval.max_dets,
        )
        return (
            jnp.sum(det["boxes"]).astype(jnp.float32)
            + jnp.sum(det["scores"])
            + jnp.sum(out["heatmap"])
        )

    @jax.jit
    def run_n(n, variables, images, K, Rt):
        def body(i, acc):
            return step_scalar(variables, images + acc * 1e-30, K, Rt)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed(n):
        best = float("inf")
        for _ in range(N_REPEAT):
            t0 = time.perf_counter()
            float(run_n(jnp.int32(n), variables, images, K, Rt))
            best = min(best, time.perf_counter() - t0)
        return best

    float(run_n(jnp.int32(1), variables, images, K, Rt))  # compile
    dt = (timed(N_HI) - timed(N_LO)) / (N_HI - N_LO)
    return B / max(dt, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--config", default="configs/wildtrack.yaml")
    ap.add_argument("--impls", default="pallas,fused")
    args = ap.parse_args()

    from vsta_tpu.config import load_config
    from vsta_tpu.utils.platform import enable_compile_cache

    enable_compile_cache(str(Path(__file__).resolve().parent.parent))
    base = load_config(args.config)
    for impl in args.impls.split(","):
        cfg = dataclasses.replace(
            base, model=dataclasses.replace(base.model, warp_impl=impl)
        )
        fps = fps_for(cfg, args.batch)
        print(json.dumps({
            "warp_impl": impl, "batch": args.batch,
            "fwd_decode_fps": round(fps, 1),
            "ms_per_batch": round(1000.0 * args.batch / fps, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
