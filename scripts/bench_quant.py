#!/usr/bin/env python
"""Forward+decode fps: float head vs int8-stem head (serving path).

Measures the end-to-end inference program with the detector stem in
bf16/f32 vs int8 (ops/quant.py) at flagship shapes, via the chained-N
slope method (the only honest timing through this rig's TPU tunnel).

Usage: python scripts/bench_quant.py [--batch 16] [--config configs/wildtrack.yaml]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_LO, N_HI, N_REPEAT = 2, 12, 3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--config", default="configs/wildtrack.yaml")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vsta_tpu.config import load_config
    from vsta_tpu.data.synthetic import make_ring_camera
    from vsta_tpu.export import calibrate_quant_head
    from vsta_tpu.models import BEVNet
    from vsta_tpu.ops.decode import decode_detections
    from vsta_tpu.utils.platform import enable_compile_cache

    enable_compile_cache(str(Path(__file__).resolve().parent.parent))
    cfg = load_config(args.config)
    model = BEVNet.from_config(cfg)
    B, V = args.batch, cfg.data.views
    H, W = cfg.data.img_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((B, V, H, W, 3)), jnp.float32)
    Ks, Rts = zip(*(make_ring_camera(v, V, img_hw=(H, W)) for v in range(V)))
    K = jnp.asarray(np.broadcast_to(np.stack(Ks), (B, V, 3, 3)), jnp.float32)
    Rt = jnp.asarray(np.broadcast_to(np.stack(Rts), (B, V, 4, 4)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images, K, Rt, train=False)
    qp = calibrate_quant_head(cfg, variables, [(images, K, Rt)])

    def fps_for(quant):
        def step_scalar(variables, images, K, Rt):
            out = model.apply(
                variables, images, K, Rt, train=False,
                quant_head=qp if quant else None,
            )
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

    for quant in (False, True):
        fps = fps_for(quant)
        print(json.dumps({
            "head": "int8" if quant else "float",
            "batch": B,
            "fwd_decode_fps": round(fps, 1),
            "ms_per_batch": round(1000.0 * B / fps, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
