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
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def fps_for(cfg, batch):
    import jax
    import jax.numpy as jnp

    from vsta_tpu.data.synthetic import make_ring_camera
    from vsta_tpu.models import BEVNet
    from vsta_tpu.utils.timing import forward_decode_fps

    model = BEVNet.from_config(cfg)
    B, V = batch, cfg.data.views
    H, W = cfg.data.img_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((B, V, H, W, 3)), jnp.float32)
    Ks, Rts = zip(*(make_ring_camera(v, V, img_hw=(H, W)) for v in range(V)))
    K = jnp.asarray(np.broadcast_to(np.stack(Ks), (B, V, 3, 3)), jnp.float32)
    Rt = jnp.asarray(np.broadcast_to(np.stack(Rts), (B, V, 4, 4)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images, K, Rt, train=False)
    return forward_decode_fps(cfg, model, variables, images, K, Rt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--config", default="configs/wildtrack.yaml")
    ap.add_argument("--impls", default="pallas,fused")
    args = ap.parse_args()

    from vsta_tpu.config import VALID_WARP_IMPL, load_config
    from vsta_tpu.utils.platform import enable_compile_cache

    enable_compile_cache(str(Path(__file__).resolve().parent.parent))
    base = load_config(args.config)
    impls = [s.strip() for s in args.impls.split(",") if s.strip()]
    bad = [s for s in impls if s not in VALID_WARP_IMPL]
    if bad:
        # dataclasses.replace bypasses from_dict's validation; a typo'd
        # impl would otherwise silently fall through to a DIFFERENT warp
        # path in BEVNet and get benchmarked under the requested name
        sys.exit(f"unknown warp impl(s) {bad}; valid: {sorted(VALID_WARP_IMPL)}")
    for impl in impls:
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
