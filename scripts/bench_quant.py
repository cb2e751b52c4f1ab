#!/usr/bin/env python
"""Forward+decode fps: float head vs int8-stem head (serving path).

Measures the end-to-end inference program with the detector stem in
bf16/f32 vs int8 (ops/quant.py) at flagship shapes, via the shared
chained-N slope protocol (vsta_tpu.utils.timing).

Usage: python scripts/bench_quant.py [--batch 16] [--config configs/wildtrack.yaml]
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--config", default="configs/wildtrack.yaml")
    ap.add_argument("--conv-impl", default="both", choices=["dots", "conv", "both"],
                    help="int8 conv lowering to measure (see ops/quant.py "
                         "CONV_IMPL)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vsta_tpu.config import load_config
    from vsta_tpu.data.synthetic import make_ring_camera
    from vsta_tpu.export import calibrate_quant_head
    from vsta_tpu.models import BEVNet
    from vsta_tpu.utils.platform import enable_compile_cache
    from vsta_tpu.utils.timing import forward_decode_fps

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
    qe = None
    if cfg.model.backbone.startswith("resnet"):
        from vsta_tpu.export import calibrate_quant_encoder

        qe = calibrate_quant_encoder(cfg, variables, [(images, K, Rt)])
    qp = calibrate_quant_head(cfg, variables, [(images, K, Rt)], quant_encoder=qe)

    impls = ["dots", "conv"] if args.conv_impl == "both" else [args.conv_impl]
    runs = [("float", None, None)]
    for i in impls:
        # the lowering choice lives IN the quant pytree (captured at
        # quantize time; ops/quant.py): rebuild the dict per impl so each
        # run traces the lowering it claims to measure
        runs.append((f"int8-head-{i}", dict(qp, impl=i), None))
        if qe is not None:
            runs.append((f"int8-encoder-{i}", None, dict(qe, impl=i)))
            runs.append((f"int8-both-{i}", dict(qp, impl=i), dict(qe, impl=i)))
    for label, quant, enc in runs:
        fps = forward_decode_fps(
            cfg, model, variables, images, K, Rt,
            quant_head=quant, quant_encoder=enc,
        )
        print(json.dumps({
            "mode": label,
            "batch": B,
            "fwd_decode_fps": round(fps, 1),
            "ms_per_batch": round(1000.0 * B / fps, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
