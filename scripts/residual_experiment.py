#!/usr/bin/env python
"""Attack the ~20 ms train-step residual (docs/PERFORMANCE.md training
table; VERDICT round 3, weak #6).

The residual = BatchNorm train-mode statistics + stage-isolation
non-additivity. This harness measures the FULL jitted train step under
the variants that could recover it, each in its OWN subprocess (XLA
flags latch at backend init, and the 1-core host tolerates exactly one
TPU compile at a time):

  base          - flagship config as shipped (the PERFORMANCE.md row)
  freeze        - TRAIN.FREEZE_BACKBONE: eval-mode BN + stop_gradient at
                  the encoder boundary (drops encoder backward AND the
                  BN stat updates; bounds their combined share)
  r50-bn/r50-gn - resnet50 with BatchNorm vs MODEL.NORM=group
                  (GroupNorm-32): isolates the BN-stats cost with
                  gradients still flowing (GN has no running stats)
  base-lhs      - base + --xla_tpu_enable_latency_hiding_scheduler
                  (attacks the scheduling share)

Timing protocol: chained fori_loop slope, identical to bench.py
(axon tunnel acks at dispatch; only data-dependent chains time
honestly).

Usage (on TPU):  python scripts/residual_experiment.py --batch 8
One JSON line per variant + a combined table at the end.
"""

import argparse
import dataclasses
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

VARIANTS = ["base", "freeze", "r50-bn", "r50-gn", "base-lhs"]


def build_cfg(variant: str, batch: int, tiny: bool = False):
    from vsta_tpu.config import load_config

    cfg = load_config(str(REPO / "configs" / "wildtrack.yaml"))
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, batch_size=batch)
    )
    if tiny:
        # plumbing-smoke shapes (CPU): the orchestration (subprocesses,
        # env flags, parsing) is what a failed TPU window can't re-test
        cfg = dataclasses.replace(
            cfg,
            data=dataclasses.replace(
                cfg.data, batch_size=min(batch, 2), img_size=(54, 96), views=2
            ),
            model=dataclasses.replace(
                cfg.model, backbone="resnet18", feat_dim=64, out_index=1,
                bev_size=(12, 24), bev_proj_ch=8,
            ),
            runtime=dataclasses.replace(cfg.runtime, use_amp=False, device="cpu"),
        )
    if variant == "freeze":
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, freeze_backbone=True)
        )
    elif variant.startswith("r50"):
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                backbone="resnet18" if tiny else "resnet50",
                feat_dim=64 if tiny else 512,
                norm="group" if variant.endswith("-gn") else "batch",
            ),
        )
    return cfg


def measure(variant: str, batch: int, n_lo: int = 2, n_hi: int = 6,
            repeat: int = 3, tiny: bool = False) -> float:
    """ms per full train step (fwd+bwd+optimizer), chained-slope timed."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vsta_tpu.data.synthetic import make_ring_camera
    from vsta_tpu.training.optim import build_optimizer
    from vsta_tpu.training.state import create_state, make_train_step
    from vsta_tpu.utils.platform import enable_compile_cache

    enable_compile_cache(str(REPO))
    cfg = build_cfg(variant, batch, tiny=tiny)
    if tiny:
        from vsta_tpu.utils.platform import select_platform

        select_platform("cpu")
        n_lo, n_hi, repeat = 1, 3, 1
    B, V = cfg.data.batch_size, cfg.data.views
    H, W = cfg.data.img_size
    rng = np.random.default_rng(0)
    Ks, Rts = zip(*(make_ring_camera(v, V, img_hw=(H, W)) for v in range(V)))
    boxes = np.zeros((B, cfg.loss.max_objects, 4), np.float32)
    boxes[:, 0] = [0.0, 0.0, 0.6, 0.6]
    boxes[:, 1] = [2.0, 1.0, 0.6, 0.6]
    batch_d = {
        "images": jnp.asarray(rng.standard_normal((B, V, H, W, 3)), jnp.float32),
        "K": jnp.asarray(np.broadcast_to(np.stack(Ks), (B, V, 3, 3)), jnp.float32),
        "Rt": jnp.asarray(np.broadcast_to(np.stack(Rts), (B, V, 4, 4)), jnp.float32),
        "boxes_world": jnp.asarray(boxes),
        "num_boxes": jnp.full((B,), 2, jnp.int32),
        "frame_idx": jnp.arange(B, dtype=jnp.int32),
        "batch_mask": jnp.ones((B,), bool),
    }
    tx = build_optimizer(cfg, steps_per_epoch=100)
    state = create_state(cfg, tx, jax.random.PRNGKey(0))
    step = make_train_step(cfg)

    @jax.jit
    def run_n(n, state, batch):
        def body(i, carry):
            st, _ = carry
            st2, m = step(st, batch)
            return (st2, m["total_loss"])

        _, loss = jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))
        return loss

    def timed(n):
        best = float("inf")
        for _ in range(repeat):
            t0 = time.perf_counter()
            float(run_n(jnp.int32(n), state, batch_d))
            best = min(best, time.perf_counter() - t0)
        return best

    float(run_n(jnp.int32(1), state, batch_d))  # compile
    dt = (timed(n_hi) - timed(n_lo)) / (n_hi - n_lo)
    return dt * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--measure", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--tiny", action="store_true", default=False,
                    help="CPU plumbing smoke at tiny shapes")
    args = ap.parse_args()

    if args.measure:  # child mode: one variant, one backend, one line
        ms = measure(args.measure, args.batch, tiny=args.tiny)
        print(json.dumps({"variant": args.measure, "batch": args.batch,
                          "ms_per_step": round(ms, 2)}), flush=True)
        return

    rows = []
    for variant in args.variants.split(","):
        env = dict(os.environ)
        if variant == "base-lhs":
            env["LIBTPU_INIT_ARGS"] = (
                env.get("LIBTPU_INIT_ARGS", "")
                + " --xla_tpu_enable_latency_hiding_scheduler=true"
            ).strip()
        cmd = [sys.executable, __file__, "--batch", str(args.batch),
               "--measure", "base" if variant == "base-lhs" else variant]
        if args.tiny:
            cmd.append("--tiny")
        print(f"[residual] measuring {variant} ...", flush=True)
        proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                              cwd=str(REPO), timeout=1500)
        m = re.search(r'^\{.*"ms_per_step".*\}$', proc.stdout, re.MULTILINE)
        if proc.returncode != 0 or not m:
            print(f"[residual] {variant} FAILED rc={proc.returncode}\n"
                  f"{proc.stderr[-1500:]}", file=sys.stderr, flush=True)
            rows.append({"variant": variant, "batch": args.batch,
                         "ms_per_step": None})
            continue
        row = json.loads(m.group(0))
        row["variant"] = variant  # keep the -lhs label
        rows.append(row)
        print("[residual] " + json.dumps(row), flush=True)

    print("\n| variant | ms/step (batch %d) |" % args.batch)
    print("|---|---|")
    for r in rows:
        print(f"| {r['variant']} | {r['ms_per_step']} |")


if __name__ == "__main__":
    main()
