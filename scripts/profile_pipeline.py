#!/usr/bin/env python
"""Decompose the input-included pipeline rate into measured stages.

The driver artifact (BENCH_r04.json) records 19.0 f/s warm input-included
against 512.6 f/s device-only — a 27x gap attributed, but never measured,
to "one CPU core + a tunneled device_put" (VERDICT round 4, weak #1 /
task #1). This script turns that assertion into arithmetic:

  host stages   — dataset __getitem__ (cold PNG decode vs warm RAM cache),
                  collate, SORT tracker update;
  tunnel stages — RTT (scalar fetch), H2D bandwidth, D2H bandwidth, each
                  from a two-size slope with a forced data-dependent fetch
                  (this rig's block_until_ready acks at dispatch — naive
                  timing is meaningless, see vsta_tpu/utils/timing.py);
  device stage  — forward+decode ms/batch at the pipeline batch size
                  (chained-slope, resident inputs);
  composites    — a no-op-compute epoch (host+H2D ceiling) and the full
                  epoch (the bench's input-included number), at several
                  prefetch depths / worker counts.

Prints one JSON line per stage plus a final ledger that predicts the
pipeline rate from the stages and compares it to the measured one.

Reference analog of the pipeline this decomposes: torch DataLoader with
pinned memory + prefetch (reference: project/train.py:139-160).
"""

import argparse
import dataclasses
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _best(fn, repeat=5):
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def emit(obj):
    print(json.dumps(obj), flush=True)


def bench_tunnel(jax, jnp):
    """RTT + H2D/D2H bandwidth over the device link (slope protocol)."""
    dev = jax.devices()[0]

    # RTT: fetch a resident scalar repeatedly
    s = jax.device_put(jnp.float32(1.0), dev)
    float(s)
    rtt = _best(lambda: float(s), repeat=20)

    # H2D: device_put(x) then force arrival with a data-dependent scalar
    # fetch; slope over two sizes cancels RTT + dispatch + reduce cost.
    reduce = jax.jit(lambda x: jnp.sum(jnp.max(x.reshape(-1, 4096), axis=0)))
    sizes = (4 * 2**20, 64 * 2**20)
    times = []
    for size in sizes:
        # distinct arrays per repeat so no caching layer can elide the copy
        xs = [np.full((size,), i, np.uint8) for i in range(4)]
        for x in xs:  # warm the compile for this shape
            pass
        float(reduce(jax.device_put(xs[0], dev)))
        t = _best(
            lambda xs=xs: [float(reduce(jax.device_put(x, dev))) for x in xs],
            repeat=3,
        ) / len(xs)
        times.append(t)
    h2d_bw = (sizes[1] - sizes[0]) / (times[1] - times[0])  # bytes/s
    h2d_fixed = times[0] - sizes[0] / h2d_bw  # per-transfer fixed cost

    # D2H: fetch a resident array to host; slope over two sizes
    times = []
    for size in sizes:
        xd = jax.device_put(np.zeros((size,), np.uint8), dev)
        float(reduce(xd))  # force resident
        t = _best(lambda xd=xd: np.asarray(xd), repeat=4)
        times.append(t)
    d2h_bw = (sizes[1] - sizes[0]) / (times[1] - times[0])
    return {
        "rtt_ms": round(rtt * 1e3, 2),
        "h2d_mb_per_s": round(h2d_bw / 2**20, 1),
        "h2d_fixed_ms": round(h2d_fixed * 1e3, 2),
        "d2h_mb_per_s": round(d2h_bw / 2**20, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=48,
                    help="synthetic full-res frames for the epoch runs")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--skip-cold", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vsta_tpu.config import load_config
    from vsta_tpu.data.pipeline import Prefetcher
    from vsta_tpu.data.synthetic import generate_synthetic_wildtrack
    from vsta_tpu.data.wildtrack import WildtrackDataset, collate
    from vsta_tpu.models import BEVNet
    from vsta_tpu.utils.platform import enable_compile_cache

    enable_compile_cache(str(Path(__file__).resolve().parent.parent))
    backend = jax.default_backend()
    emit({"stage": "env", "backend": backend,
          "device": str(jax.devices()[0])})

    # ---- tunnel characterization ------------------------------------
    tun = bench_tunnel(jax, jnp)
    emit({"stage": "tunnel", **tun})

    # ---- dataset ------------------------------------------------------
    root = Path("/tmp") / f"vsta_bench_wildtrack_{args.frames}"
    marker = root / ".complete"
    if not marker.exists():
        generate_synthetic_wildtrack(
            root, n_frames=args.frames, n_views=7, n_people=12,
            img_hw=(1080, 1920), seed=3,
        )
        marker.touch()

    cfg = load_config("configs/wildtrack.yaml")
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(
            cfg.data, data_root=str(root), batch_size=args.batch))
    ds = WildtrackDataset(cfg, train=False)
    B, V = args.batch, cfg.data.views
    H, W = cfg.data.img_size
    n_frames = len(ds)
    frame_mb = V * H * W * 3 / 2**20  # uint8 wire bytes per frame

    # ---- host stages ---------------------------------------------------
    if not args.skip_cold:
        ds._cache.clear()
        t0 = time.perf_counter()
        for i in range(n_frames):
            ds[i]
        cold = (time.perf_counter() - t0) / n_frames
        emit({"stage": "host_getitem_cold_ms_per_frame",
              "value": round(cold * 1e3, 2),
              "note": "PNG decode 7x 1080x1920 + resize, C++ codec"})
    else:
        for i in range(n_frames):
            ds[i]  # prime cache

    t0 = time.perf_counter()
    for i in range(n_frames):
        ds[i]
    warm = (time.perf_counter() - t0) / n_frames
    emit({"stage": "host_getitem_warm_ms_per_frame",
          "value": round(warm * 1e3, 2),
          "note": "RAM uint8 cache hit + stack"})

    samples = [ds[i] for i in range(B)]
    t_collate = _best(lambda: collate(samples), repeat=10)
    emit({"stage": "collate_ms_per_batch", "value": round(t_collate * 1e3, 2)})

    # tracker update on a realistic detection load
    from vsta_tpu.tracking import SortTracker
    trk = SortTracker()
    rng = np.random.default_rng(0)
    xy = rng.uniform(-10, 10, (12, 2)).astype(np.float32)
    sc = rng.uniform(0.5, 1.0, 12).astype(np.float32)
    for _ in range(5):
        trk.update(xy + rng.normal(0, 0.05, xy.shape).astype(np.float32), sc)
    t_trk = _best(
        lambda: trk.update(
            xy + rng.normal(0, 0.05, xy.shape).astype(np.float32), sc),
        repeat=20)
    emit({"stage": "tracker_update_ms_per_frame",
          "value": round(t_trk * 1e3, 3), "note": "12 active targets"})

    # ---- device compute at the pipeline batch size ----------------------
    model = BEVNet.from_config(cfg)
    sample = ds[0]
    images0 = jnp.asarray(sample["images"])[None].repeat(B, axis=0)
    K0 = jnp.asarray(sample["K"])[None].repeat(B, axis=0)
    Rt0 = jnp.asarray(sample["Rt"])[None].repeat(B, axis=0)
    variables = model.init(jax.random.PRNGKey(0), images0, K0, Rt0,
                           train=False)

    from vsta_tpu.utils.timing import chained_slope_time

    def fwd_scalar(images, K, Rt):
        out = model.apply(variables, images, K, Rt, train=False)
        return jnp.sum(out["heatmap"]).astype(jnp.float32)

    dt = chained_slope_time(fwd_scalar, images0, K0, Rt0,
                            n_lo=2, n_hi=8, repeat=3)
    emit({"stage": "device_forward_ms_per_batch",
          "value": round(dt * 1e3, 2), "batch": B,
          "fps_resident": round(B / dt, 1)})

    # ---- composite epochs ------------------------------------------------
    @jax.jit
    def fwd_chain(variables, images, K, Rt, acc):
        out = model.apply(variables, images + acc * 1e-30, K, Rt, train=False)
        return jnp.sum(out["heatmap"]).astype(jnp.float32)

    @jax.jit
    def noop_chain(images, acc):
        return (jnp.sum(images[0, 0, 0, 0].astype(jnp.float32))
                + acc * 1e-30)

    def epoch(compute, *, workers, prefetch, fetch_every=0):
        pf = Prefetcher(
            ds, list(range(n_frames)), B, num_workers=workers,
            prefetch=prefetch, device_put=jax.device_put, drop_last=True)
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        n = 0
        k = 0
        for batch in pf:
            if compute == "fwd":
                acc = fwd_chain(variables, batch["images"], batch["K"],
                                batch["Rt"], acc)
            else:
                acc = noop_chain(batch["images"], acc)
            n += int(np.asarray(batch["batch_mask"]).sum())
            k += 1
            if fetch_every and k % fetch_every == 0:
                float(acc)  # per-batch sync: the serving pattern
        float(acc)
        return n / max(time.perf_counter() - t0, 1e-9)

    # compile both programs on resident data first
    float(fwd_chain(variables, images0, K0, Rt0, jnp.float32(0.0)))
    float(noop_chain(images0, jnp.float32(0.0)))

    cfgs = [("noop", 8, 2, 0), ("fwd", 8, 2, 0), ("fwd", 8, 6, 0),
            ("fwd", 16, 6, 0), ("fwd", 8, 2, 1)]
    results = {}
    for compute, workers, prefetch, fetch in cfgs:
        fps = max(epoch(compute, workers=workers, prefetch=prefetch,
                        fetch_every=fetch) for _ in range(2))
        key = f"{compute}_w{workers}_p{prefetch}" + ("_sync" if fetch else "")
        results[key] = round(fps, 2)
        emit({"stage": f"epoch_{key}_fps", "value": round(fps, 2),
              "frames": n_frames})

    # ---- ledger ---------------------------------------------------------
    h2d_ms = frame_mb / max(tun["h2d_mb_per_s"], 1e-9) * 1e3
    ledger = {
        "stage": "ledger",
        "frame_wire_mb_uint8": round(frame_mb, 2),
        "per_frame_ms": {
            "host_getitem_warm": round(warm * 1e3, 2),
            "collate": round(t_collate * 1e3 / B, 2),
            "h2d_at_measured_bw": round(h2d_ms, 2),
            "device_forward": round(dt * 1e3 / B, 2),
        },
        "serial_sum_fps": round(
            1e3 / (warm * 1e3 + t_collate * 1e3 / B + h2d_ms + dt * 1e3 / B),
            1),
        "h2d_bw_ceiling_fps": round(tun["h2d_mb_per_s"] / frame_mb, 1),
        "measured_warm_fps": results.get("fwd_w8_p2"),
        "measured_noop_fps": results.get("noop_w8_p2"),
    }
    emit(ledger)


if __name__ == "__main__":
    main()
