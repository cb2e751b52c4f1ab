#!/usr/bin/env python
"""Streaming serving CLI: drive a StableHLO artifact over a frame sequence.

Completes the deployment story that `export.py` starts (and that the
reference lacks entirely - its only inference path re-runs the eager
torch model from a checkpoint, reference: project/inference.py:17-48):

  * loads the exported artifact - NO model code, config file, or
    checkpoint needed beyond the artifact + its JSON manifest (the
    manifest embeds the config the model was exported with);
  * streams frames in dataset order at the artifact's frozen batch size
    (static shapes -> deterministic latency);
  * optional online SORT tracking (`--track`), same "tracks" JSON field
    as `inference.py`;
  * reports end-to-end serving latency (mean/p50/p95 per batch and per
    frame) measured host-side around the fetch of the decoded
    detections - the number a deployment actually observes.

Usage:
  python export.py --config configs/wildtrack.yaml \
      --checkpoint checkpoints/best --out model.stablehlo --batch 1
  python serve.py --artifact model.stablehlo --source data/Wildtrack \
      --track --out outputs/
"""

import argparse
import json
import re
import time
from pathlib import Path


def _batch_from_manifest(manifest: dict, default: int) -> int:
    """The artifact's frozen batch size, from its first input aval
    (e.g. "uint8[1,7,270,480,3]")."""
    avals = manifest.get("in_avals") or []
    m = re.search(r"\[(\d+)", avals[0]) if avals else None
    return int(m.group(1)) if m else default


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", type=str, required=True,
                    help="StableHLO artifact from export.py (its .json "
                         "manifest must sit next to it)")
    ap.add_argument("--config", type=str, default=None,
                    help="config override; default: the manifest's "
                         "embedded config")
    ap.add_argument("--source", type=str, default=None,
                    help="override DATA.DATA_ROOT (the frame tree to stream)")
    ap.add_argument("--out", type=str, default=None,
                    help="override RUNTIME.OUTPUT_DIR for prediction JSON")
    ap.add_argument("--track", action="store_true", default=False)
    ap.add_argument("--clips", type=int, default=0,
                    help="with --track: batched multi-clip streaming - "
                         "split the source into N temporal windows, one "
                         "per batch row with its own online tracker; N "
                         "must equal the artifact's frozen batch size "
                         "(0 = single stream)")
    ap.add_argument("--limit", type=int, default=0,
                    help="serve only the first N frames (0 = all)")
    ap.add_argument("--warmup", type=int, default=1,
                    help="untimed warmup batches (first call compiles "
                         "the artifact's call wrapper)")
    ap.add_argument("--overlap", action="store_true", default=False,
                    help="one-deep pipelining: dispatch batch i+1 to the "
                         "device (jax async dispatch) before fetching and "
                         "post-processing batch i on the host - higher "
                         "throughput; per-batch latency is then reported "
                         "as pipelined throughput, not request latency")
    args = ap.parse_args()
    if args.clips > 1 and not args.track:
        ap.error("--clips requires --track")

    manifest_path = Path(args.artifact + ".json")
    if not manifest_path.exists():
        raise FileNotFoundError(
            f"manifest {manifest_path} not found - export with export.py "
            "(save_exported writes it next to the artifact)")
    manifest = json.loads(manifest_path.read_text())

    import dataclasses

    from vsta_tpu.config import from_dict, load_config

    if args.config:
        cfg = load_config(args.config)
    elif "config" in manifest:
        cfg = from_dict(manifest["config"])
    else:
        raise SystemExit("manifest has no embedded config; pass --config")
    if args.source:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, data_root=args.source))
    if args.out:
        cfg = dataclasses.replace(
            cfg, runtime=dataclasses.replace(cfg.runtime, output_dir=args.out))

    from vsta_tpu.utils.platform import select_platform

    select_platform(cfg.runtime.device)

    import numpy as np

    from vsta_tpu.data.pipeline import Prefetcher, multi_clip_plan
    from vsta_tpu.data.wildtrack import WildtrackDataset
    from vsta_tpu.export import load_serving
    from vsta_tpu.tracking import SortTracker
    from vsta_tpu.utils.visualization import save_predictions_json

    serve = load_serving(args.artifact)
    B = _batch_from_manifest(manifest, cfg.data.batch_size)
    ds = WildtrackDataset(cfg, train=False)
    indices = range(min(args.limit, len(ds)) if args.limit else len(ds))
    plan = None
    if args.clips > 1:
        if args.clips != B:
            raise SystemExit(
                f"--clips {args.clips} must equal the artifact's frozen "
                f"batch size {B} (each clip rides one batch row)")
        plan = multi_clip_plan(indices, args.clips)
    # prefetch=4: the tunnel link fluctuates (scripts/probe_tunnel.py);
    # a deeper host-side decode queue keeps transfers in flight through
    # link jitter (measured lever, docs/PERFORMANCE.md "Host pipeline")
    dl = Prefetcher(ds, indices, B, shuffle=False, prefetch=4,
                    num_workers=cfg.runtime.num_workers, plan=plan)

    trackers = None
    if args.track:
        trackers = [
            SortTracker(max_age=cfg.track.max_age, min_hits=cfg.track.min_hits,
                        match_dist_m=cfg.track.match_dist_m)
            for _ in range(max(1, args.clips))
        ]

    out_dir = cfg.runtime.output_dir
    lat, n_frames, n_warm, n_timed = [], 0, 0, 0

    def postprocess(out, frame_idx, batch_mask):
        """Fetch decoded arrays, run online tracking, write frame JSON."""
        nonlocal n_frames
        boxes = np.asarray(out["boxes"])
        scores = np.asarray(out["scores"])
        valid = np.asarray(out["valid"])
        tracks_per_frame = None
        if trackers is not None:
            tracks_per_frame = []
            for b in range(boxes.shape[0]):
                if not batch_mask[b]:
                    tracks_per_frame.append([])
                    continue
                keep = valid[b]
                trk = trackers[b if args.clips > 1 else 0]
                trks = trk.update(boxes[b][keep, :2], scores[b][keep])
                tracks_per_frame.append([
                    {"id": int(t["id"]),
                     "xy": [float(t["xy"][0]), float(t["xy"][1])],
                     "velocity": [float(t["velocity"][0]),
                                  float(t["velocity"][1])],
                     "score": float(t["score"])}
                    for t in trks
                ])
        save_predictions_json(boxes, scores, valid, out_dir, frame_idx,
                              batch_mask, tracks=tracks_per_frame,
                              clips=(list(range(args.clips))
                                     if args.clips > 1 else None))
        n_frames += int(batch_mask.sum())

    if not args.overlap:
        for batch in dl:
            t0 = time.perf_counter()
            out = serve(batch["images"], batch["K"], batch["Rt"])
            out = {k: np.asarray(v) for k, v in out.items()}  # force fetch
            dt = time.perf_counter() - t0
            frame_idx = np.asarray(batch["frame_idx"]).tolist()
            batch_mask = np.asarray(batch["batch_mask"])
            if n_warm < args.warmup:
                n_warm += 1
            else:
                lat.append(dt)
                # Real (unpadded) frames in this timed batch: per-frame
                # stats must not count padding rows of a final partial
                # batch.
                n_timed += int(batch_mask.sum())
            postprocess(out, frame_idx, batch_mask)
    else:
        # one-deep pipeline: jax dispatch is async, so issuing batch i+1
        # BEFORE fetching batch i's outputs overlaps device compute with
        # host tracking/JSON work. Frame order (and each clip row's
        # tracker order) is preserved - batches still complete in order.
        pending = None  # (device outputs, frame_idx, batch_mask)
        for batch in dl:
            t0 = time.perf_counter()
            out_dev = serve(batch["images"], batch["K"], batch["Rt"])
            meta = (
                np.asarray(batch["frame_idx"]).tolist(),
                np.asarray(batch["batch_mask"]),
            )
            if pending is not None:
                p_out, p_idx, p_mask = pending
                p_out = {k: np.asarray(v) for k, v in p_out.items()}
                dt = time.perf_counter() - t0  # dispatch i+1 + drain i
                if n_warm < args.warmup:
                    n_warm += 1
                else:
                    lat.append(dt)
                    n_timed += int(p_mask.sum())
                postprocess(p_out, p_idx, p_mask)
            pending = (out_dev, *meta)
        if pending is not None:
            p_out, p_idx, p_mask = pending
            p_out = {k: np.asarray(v) for k, v in p_out.items()}
            postprocess(p_out, p_idx, p_mask)

    stats = {"frames": n_frames, "batch": B, "overlap": bool(args.overlap)}
    if lat and n_timed:
        arr = np.array(lat)
        stats.update({
            "batches_timed": len(lat),
            "frames_timed": n_timed,
            "latency_ms_mean": round(float(arr.mean() * 1e3), 2),
            "latency_ms_p50": round(float(np.percentile(arr, 50) * 1e3), 2),
            "latency_ms_p95": round(float(np.percentile(arr, 95) * 1e3), 2),
            "latency_ms_per_frame": round(float(arr.sum() * 1e3 / n_timed), 2),
            "frames_per_sec": round(n_timed / float(arr.sum()), 1),
        })
    print("[serve] " + json.dumps(stats))
    print(f"Saved predictions JSON for {n_frames} frames to {out_dir}")


if __name__ == "__main__":
    main()
