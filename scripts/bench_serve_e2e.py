#!/usr/bin/env python
"""One recorded full-system serving run (BASELINE configs[4]).

Drives the REAL deployment pipeline end to end over the synthetic
benchmark, per clip count: trained checkpoint -> `export.py` (StableHLO
artifact, frozen batch = n_clips) -> `serve.py --track --clips N`
(batched multi-clip temporal-window streaming, one online SORT tracker
per batch row) -> per-clip CLEAR-MOT/IDF1 against the generator's
personID ground truth + the serving latency stats serve.py reports.
Everything runs through the CLI surfaces via subprocess - this script
only orchestrates and scores.

The reference has no counterpart: its inference.py re-runs the eager
torch model and its tracker is a print stub
(/root/reference/project/models/heads/detector.py:128-130).

Usage (trained ckpt + synthetic tree from scripts/train_synthetic_e2e.py):
  python scripts/bench_serve_e2e.py \
      --checkpoint /tmp/vsta_e2e_run_concat/checkpoints/best \
      --data /tmp/vsta_e2e_120f_540x960 --clips 1,4 [--device cpu]

Prints one JSON line per clip count and a combined markdown table.
"""

import argparse
import dataclasses
import json
import re
import subprocess
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_cli(cmd, label):
    print(f"[serve-e2e] $ {' '.join(cmd)}", flush=True)
    proc = subprocess.run(
        [sys.executable] + cmd, capture_output=True, text=True, cwd=str(REPO)
    )
    if proc.returncode != 0:
        print(proc.stdout[-2000:])
        print(proc.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"{label} failed with rc={proc.returncode}")
    return proc.stdout


def score_mot(out_dir: Path, cfg, n_clips: int):
    """Score the tracks serve.py wrote against the dataset's identities,
    one MotAccumulator per clip (track ids are per-clip)."""
    from vsta_tpu.data.wildtrack import WildtrackDataset
    from vsta_tpu.tracking.metrics import MotAccumulator

    import numpy as np

    ds = WildtrackDataset(cfg, train=False)
    frames = sorted(out_dir.glob("frame_*.json"))
    assert frames, f"serve.py wrote no frame JSONs to {out_dir}"
    per_clip = defaultdict(list)
    for p in frames:
        d = json.loads(p.read_text())
        per_clip[d.get("clip", 0)].append(d)

    accs = {}
    for clip, items in sorted(per_clip.items()):
        acc = MotAccumulator(match_dist=cfg.track.match_dist_m)
        # clips are contiguous temporal windows: frame_idx order IS the
        # order each row's tracker saw them (pipeline.multi_clip_plan)
        for d in sorted(items, key=lambda d: d["frame_idx"]):
            i = int(d["frame_idx"])
            hyp = d.get("tracks") or []
            acc.update(
                ds.ids_per_frame[i],
                ds.centers_per_frame[i],
                [int(t["id"]) for t in hyp],
                np.array([t["xy"] for t in hyp], np.float64).reshape(-1, 2),
            )
        accs[clip] = acc.summary()

    n = sum(a["n_gt"] for a in accs.values())
    agg = {
        # GT-weighted aggregate over clips (equals the single-stream
        # definition when n_clips == 1)
        "mota": sum(a["mota"] * a["n_gt"] for a in accs.values()) / max(1, n),
        "idf1": sum(a["idf1"] * a["n_gt"] for a in accs.values()) / max(1, n),
        "motp_m": sum(a["motp"] * a["n_gt"] for a in accs.values()) / max(1, n),
        "id_switches": sum(a["id_switches"] for a in accs.values()),
        "n_gt": n,
        "frames_scored": len(frames),
    }
    return agg, {c: {k: round(float(v), 4) for k, v in a.items()} for c, a in accs.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="trained checkpoint dir (orbax), e.g. "
                         "/tmp/vsta_e2e_run_concat/checkpoints/best")
    ap.add_argument("--config", default="configs/wildtrack.yaml")
    ap.add_argument("--data", required=True, help="synthetic Wildtrack root")
    ap.add_argument("--clips", default="1,4",
                    help="comma-separated clip counts to record")
    ap.add_argument("--limit", type=int, default=0,
                    help="serve only the first N frames (0 = all)")
    ap.add_argument("--device", default=None,
                    help="override RUNTIME.DEVICE (cpu for the tunnel-down "
                         "fallback record; default: config value)")
    ap.add_argument("--quantize-head", action="store_true", default=False)
    ap.add_argument("--overlap", action="store_true", default=False,
                    help="serve with one-deep pipelining (throughput mode)")
    args = ap.parse_args()

    import yaml

    from vsta_tpu.config import load_config, to_dict

    cfg = load_config(args.config)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, data_root=args.data)
    )
    if args.device:
        cfg = dataclasses.replace(
            cfg, runtime=dataclasses.replace(cfg.runtime, device=args.device)
        )

    tmp = Path(tempfile.mkdtemp(prefix="vsta_serve_e2e_"))
    cfg_path = tmp / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(to_dict(cfg)))

    rows = []
    for n_clips in (int(c) for c in args.clips.split(",")):
        artifact = tmp / f"model_b{n_clips}.stablehlo"
        export_cmd = [
            "export.py", "--config", str(cfg_path),
            "--checkpoint", args.checkpoint,
            "--out", str(artifact), "--batch", str(max(1, n_clips)),
        ]
        if args.quantize_head:
            export_cmd.append("--quantize-head")
        run_cli(export_cmd, f"export b{n_clips}")

        out_dir = tmp / f"serve_clips{n_clips}"
        serve_cmd = [
            "serve.py", "--artifact", str(artifact), "--track",
            "--out", str(out_dir),
        ]
        if n_clips > 1:
            serve_cmd += ["--clips", str(n_clips)]
        if args.overlap:
            serve_cmd.append("--overlap")
        if args.limit:
            serve_cmd += ["--limit", str(args.limit)]
        out = run_cli(serve_cmd, f"serve clips={n_clips}")
        m = re.search(r"^\[serve\] (\{.*\})$", out, re.MULTILINE)
        assert m, f"no [serve] stats line in serve.py output:\n{out[-1500:]}"
        latency = json.loads(m.group(1))

        mot, per_clip = score_mot(out_dir, cfg, n_clips)
        row = {
            "clips": n_clips,
            "overlap": bool(args.overlap),
            "device": args.device or cfg.runtime.device,
            "quantize_head": bool(args.quantize_head),
            "mota": round(mot["mota"], 4),
            "idf1": round(mot["idf1"], 4),
            "motp_m": round(mot["motp_m"], 4),
            "id_switches": int(mot["id_switches"]),
            "frames": int(latency.get("frames", mot["frames_scored"])),
            "latency_ms_p50": latency.get("latency_ms_p50"),
            "latency_ms_p95": latency.get("latency_ms_p95"),
            "latency_ms_per_frame": latency.get("latency_ms_per_frame"),
            "frames_per_sec": latency.get("frames_per_sec"),
        }
        rows.append(row)
        print("[serve-e2e] " + json.dumps(row), flush=True)
        if n_clips > 1:
            print("[serve-e2e] per-clip: " + json.dumps(per_clip), flush=True)

    print("\n| clips | MOTA | IDF1 | MOTP (m) | IDsw | p50 (ms) | p95 (ms) | f/s |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['clips']} | {r['mota']:.3f} | {r['idf1']:.3f} | "
            f"{r['motp_m']:.3f} | {r['id_switches']} | {r['latency_ms_p50']} | "
            f"{r['latency_ms_p95']} | {r['frames_per_sec']} |"
        )


if __name__ == "__main__":
    main()
