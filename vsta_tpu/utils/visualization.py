"""Visualization / export utilities.

Reference: project/utils/visualization.py:9-29 (heatmap 'hot' PNG,
per-frame prediction JSON) and train.py:351-359 (learning-curve PNG).
Output formats are kept byte-compatible where it matters (JSON schema:
{"frame_idx", "boxes", "scores"} at frame_{idx:06d}.json).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence

import numpy as np


def save_bev_heatmap(heatmap, save_path: str):
    """heatmap: array [B,H,W,1] / [H,W] etc. -> matplotlib 'hot' PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    hm = np.asarray(heatmap)
    while hm.ndim > 2:
        hm = hm[0] if hm.shape[0] <= hm.shape[-1] else hm[..., 0]
    plt.figure(figsize=(4, 4))
    plt.imshow(hm, cmap="hot", interpolation="nearest")
    plt.colorbar()
    plt.tight_layout()
    plt.savefig(save_path)
    plt.close()


def save_predictions_json(
    boxes: np.ndarray,
    scores: np.ndarray,
    valid: np.ndarray,
    save_dir: str,
    frame_indices: Sequence[int],
    batch_mask: Optional[np.ndarray] = None,
    tracks: Optional[Sequence[list]] = None,
    clips: Optional[Sequence[int]] = None,
):
    """Write one JSON per frame from padded decoded arrays [B,K,...].

    `tracks` (optional, per batch row) adds a "tracks" list of
    {"id","xy","velocity","score"} dicts - the Phase-3 SORT output.
    `clips` (optional, per batch row) records which temporal window the
    frame belongs to in multi-clip mode - track ids are per-clip.
    """
    os.makedirs(save_dir, exist_ok=True)
    for b, frame_idx in enumerate(frame_indices):
        if batch_mask is not None and not batch_mask[b]:
            continue
        keep = np.asarray(valid[b], bool)
        out = {
            "frame_idx": int(frame_idx),
            "boxes": np.asarray(boxes[b][keep], np.float64).tolist(),
            "scores": np.asarray(scores[b][keep], np.float64).tolist(),
        }
        if tracks is not None:
            out["tracks"] = tracks[b]
        if clips is not None:
            out["clip"] = int(clips[b])
        with open(os.path.join(save_dir, f"frame_{int(frame_idx):06d}.json"), "w") as f:
            json.dump(out, f)


def save_learning_curves(
    train_loss: List[float], val_f1: List[float], save_path: str
):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    plt.figure(figsize=(6, 4))
    plt.plot(train_loss, label="train_loss")
    if val_f1:
        plt.plot(val_f1, label="val_f1")
    plt.legend()
    plt.tight_layout()
    plt.savefig(save_path)
    plt.close()
