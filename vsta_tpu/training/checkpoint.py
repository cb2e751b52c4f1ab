"""Checkpointing with real resume (orbax).

The reference saves {'epoch', 'state_dict', 'f1'} every epoch but has NO
resume path - train.py never loads a checkpoint, and inference needs
strict=False because of lazy modules (reference: project/train.py:336-343,
inference.py:29-31). Here: save/restore the full training state (step,
params, batch_stats, opt_state, epoch, best_f1) under 'last'/'best'
names, all modules eagerly built so restoration is exact.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def _to_pure(tree):
    return jax.tree.map(np.asarray, tree)


class CheckpointManager:
    def __init__(self, save_dir: str):
        self.save_dir = Path(save_dir).resolve()
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    def _path(self, name: str) -> Path:
        return self.save_dir / name

    def save(
        self,
        name: str,
        state: TrainState,
        *,
        epoch: int,
        best_f1: float,
        extra: Optional[Dict[str, Any]] = None,
    ):
        # opt_state holds optax NamedTuples, which orbax round-trips as plain
        # dicts (losing the pytree structure). Store its leaves keyed by index
        # and rebuild with the template treedef on restore.
        opt_leaves = jax.tree.leaves(state.opt_state)
        payload = {
            "step": np.asarray(state.step),
            "params": _to_pure(state.params),
            "batch_stats": _to_pure(dict(state.batch_stats)),
            "opt_state_leaves": {
                f"{i:05d}": np.asarray(x) for i, x in enumerate(opt_leaves)
            },
            "epoch": np.asarray(epoch),
            "best_f1": np.asarray(best_f1),
        }
        if extra:
            payload["extra"] = extra
        path = self._path(name)
        self._ckptr.save(path, payload, force=True)

    def restore(self, name: str, state: TrainState) -> Tuple[TrainState, int, float]:
        """Restore into an existing (freshly initialized) state template."""
        path = self._path(name)
        payload = self._ckptr.restore(path)
        opt_treedef = jax.tree.structure(state.opt_state)
        saved_opt = payload["opt_state_leaves"]
        opt_leaves = [
            jax.numpy.asarray(saved_opt[k]) for k in sorted(saved_opt.keys())
        ]
        tmpl_leaves = jax.tree.leaves(state.opt_state)
        opt_leaves = [
            x.astype(t.dtype) if hasattr(t, "dtype") else x
            for x, t in zip(opt_leaves, tmpl_leaves)
        ]
        restored = state.replace(
            step=jax.numpy.asarray(payload["step"]),
            params=jax.tree.map(
                lambda t, s: jax.numpy.asarray(s).astype(t.dtype),
                state.params,
                payload["params"],
            ),
            batch_stats=jax.tree.map(
                lambda t, s: jax.numpy.asarray(s).astype(t.dtype),
                state.batch_stats,
                type(state.batch_stats)(payload["batch_stats"]),
            )
            if state.batch_stats
            else state.batch_stats,
            opt_state=jax.tree.unflatten(opt_treedef, opt_leaves),
        )
        return restored, int(payload["epoch"]), float(payload["best_f1"])

    def exists(self, name: str) -> bool:
        return self._path(name).exists()
