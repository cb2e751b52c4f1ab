"""Train state + jitted train/eval step factories.

One jit-compiled train step does: forward (bf16 under AMP), target build
(on device, vectorized), loss, backward, optimizer update, BatchNorm
running-stat update. Gradient accumulation is an optax.MultiSteps
wrapper (config TRAIN.ACCUM_STEPS, ref train.py:242-255); no GradScaler
is needed on TPU (bf16 keeps fp32 range - ref used fp16+scaler,
train.py:169-173).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import core, struct

from ..config import Config
from ..models import BEVNet
from ..ops.decode import decode_detections
from ..ops.losses import detection_loss
from ..ops.splat import build_targets


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: optax.OptState
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def create_state(
    cfg: Config,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    mesh: Any = None,
) -> TrainState:
    """``mesh``: the device mesh the model will run under (threaded into
    ``BEVNet.from_config`` so warp dispatch is pinned at construction,
    not read from an ambient registry - advisor round 3). None =
    single-device; ``parallel.mesh.ACTIVE`` = legacy registry fallback."""
    model = BEVNet.from_config(cfg, mesh=mesh)
    B, V = cfg.data.batch_size, cfg.data.views
    H, W = cfg.data.img_size
    dummy = {
        "images": jnp.zeros((B, V, H, W, 3), jnp.float32),
        "K": jnp.broadcast_to(jnp.eye(3), (B, V, 3, 3)).astype(jnp.float32),
        "Rt": jnp.broadcast_to(jnp.eye(4), (B, V, 4, 4)).astype(jnp.float32),
    }
    # jit the init: eager tracing dispatches each primitive as its own
    # mini-compilation (~150 compiles); one jitted program is ~20x faster.
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, dummy["images"], dummy["K"], dummy["Rt"], train=False
    )
    if cfg.model.pretrained and cfg.model.pretrained_path:
        from ..models.encoders.pretrained import load_pretrained_backbone

        try:
            variables = load_pretrained_backbone(
                variables, cfg.model.pretrained_path, cfg.model.backbone
            )
        except Exception as e:  # tolerant, like the reference (base.py:17-24)
            print(f"[pretrained] load failed ({e}); training from scratch")
    params = variables["params"]
    batch_stats = variables.get("batch_stats", core.FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )


def make_train_step(cfg: Config):
    """Returns train_step(state, batch) -> (state, metrics dict)."""
    l = cfg.loss
    m = cfg.model

    def train_step(state: TrainState, batch: Dict[str, jax.Array]):
        targets = build_targets(
            batch["boxes_world"],
            batch["num_boxes"],
            bounds=m.bev_bounds,
            bev_hw=m.bev_size,
            min_overlap=l.gaussian_iou,
            min_radius=l.gaussian_min_radius,
        )

        def loss_fn(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out, updated = state.apply_fn(
                variables,
                batch["images"],
                batch["K"],
                batch["Rt"],
                train=True,
                mutable=mutable,
            )
            losses = detection_loss(
                out,
                targets,
                hm_alpha=l.hm_alpha,
                hm_beta=l.hm_beta,
                hm_weight=l.hm_weight,
                offset_weight=l.offset_weight,
                size_weight=l.size_weight,
            )
            new_stats = updated.get("batch_stats", state.batch_stats)
            return losses["total_loss"], (losses, new_stats)

        (loss, (losses, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads, new_stats)
        metrics = {k: v for k, v in losses.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def make_eval_step(cfg: Config, quant_head=None, quant_encoder=None):
    """Returns eval_step(state, batch) -> dict with decoded detections
    (padded/masked) + raw heads, all on device.

    ``quant_head``/``quant_encoder``: int8 serving params
    (vsta_tpu.ops.quant / quant_resnet) - the eval then scores the
    quantized serving path instead of the float stage."""
    e = cfg.eval
    m = cfg.model

    def eval_step(state: TrainState, batch: Dict[str, jax.Array]):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        out = state.apply_fn(
            variables, batch["images"], batch["K"], batch["Rt"], train=False,
            quant_head=quant_head, quant_encoder=quant_encoder,
        )
        det = decode_detections(
            out["heatmap"],
            out["offset"],
            out["size"],
            bounds=m.bev_bounds,
            conf_thresh=e.conf_thresh,
            nms_dist_m=e.nms_dist_m,
            max_dets=e.max_dets,
        )
        return {
            "boxes": det["boxes"],
            "scores": det["scores"],
            "valid": det["valid"],
            "heatmap": out["heatmap"],
        }

    return eval_step
