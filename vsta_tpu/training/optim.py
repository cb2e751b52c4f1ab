"""Optimizer and LR schedule construction (optax).

Reference: project/train.py:46-75. The reference's 'cosine_warm' chains
a LambdaLR warmup and a CosineAnnealingLR that BOTH step every epoch
(its `_Seq` wrapper), i.e. effective lr(e) = base * warmup(e) * cosine(e).
We implement that cleanly as a multiplicative warmup x cosine schedule
evaluated per optimizer step (epoch-granular factors, matching the
reference's per-epoch stepping).
"""

from __future__ import annotations

from typing import Optional

import optax

from ..config import Config


def lr_schedule(cfg: Config, steps_per_epoch: int) -> optax.Schedule:
    base = cfg.train.lr
    name = cfg.train.lr_scheduler
    epochs = max(1, cfg.train.epochs)
    spe = max(1, steps_per_epoch)

    if name == "step":
        # StepLR(step_size=10, gamma=0.5)
        return optax.exponential_decay(
            base, transition_steps=10 * spe, decay_rate=0.5, staircase=True
        )

    if name == "cosine_warm":
        warm = max(1, cfg.train.warmup_epochs)

        def sched(count):
            import jax.numpy as jnp

            epoch = count // spe
            warm_f = jnp.minimum((epoch + 1) / warm, 1.0)
            total = max(1, epochs - warm)
            cos_f = 0.5 * (1.0 + jnp.cos(jnp.pi * jnp.minimum(epoch, total) / total))
            return base * warm_f * cos_f

        return sched

    # default: plain cosine over all epochs
    return optax.cosine_decay_schedule(base, decay_steps=epochs * spe)


def build_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    sched = lr_schedule(cfg, steps_per_epoch)
    wd = cfg.train.weight_decay
    if cfg.train.opt.lower() == "adamw":
        tx = optax.adamw(learning_rate=sched, weight_decay=wd)
    else:
        # reference 'Adam' passes weight_decay to torch Adam = L2 penalty
        tx = optax.chain(
            optax.add_decayed_weights(wd) if wd > 0 else optax.identity(),
            optax.adam(learning_rate=sched),
        )
    if cfg.train.freeze_backbone:
        # reference ViewEncoder.freeze (encoders/base.py:26-28): zero out
        # updates for everything under encoder/backbone.
        def labels(params):
            from flax import traverse_util

            flat = traverse_util.flatten_dict(params)
            out = {
                k: ("frozen" if k[:2] == ("encoder", "backbone") else "train")
                for k in flat
            }
            return traverse_util.unflatten_dict(out)

        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, labels
        )
    if cfg.train.accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.train.accum_steps)
    return tx
