import numpy as np
import jax
import jax.numpy as jnp

from vsta_tpu.config import Config, DataConfig, ModelConfig, RuntimeConfig, TrainConfig, LossConfig
from vsta_tpu.data.synthetic import make_ring_camera
from vsta_tpu.training.optim import build_optimizer
from vsta_tpu.training.state import create_state, make_eval_step, make_train_step


def tiny_cfg(**runtime_kw) -> Config:
    return Config(
        data=DataConfig(batch_size=2, img_size=(48, 64), views=3, data_root=""),
        model=ModelConfig(
            backbone="simple",
            feat_dim=8,
            out_index=2,
            bev_size=(16, 32),
            bev_bounds=(-8.0, 8.0, -4.0, 4.0),
            bev_proj_ch=12,
            warp_impl="fused",
            fusion="concat",
        ),
        train=TrainConfig(epochs=2, lr=1e-3, accum_steps=1),
        loss=LossConfig(max_objects=8),
        runtime=RuntimeConfig(use_amp=False, **runtime_kw),
    )


def make_batch(cfg: Config, seed=0):
    rng = np.random.default_rng(seed)
    B, V = cfg.data.batch_size, cfg.data.views
    H, W = cfg.data.img_size
    Ks, Rts = zip(
        *(make_ring_camera(v, V, radius=10.0, height=4.0, img_hw=(H, W)) for v in range(V))
    )
    boxes = np.zeros((B, cfg.loss.max_objects, 4), np.float32)
    boxes[:, 0] = [0.0, 0.0, 0.6, 0.6]
    boxes[:, 1] = [2.0, 1.0, 0.6, 0.6]
    return {
        "images": jnp.array(rng.standard_normal((B, V, H, W, 3)).astype(np.float32)),
        "K": jnp.array(np.broadcast_to(np.stack(Ks).astype(np.float32), (B, V, 3, 3))),
        "Rt": jnp.array(np.broadcast_to(np.stack(Rts).astype(np.float32), (B, V, 4, 4))),
        "boxes_world": jnp.array(boxes),
        "num_boxes": jnp.full((B,), 2, jnp.int32),
        "frame_idx": jnp.arange(B, dtype=jnp.int32),
        "batch_mask": jnp.ones((B,), bool),
    }


def test_train_step_decreases_loss():
    cfg = tiny_cfg()
    tx = build_optimizer(cfg, steps_per_epoch=10)
    state = create_state(cfg, tx, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    batch = make_batch(cfg)
    losses = []
    for _ in range(30):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    # overfit check on a fixed batch: loss must drop substantially
    assert losses[-1] < losses[0] * 0.7, losses[:: max(1, len(losses) // 6)]


def test_train_step_updates_params_and_stats():
    cfg = tiny_cfg()
    tx = build_optimizer(cfg, steps_per_epoch=10)
    state = create_state(cfg, tx, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    batch = make_batch(cfg)
    p0 = jax.tree.map(np.asarray, state.params)
    state, _ = step(state, batch)
    changed = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()), state.params, p0
    )
    assert max(jax.tree.leaves(changed)) > 0
    assert int(state.step) == 1


def test_eval_step_decodes():
    cfg = tiny_cfg()
    tx = build_optimizer(cfg, steps_per_epoch=10)
    state = create_state(cfg, tx, jax.random.PRNGKey(0))
    eval_step = jax.jit(make_eval_step(cfg))
    out = eval_step(state, make_batch(cfg))
    assert out["boxes"].shape == (2, cfg.eval.max_dets, 4)
    assert out["valid"].dtype == jnp.bool_


def test_gradient_accumulation_matches_semantics():
    """ACCUM_STEPS=2 must apply updates every 2 steps (optax.MultiSteps)."""
    cfg = tiny_cfg()
    cfg = Config(
        data=cfg.data,
        model=cfg.model,
        train=TrainConfig(epochs=2, lr=1e-3, accum_steps=2),
        loss=cfg.loss,
        runtime=cfg.runtime,
    )
    tx = build_optimizer(cfg, steps_per_epoch=10)
    state = create_state(cfg, tx, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    batch = make_batch(cfg)
    p0 = jax.tree.map(np.asarray, state.params)
    state, _ = step(state, batch)  # micro-step 1: accumulate only
    diff1 = max(
        jax.tree.leaves(
            jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - b).max()), state.params, p0)
        )
    )
    assert diff1 == 0.0
    state, _ = step(state, batch)  # micro-step 2: apply
    diff2 = max(
        jax.tree.leaves(
            jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - b).max()), state.params, p0)
        )
    )
    assert diff2 > 0.0


def test_gradient_accumulation_equivalence():
    """Behavioral semantics (ref train.py:242-255): accum_steps=2 at
    batch B/2 must produce the SAME parameters as accum_steps=1 at batch
    B after the same number of optimizer updates. Holds exactly here
    because every sample carries the same positive count, so the
    batch-normalized CenterNet loss satisfies
    loss(B) = (loss(h1) + loss(h2)) / 2 and MultiSteps averages the
    accumulated grads ('simple' backbone: no BatchNorm stats to drift)."""
    import dataclasses

    base = tiny_cfg()
    cfg_full = dataclasses.replace(
        base,
        data=dataclasses.replace(base.data, batch_size=4),
        train=TrainConfig(epochs=2, lr=1e-3, accum_steps=1),
    )
    cfg_half = dataclasses.replace(
        base,
        data=dataclasses.replace(base.data, batch_size=2),
        train=TrainConfig(epochs=2, lr=1e-3, accum_steps=2),
    )

    full_batches = [make_batch(cfg_full, seed=s) for s in (0, 1)]

    def halves(batch):
        for lo in (0, 2):
            yield {k: v[lo:lo + 2] for k, v in batch.items()}

    tx = build_optimizer(cfg_full, steps_per_epoch=10)
    state_f = create_state(cfg_full, tx, jax.random.PRNGKey(0))
    step_f = jax.jit(make_train_step(cfg_full))
    for b in full_batches:
        state_f, _ = step_f(state_f, b)

    tx = build_optimizer(cfg_half, steps_per_epoch=10)
    state_h = create_state(cfg_half, tx, jax.random.PRNGKey(0))
    step_h = jax.jit(make_train_step(cfg_half))
    for b in full_batches:
        for h in halves(b):
            state_h, _ = step_h(state_h, h)

    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state_f.params,
        state_h.params,
    )
    assert max(jax.tree.leaves(diffs)) < 1e-5, (
        "accum=2 @ B/2 diverged from accum=1 @ B: "
        f"max param delta {max(jax.tree.leaves(diffs)):.2e}"
    )


def test_groupnorm_backbone_trains():
    """MODEL.NORM=group swaps the resnet's BatchNorm for GroupNorm-32:
    no batch_stats state at all (nothing rides the train step's stat
    update path), and the model still learns on a fixed batch."""
    import dataclasses

    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, backbone="resnet18", out_index=1, norm="group"
        ),
    )
    tx = build_optimizer(cfg, steps_per_epoch=10)
    state = create_state(cfg, tx, jax.random.PRNGKey(0))
    assert not state.batch_stats, "GroupNorm backbone must carry no batch_stats"
    step = jax.jit(make_train_step(cfg))
    batch = make_batch(cfg)
    losses = []
    for _ in range(15):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses[:: max(1, len(losses) // 5)]


def test_freeze_backbone_semantics():
    """TRAIN.FREEZE_BACKBONE = torch requires_grad=False on the encoder
    (ref base.py:26-28): backbone params AND BatchNorm running stats
    must not move, while the head still trains. The stop_gradient at the
    encoder boundary also lets XLA drop the encoder backward entirely
    (the optimizer-side zeroing alone still computed it)."""
    import dataclasses

    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg,
        # resnet18: has BatchNorm, so frozen running stats are observable
        model=dataclasses.replace(cfg.model, backbone="resnet18", out_index=1),
        train=TrainConfig(epochs=2, lr=1e-2, accum_steps=1, freeze_backbone=True),
    )
    tx = build_optimizer(cfg, steps_per_epoch=10)
    state = create_state(cfg, tx, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    batch = make_batch(cfg)
    p0 = jax.tree.map(np.asarray, state.params)
    s0 = jax.tree.map(np.asarray, state.batch_stats)
    for _ in range(2):
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))

    bb0, bb1 = p0["encoder"]["backbone"], state.params["encoder"]["backbone"]
    bb_delta = max(
        jax.tree.leaves(
            jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - b).max()), bb1, bb0)
        )
    )
    assert bb_delta == 0.0, f"frozen backbone moved by {bb_delta}"
    stats_delta = max(
        jax.tree.leaves(
            jax.tree.map(
                lambda a, b: float(np.abs(np.asarray(a) - b).max()),
                state.batch_stats,
                s0,
            )
        )
    )
    assert stats_delta == 0.0, (
        f"frozen backbone's BN running stats moved by {stats_delta} "
        "(eval-mode BN must hold them)"
    )
    head_delta = max(
        jax.tree.leaves(
            jax.tree.map(
                lambda a, b: float(np.abs(np.asarray(a) - b).max()),
                state.params["detector"],
                p0["detector"],
            )
        )
    )
    assert head_delta > 0.0, "head stopped training under FREEZE_BACKBONE"


def test_train_step_deform_fused_backward_matches_xla():
    """A full deform_attn train step through the fused grouped backward
    kernel (scatter_tapdot_grouped, interpret mode) produces the same
    losses as the XLA gather path - the compiled-TPU twin of this check
    rides the bench kernel canary."""
    import dataclasses

    import vsta_tpu.ops.warp as warp_mod

    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, fusion="deform_attn", attn_heads=2, attn_points=2,
            attn_stride=2,
        ),
    )
    batch = make_batch(cfg)

    def run(n=3):
        tx = build_optimizer(cfg, steps_per_epoch=10)
        state = create_state(cfg, tx, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(cfg))
        losses = []
        for _ in range(n):
            state, metrics = step(state, batch)
            losses.append(float(metrics["total_loss"]))
        return losses

    ref = run()
    warp_mod.FORCE_GROUPED_INTERPRET = True
    try:
        got = run()
    finally:
        warp_mod.FORCE_GROUPED_INTERPRET = False
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, rtol=2e-4)


def test_train_step_attn_fusion_learns():
    """The attention-fusion family (per-cell softmax view gating - the
    reference's stubbed AttentionFusion, fusion/fusion.py:25-36) trains:
    loss drops on a fixed batch and all grads are finite."""
    import dataclasses

    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, fusion="attn")
    )
    tx = build_optimizer(cfg, steps_per_epoch=10)
    state = create_state(cfg, tx, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    batch = make_batch(cfg)
    losses = []
    for _ in range(30):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses[:: max(1, len(losses) // 6)]
