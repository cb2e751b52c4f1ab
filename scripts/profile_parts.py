#!/usr/bin/env python
"""Component-level timing breakdown of the flagship forward pass.

VERDICT round 1, item 6: profile where the 392 f/s inference rate goes.
Times each stage in isolation with the same chained-N slope method as
bench.py (the only honest timing through this rig's TPU tunnel, whose
``block_until_ready`` acks at dispatch):

  encoder      - Flax backbone over B*V images
  warp+proj    - fused homography warp + view projection (the Pallas path)
  head         - CenterNet stem + output convs on the BEV map
  decode       - maxpool-NMS + top-k + greedy NMS
  full         - end-to-end forward + decode (the bench headline program)

Also prints XLA cost-analysis FLOPs per stage and an implied bf16 MFU.

Usage: python scripts/profile_parts.py [--batch 16]
"""

import argparse
import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_LO, N_HI, N_REPEAT = 2, 12, 3


def slope_time(run_n, *args):
    """Seconds per iteration via two-point chained-N slope."""

    def timed(n):
        best = float("inf")
        for _ in range(N_REPEAT):
            t0 = time.perf_counter()
            float(run_n(n, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    float(run_n(N_LO, *args))  # compile
    float(run_n(N_HI, *args))
    return (timed(N_HI) - timed(N_LO)) / (N_HI - N_LO)


def chained(fn):
    """Wrap a (args -> scalar) fn into an n-chained jit program."""

    @functools.partial(__import__("jax").jit, static_argnums=(0,))
    def run_n(n, *args):
        import jax
        import jax.numpy as jnp

        def body(i, acc):
            return fn(*args, acc)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    return run_n


def flops_of(fn, *args):
    import jax

    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def profile_train(args):
    """Training-step breakdown: full step, fwd+loss, bwd-only estimate."""
    import jax
    import jax.numpy as jnp

    from vsta_tpu.config import load_config
    from vsta_tpu.data.synthetic import make_ring_camera
    from vsta_tpu.training.optim import build_optimizer
    from vsta_tpu.training.state import create_state, make_train_step

    cfg = load_config(args.config)
    B, V = args.batch, cfg.data.views
    H, W = cfg.data.img_size
    rng = np.random.default_rng(0)
    Ks, Rts = zip(*(make_ring_camera(v, V, img_hw=(H, W)) for v in range(V)))
    boxes = np.zeros((B, cfg.loss.max_objects, 4), np.float32)
    boxes[:, 0] = [0.0, 0.0, 0.6, 0.6]
    batch = {
        "images": jnp.asarray(rng.standard_normal((B, V, H, W, 3)), jnp.float32),
        "K": jnp.asarray(np.broadcast_to(np.stack(Ks), (B, V, 3, 3)), jnp.float32),
        "Rt": jnp.asarray(np.broadcast_to(np.stack(Rts), (B, V, 4, 4)), jnp.float32),
        "boxes_world": jnp.asarray(boxes),
        "num_boxes": jnp.full((B,), 1, jnp.int32),
        "frame_idx": jnp.arange(B, dtype=jnp.int32),
        "batch_mask": jnp.ones((B,), bool),
    }
    tx = build_optimizer(cfg, steps_per_epoch=100)
    state = create_state(cfg, tx, jax.random.PRNGKey(0))
    step = make_train_step(cfg)
    import functools as ft

    from vsta_tpu.ops.losses import detection_loss
    from vsta_tpu.ops.splat import build_targets

    l, m = cfg.loss, cfg.model

    def fwd_loss(params, batch, eps):
        targets = build_targets(
            batch["boxes_world"], batch["num_boxes"], bounds=m.bev_bounds,
            bev_hw=m.bev_size, min_overlap=l.gaussian_iou,
            min_radius=l.gaussian_min_radius,
        )
        variables = {"params": params}
        mutable = []
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
            mutable = ["batch_stats"]
        out, _ = state.apply_fn(
            variables, batch["images"] + eps, batch["K"], batch["Rt"],
            train=True, mutable=mutable,
        )
        losses = detection_loss(
            out, targets, hm_alpha=l.hm_alpha, hm_beta=l.hm_beta,
            hm_weight=l.hm_weight, offset_weight=l.offset_weight,
            size_weight=l.size_weight,
        )
        return losses["total_loss"]

    @ft.partial(jax.jit, static_argnums=(0,))
    def run_full(n, state, batch):
        def body(carry, _):
            new_state, mm = step(carry, batch)
            return new_state, mm["total_loss"]
        state2, losses = jax.lax.scan(body, state, None, length=n)
        return losses[-1]

    @ft.partial(jax.jit, static_argnums=(0,))
    def run_fwd(n, state, batch):
        def body(i, acc):
            return fwd_loss(state.params, batch, acc * 1e-30)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    @ft.partial(jax.jit, static_argnums=(0,))
    def run_grad(n, state, batch):
        # reduce over EVERY grad leaf - summing a single leaf would let
        # XLA dead-code-eliminate most of the backward
        def body(i, acc):
            g = jax.grad(fwd_loss)(state.params, batch, acc * 1e-30)
            return jax.tree_util.tree_reduce(
                lambda s, x: s + x.sum().astype(jnp.float32), g,
                jnp.float32(0.0))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    global N_LO, N_HI
    N_LO, N_HI = 2, 6
    for name, fn in (
        ("train step (fwd+bwd+opt)", run_full),
        ("fwd+loss only", run_fwd),
        ("fwd+bwd (value_and_grad)", run_grad),
    ):
        dt = slope_time(fn, state, batch)
        print(f"{name:26s} {dt*1e3:8.2f} ms  {B/dt:8.1f} f/s")

    # ---- per-stage fwd+bwd isolation (where does the backward go?)
    from vsta_tpu.geometry import ground_grid
    from vsta_tpu.geometry.bev import bev_sample_coords_with_depth
    from vsta_tpu.models.encoders.encoder import ViewEncoder
    from vsta_tpu.models.heads import BEVDetectorHead

    cdt = jnp.bfloat16 if cfg.runtime.use_amp else jnp.float32
    Hb, Wb = m.bev_size
    enc = ViewEncoder(backbone=m.backbone, feat_dim=m.feat_dim,
                      out_index=m.out_index, dtype=cdt)
    enc_vars = enc.init(jax.random.PRNGKey(0), batch["images"], train=False)
    feats = enc.apply(enc_vars, batch["images"], train=False)
    _, _, Hf, Wf, C = feats.shape

    def enc_grad_fn(ev, images, eps):
        f = enc.apply(ev, images + eps, train=False)
        return jnp.sum(f.astype(jnp.float32))

    grid = ground_grid(Hb, Wb, m.bev_bounds)
    coords, _ = bev_sample_coords_with_depth(
        batch["K"][0], batch["Rt"][0], (H, W), (Hf, Wf), grid)
    rngk = np.random.default_rng(1)
    kern = jnp.asarray(rngk.standard_normal((V, C, m.bev_proj_ch)), jnp.float32) * 0.02
    bias = jnp.zeros((m.bev_proj_ch,), jnp.float32)
    on_tpu = jax.default_backend() == "tpu"
    if m.warp_impl == "pallas" and on_tpu:
        from vsta_tpu.ops.warp_pallas import fused_warp_proj_pallas as warp_fn
    else:
        from vsta_tpu.ops.warp import fused_warp_proj as warp_fn

    def warp_grad_fn(f, k, eps):
        out = warp_fn(f + eps, coords, k, bias, compute_dtype=cdt)
        return jnp.sum(out.astype(jnp.float32))

    head = BEVDetectorHead(bev_bounds=m.bev_bounds, bev_size=(Hb, Wb),
                           default_box_wh=l.default_box_wh, dtype=cdt)
    bev_feat = jnp.asarray(
        rngk.standard_normal((B, Hb, Wb, m.bev_proj_ch + 2)), jnp.float32)
    head_vars = head.init(jax.random.PRNGKey(0), bev_feat)

    def head_grad_fn(hv, bf, eps):
        out = head.apply(hv, bf + eps)
        return jnp.sum(out["heatmap"].astype(jnp.float32))

    def timed_grad(name, fn, wrt, *fargs):
        @ft.partial(jax.jit, static_argnums=(0,))
        def run_g(n, *a):
            def body(i, acc):
                g = jax.grad(fn, argnums=wrt)(*a, acc * 1e-30)
                return jax.tree_util.tree_reduce(
                    lambda s, x: s + x.sum().astype(jnp.float32), g,
                    jnp.float32(0.0))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        dt = slope_time(run_g, *fargs)
        print(f"{name:26s} {dt*1e3:8.2f} ms  {B/dt:8.1f} f/s")

    timed_grad("encoder fwd+bwd", enc_grad_fn, 0, enc_vars, batch["images"])
    timed_grad("warp+proj fwd+bwd", warp_grad_fn, (0, 1), feats, kern)
    timed_grad("head fwd+bwd", head_grad_fn, 0, head_vars, bev_feat)

    # ---- residual breakdown: the pieces outside encoder/warp/head
    Hb_, Wb_ = m.bev_size
    preds = {
        "heatmap_logits": jnp.asarray(
            rngk.standard_normal((B, Hb_, Wb_, 1)), jnp.float32),
        "offset": jnp.asarray(
            rngk.random((B, Hb_, Wb_, 2)), jnp.float32),
        "size_raw": jnp.asarray(
            rngk.standard_normal((B, Hb_, Wb_, 2)), jnp.float32),
    }

    def tgt_loss_fn(p, eps):
        targets = build_targets(
            batch["boxes_world"], batch["num_boxes"], bounds=m.bev_bounds,
            bev_hw=m.bev_size, min_overlap=l.gaussian_iou,
            min_radius=l.gaussian_min_radius,
        )
        pp = {k: v + eps for k, v in p.items()}
        losses = detection_loss(
            pp, targets, hm_alpha=l.hm_alpha, hm_beta=l.hm_beta,
            hm_weight=l.hm_weight, offset_weight=l.offset_weight,
            size_weight=l.size_weight,
        )
        return losses["total_loss"]

    timed_grad("targets+loss fwd+bwd", tgt_loss_fn, 0, preds)

    grads0 = jax.jit(jax.grad(fwd_loss))(state.params, batch, jnp.float32(0.0))

    @ft.partial(jax.jit, static_argnums=(0,))
    def run_opt(n, state, grads):
        def body(carry, _):
            ns = carry.apply_gradients(grads, carry.batch_stats)
            return ns, ns.step
        state2, _ = jax.lax.scan(body, state, None, length=n)
        return state2.step

    dt = slope_time(run_opt, state, grads0)
    print(f"{'optimizer update only':26s} {dt*1e3:8.2f} ms  {B/dt:8.1f} f/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--config", default="configs/wildtrack.yaml")
    ap.add_argument("--train", action="store_true")
    args = ap.parse_args()
    if args.train:
        return profile_train(args)

    import jax
    import jax.numpy as jnp

    from vsta_tpu.config import load_config
    from vsta_tpu.data.synthetic import make_ring_camera
    from vsta_tpu.models import BEVNet
    from vsta_tpu.ops.decode import decode_detections

    cfg = load_config(args.config)
    model = BEVNet.from_config(cfg)
    B, V = args.batch, cfg.data.views
    H, W = cfg.data.img_size
    Hb, Wb = cfg.model.bev_size

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((B, V, H, W, 3)), jnp.float32)
    Ks, Rts = zip(*(make_ring_camera(v, V, img_hw=(H, W)) for v in range(V)))
    K = jnp.asarray(np.broadcast_to(np.stack(Ks), (B, V, 3, 3)), jnp.float32)
    Rt = jnp.asarray(np.broadcast_to(np.stack(Rts), (B, V, 4, 4)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images, K, Rt, train=False)

    dev_kind = jax.devices()[0].device_kind
    peak = 197e12 if "v5" in dev_kind.lower() else 197e12
    print(f"device={dev_kind} batch={B} img={H}x{W} views={V} bev={Hb}x{Wb}")

    results = {}

    # ---- full forward + decode (bench headline program)
    def full(variables, images, K, Rt, acc):
        out = model.apply(variables, images + acc * 1e-30, K, Rt, train=False)
        det = decode_detections(
            out["heatmap"], out["offset"], out["size"],
            bounds=cfg.model.bev_bounds, conf_thresh=cfg.eval.conf_thresh,
            nms_dist_m=cfg.eval.nms_dist_m, max_dets=cfg.eval.max_dets,
        )
        return (jnp.sum(det["boxes"]).astype(jnp.float32)
                + jnp.sum(det["scores"]) + jnp.sum(out["heatmap"]))

    # ---- forward only
    def fwd(variables, images, K, Rt, acc):
        out = model.apply(variables, images + acc * 1e-30, K, Rt, train=False)
        return jnp.sum(out["heatmap"]).astype(jnp.float32)

    # ---- encoder only
    from vsta_tpu.models.encoders.encoder import ViewEncoder

    enc = ViewEncoder(
        backbone=cfg.model.backbone, feat_dim=cfg.model.feat_dim,
        out_index=cfg.model.out_index,
        dtype=jnp.bfloat16 if cfg.runtime.use_amp else jnp.float32,
    )
    enc_vars = enc.init(jax.random.PRNGKey(0), images, train=False)

    def enc_only(enc_vars, images, acc):
        f = enc.apply(enc_vars, images + acc * 1e-30, train=False)
        return jnp.sum(f.astype(jnp.float32))

    feats = enc.apply(enc_vars, images, train=False)
    _, _, Hf, Wf, C = feats.shape
    print(f"encoder feats: [{B},{V},{Hf},{Wf},{C}] dtype={feats.dtype}")

    # ---- warp+proj only (flagship pallas path on TPU)
    from vsta_tpu.geometry import ground_grid
    from vsta_tpu.geometry.bev import bev_sample_coords_with_depth

    grid = ground_grid(Hb, Wb, cfg.model.bev_bounds)
    coords, _ = bev_sample_coords_with_depth(K[0], Rt[0], (H, W), (Hf, Wf), grid)
    kern = jnp.asarray(
        rng.standard_normal((V, C, cfg.model.bev_proj_ch)), jnp.float32) * 0.02
    bias = jnp.zeros((cfg.model.bev_proj_ch,), jnp.float32)
    compute_dtype = jnp.bfloat16 if cfg.runtime.use_amp else jnp.float32

    on_tpu = jax.default_backend() == "tpu"
    if cfg.model.warp_impl == "pallas" and on_tpu:
        from vsta_tpu.ops.warp_pallas import fused_warp_proj_pallas as warp_fn

        def warp_only(feats, coords, kern, bias, acc):
            out = warp_fn(feats + acc * 1e-30, coords, kern, bias,
                          compute_dtype=compute_dtype)
            return jnp.sum(out.astype(jnp.float32))
    else:
        from vsta_tpu.ops.warp import fused_warp_proj as warp_fn

        def warp_only(feats, coords, kern, bias, acc):
            out = warp_fn(feats + acc * 1e-30, coords, kern, bias,
                          compute_dtype=compute_dtype)
            return jnp.sum(out.astype(jnp.float32))

    # ---- head only
    from vsta_tpu.models.heads import BEVDetectorHead

    head = BEVDetectorHead(
        bev_bounds=cfg.model.bev_bounds, bev_size=(Hb, Wb),
        default_box_wh=cfg.loss.default_box_wh, dtype=compute_dtype,
    )
    bev_feat = jnp.asarray(
        rng.standard_normal((B, Hb, Wb, cfg.model.bev_proj_ch + 2)), jnp.float32)
    head_vars = head.init(jax.random.PRNGKey(0), bev_feat)

    def head_only(head_vars, bev_feat, acc):
        out = head.apply(head_vars, bev_feat + acc * 1e-30)
        return jnp.sum(out["heatmap"]).astype(jnp.float32)

    # ---- decode only
    hm = jax.nn.sigmoid(jnp.asarray(
        rng.standard_normal((B, Hb, Wb, 1)), jnp.float32) * 3 - 3)
    off = jnp.zeros((B, Hb, Wb, 2), jnp.float32) + 0.5
    size = jnp.ones((B, Hb, Wb, 2), jnp.float32) * 4

    def dec_only(hm, off, size, acc):
        det = decode_detections(
            hm + acc * 1e-30, off, size,
            bounds=cfg.model.bev_bounds, conf_thresh=cfg.eval.conf_thresh,
            nms_dist_m=cfg.eval.nms_dist_m, max_dets=cfg.eval.max_dets,
        )
        return jnp.sum(det["boxes"]).astype(jnp.float32) + jnp.sum(det["scores"])

    stages = [
        ("full fwd+decode", full, (variables, images, K, Rt)),
        ("forward only", fwd, (variables, images, K, Rt)),
        ("encoder", enc_only, (enc_vars, images)),
        ("warp+proj", warp_only, (feats, coords, kern, bias)),
        ("head", head_only, (head_vars, bev_feat)),
        ("decode", dec_only, (hm, off, size)),
    ]
    for name, fn, fargs in stages:
        try:
            dt = slope_time(chained(fn), *fargs)
            fl = flops_of(lambda *a: fn(*a, jnp.float32(0.0)), *fargs)
            mfu = 100.0 * fl / max(dt, 1e-12) / peak
            results[name] = (dt, fl, mfu)
            print(f"{name:18s} {dt*1e3:8.2f} ms/iter  {B/dt:8.1f} f/s  "
                  f"{fl/1e9:8.1f} GFLOP  MFU {mfu:5.1f}%")
        except Exception as e:
            print(f"{name:18s} FAILED: {e}")

    return results


if __name__ == "__main__":
    main()
