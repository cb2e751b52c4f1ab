#!/usr/bin/env python
"""Benchmark harness.

Times the TPU pipeline (jit forward + on-device decode, flagship
configs/wildtrack.yaml shapes: 7 views x 270x480 -> BEV 120x360) against
the CPU reference executed directly from /root/reference (its own
fallback code paths: conv encoder + grid_sample warp + Python decode),
both on identical synthetic Wildtrack-shaped inputs.

Measurement note: on this rig the TPU is reached through a tunnel whose
``block_until_ready`` acks at dispatch, not at completion - so naive
async-loop timing overstates throughput by orders of magnitude. We
instead chain N data-dependent steps inside ONE jit program ending in a
scalar fetch (a real device->host round trip), and take the slope
between two N values to cancel the tunnel latency.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_PATH = os.environ.get("VSTA_REFERENCE", "/root/reference/project")
BATCH = 16
N_LO, N_HI = 2, 12
N_REPEAT = 3


def bench_tpu():
    import functools

    import jax

    # persistent compile cache (env vars are latched before this process
    # can set them - sitecustomize imports jax at startup - so update
    # jax.config directly; backends initialize lazily, so this is early
    # enough)
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from vsta_tpu.config import load_config
    from vsta_tpu.data.synthetic import make_ring_camera
    from vsta_tpu.models import BEVNet
    from vsta_tpu.ops.decode import decode_detections

    cfg = load_config("configs/wildtrack.yaml")
    model = BEVNet.from_config(cfg)
    B, V = BATCH, cfg.data.views
    H, W = cfg.data.img_size

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((B, V, H, W, 3)), jnp.float32)
    Ks, Rts = zip(*(make_ring_camera(v, V, img_hw=(H, W)) for v in range(V)))
    K = jnp.asarray(np.broadcast_to(np.stack(Ks), (B, V, 3, 3)), jnp.float32)
    Rt = jnp.asarray(np.broadcast_to(np.stack(Rts), (B, V, 4, 4)), jnp.float32)

    variables = model.init(jax.random.PRNGKey(0), images, K, Rt, train=False)

    def step_scalar(variables, images, K, Rt):
        out = model.apply(variables, images, K, Rt, train=False)
        det = decode_detections(
            out["heatmap"],
            out["offset"],
            out["size"],
            bounds=cfg.model.bev_bounds,
            conf_thresh=cfg.eval.conf_thresh,
            nms_dist_m=cfg.eval.nms_dist_m,
            max_dets=cfg.eval.max_dets,
        )
        return (
            jnp.sum(det["boxes"]).astype(jnp.float32)
            + jnp.sum(det["scores"])
            + jnp.sum(out["heatmap"])
        )

    @functools.partial(jax.jit, static_argnums=(0,))
    def run_n(n, variables, images, K, Rt):
        def body(i, acc):
            # acc folds into the input: serial dependency between steps,
            # numerically negligible (|acc*1e-30| << 1e-20).
            s = step_scalar(variables, images + acc * 1e-30, K, Rt)
            return s
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed(n):
        best = float("inf")
        for _ in range(N_REPEAT):
            t0 = time.perf_counter()
            float(run_n(n, variables, images, K, Rt))  # scalar fetch
            best = min(best, time.perf_counter() - t0)
        return best

    float(run_n(N_LO, variables, images, K, Rt))  # compile lo
    float(run_n(N_HI, variables, images, K, Rt))  # compile hi
    dt = (timed(N_HI) - timed(N_LO)) / (N_HI - N_LO)
    return B / max(dt, 1e-9)


def bench_reference_cpu(n_iters=3):
    """Run the torch reference's BEVNet forward on CPU, as shipped
    (executed in place from /root/reference; nothing is copied)."""
    try:
        import torch

        sys.path.insert(0, REFERENCE_PATH)
        from models.model_wrapper import BEVNet as RefBEVNet  # noqa

        cfg = {
            "MODEL": {
                "BACKBONE": "efficientnet_b0",
                "PRETRAINED": False,
                "FEAT_DIM": 1280,
                "OUT_INDEX": 2,
                "BEV_SIZE": [32, 120, 360],
                "BEV_BOUNDS": [-24.0, 24.0, -7.2, 7.2],
                "BEV_PROJ_CH": 128,
            },
            "EVAL": {"CONF_THRESH": 0.4, "NMS_DIST_M": 0.5},
            "LOSS": {"DEFAULT_BOX_WH": [0.6, 0.6], "MAX_OBJECTS": 64},
        }
        from vsta_tpu.data.synthetic import make_ring_camera

        B, V, H, W = 1, 7, 270, 480
        model = RefBEVNet(cfg)
        model.eval()
        images = torch.randn(B, V, 3, H, W)
        Ks, Rts = zip(*(make_ring_camera(v, V, img_hw=(H, W)) for v in range(V)))
        batch = {
            "images": images,
            "calib": {
                "intrinsic": [[torch.tensor(K, dtype=torch.float32) for K in Ks]],
                "extrinsic": [[torch.tensor(Rt, dtype=torch.float32) for Rt in Rts]],
            },
        }
        with torch.no_grad():
            model(batch)  # warmup (also builds lazy modules)
            t0 = time.perf_counter()
            for _ in range(n_iters):
                model(batch)
            dt = time.perf_counter() - t0
        return B * n_iters / dt
    except Exception as e:
        print(f"[bench] reference CPU run failed ({e}); using recorded baseline", file=sys.stderr)
        return None


# Fastest reference-CPU rate observed on this machine (reference @
# /root/reference, fallback conv encoder since timm is absent). The live
# measurement fluctuates 4x with host load on this 1-core box; taking
# max(live, recorded) keeps the reported speedup conservative.
RECORDED_REFERENCE_FPS = 0.175


def main():
    # the TPU tunnel occasionally drops a compile (HTTP 500); retry
    tpu_fps = None
    for attempt in range(3):
        try:
            tpu_fps = bench_tpu()
            break
        except Exception as e:
            print(f"[bench] TPU attempt {attempt} failed: {e}", file=sys.stderr)
            time.sleep(20)
    if tpu_fps is None:
        print(json.dumps({"metric": "wildtrack_e2e_frames_per_sec", "value": 0.0,
                          "unit": "frames/s/chip", "vs_baseline": 0.0}))
        return
    ref_fps = bench_reference_cpu()
    ref_fps = max(ref_fps or 0.0, RECORDED_REFERENCE_FPS)
    print(
        json.dumps(
            {
                "metric": "wildtrack_e2e_frames_per_sec",
                "value": round(tpu_fps, 3),
                "unit": "frames/s/chip",
                "vs_baseline": round(tpu_fps / max(1e-9, ref_fps), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
