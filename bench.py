#!/usr/bin/env python
"""Benchmark harness.

Times the TPU pipeline (flagship configs/wildtrack.yaml shapes: 7 views
x 270x480 -> BEV 120x360) against the CPU reference executed directly
from /root/reference (its own fallback code paths: conv encoder +
grid_sample warp + Python decode), on identical Wildtrack-shaped inputs.

Stages (VERDICT round 2, item 1: driver-proof ordering):
  1. inference fps/chip (jit forward + on-device decode) - measured
     FIRST and its headline JSON printed IMMEDIATELY, so a driver
     timeout can never produce an empty artifact again (BENCH_r02 was
     rc=124/parsed=null because the headline printed last);
  2. compiled-kernel parity canary (grouped sampler + resident warp vs
     the XLA path on tiny shapes) - every driver bench run doubles as
     compiled-kernel validation;
  3. train fps/chip, deformable-train fps/chip, int8-serving fps,
     input-included fps - each gated on a wall-clock budget
     (VSTA_BENCH_BUDGET seconds, default 900) and its JSON line printed
     the moment it completes.
The combined headline (with extras) is printed again LAST so a tail
parser still picks up the richest line when the run completes.

Measurement note: on this rig the TPU is reached through a tunnel whose
``block_until_ready`` acks at dispatch, not at completion - so naive
async-loop timing overstates throughput by orders of magnitude. We
instead chain N data-dependent steps ending in a scalar fetch (a real
device->host round trip), and take the slope between two N values to
cancel the tunnel latency. The step count is a DYNAMIC fori_loop trip
count, so each stage compiles exactly one program.
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
TRAIN_BATCH = 16  # sweep 2026-08-17: b8 102 f/s, b16 121.5, b24 107 (loses
                  # warp VMEM residency), b32 115.5 - b16 is the knee
TRAIN_N_LO, TRAIN_N_HI = 2, 6
PIPELINE_FRAMES = 12  # synthetic frames on disk for the input-included run

T0 = time.monotonic()
BUDGET = float(os.environ.get("VSTA_BENCH_BUDGET", "900"))


def _remaining() -> float:
    return BUDGET - (time.monotonic() - T0)


_HEADLINE_EMITTED = False
_DONE = False  # all intended lines emitted; watchdog must not exit(3)


def _emit(obj) -> None:
    global _HEADLINE_EMITTED
    if obj.get("metric") == "wildtrack_e2e_frames_per_sec":
        _HEADLINE_EMITTED = True
    print(json.dumps(obj), flush=True)


def _probe_accelerator(timeout_s: float = None) -> bool:
    """True when the ambient accelerator answers a tiny matmul within
    ``timeout_s``, probed in a SUBPROCESS. A stalled TPU tunnel hangs
    ``jax.devices()`` inside C forever - in-process there is no way to
    time that out or to switch platforms afterwards. Probing in a child
    lets this process fall back to the CPU backend *before* its own jax
    backend latches, so a tunnel outage at driver time still yields a
    real (if small) measured number instead of the watchdog's 0.0."""
    import subprocess

    if timeout_s is None:
        # tunable: a loaded rig's healthy-but-slow cold start (jax import
        # + TPU client init + first compile) must not be misclassified as
        # an outage and silently demote the artifact to cpu-fallback
        timeout_s = float(os.environ.get("VSTA_BENCH_PROBE_TIMEOUT", "150"))
    code = (
        "import jax\n"
        "assert jax.default_backend() != 'cpu', 'ambient backend is cpu'\n"
        "import jax.numpy as jnp\n"
        "(jnp.ones((8, 128), jnp.bfloat16) @ jnp.ones((128, 8), jnp.bfloat16)"
        ").block_until_ready()\n"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s, capture_output=True
        )
        if proc.returncode != 0:
            print(f"[bench] accelerator probe failed: "
                  f"{proc.stderr.decode(errors='replace')[-300:]}",
                  file=sys.stderr)
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        print(f"[bench] accelerator probe timed out after {timeout_s:.0f}s "
              "(stalled TPU tunnel?)", file=sys.stderr)
        return False


_FALLBACK_ACTIVE = False


def _enter_cpu_fallback() -> None:
    """Shrink the run so the CPU backend finishes within budget: batch 2,
    1-3-step chains, inference stage only (shapes stay flagship - the
    metric means the same thing, just measured on the CPU backend)."""
    global BATCH, N_LO, N_HI, N_REPEAT, _FALLBACK_ACTIVE
    from vsta_tpu.utils.platform import select_platform

    select_platform("cpu")
    BATCH, N_LO, N_HI, N_REPEAT = 2, 1, 3, 1
    os.environ["VSTA_BENCH_FAST"] = "1"
    _FALLBACK_ACTIVE = True


def _start_watchdog(grace: float = 30.0) -> None:
    """Hard wall-clock backstop. A stalled TPU tunnel blocks a jit
    dispatch inside C indefinitely - the between-stage budget checks
    never run, the driver times the whole process out, and (round 2) the
    artifact is lost. The watchdog force-exits at BUDGET+grace: every
    line _emit already flushed survives on stdout, and if the FIRST
    stage hung it emits an explicit 0.0 headline so the artifact is
    parseable either way."""
    import threading

    def guard():
        delay = _remaining() + grace
        if delay > 0:
            time.sleep(delay)
        if _DONE:
            # every intended line is already on stdout (e.g. only the
            # trailing live reference-CPU rerun overran the budget): a
            # complete, valid artifact must not be classified as a
            # failed run by exit-code-gating drivers (advisor round 3)
            print("[bench] watchdog: budget exceeded after completion; "
                  "exiting 0", file=sys.stderr, flush=True)
            sys.stdout.flush()
            os._exit(0)
        if not _HEADLINE_EMITTED:
            line = {"metric": "wildtrack_e2e_frames_per_sec", "value": 0.0,
                    "unit": "frames/s/chip", "vs_baseline": 0.0,
                    "error": "budget exceeded before first measurement "
                             "(stalled TPU tunnel?)"}
            if _FALLBACK_ACTIVE:
                line["platform"] = "cpu-fallback"
                line["error"] = ("cpu-fallback compile exceeded the "
                                 "budget before first measurement")
            _emit(line)
        print("[bench] watchdog: wall-clock budget exceeded, force-exiting",
              file=sys.stderr, flush=True)
        sys.stdout.flush()
        os._exit(3)

    threading.Thread(target=guard, daemon=True, name="bench-watchdog").start()


# bf16 peak per chip by device_kind substring (for the MFU estimate)
_PEAK_BF16 = {
    "v5 lite": 197e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v3": 123e12,
    "v6e": 918e12,
    "v6 lite": 918e12,
}


def _setup_jax():
    import jax

    # persistent compile cache (env vars are latched before this process
    # can set them - sitecustomize imports jax at startup - so update
    # jax.config directly; backends initialize lazily, so this is early
    # enough)
    from vsta_tpu.utils.platform import enable_compile_cache

    enable_compile_cache(os.path.dirname(os.path.abspath(__file__)))
    return jax


def bench_tpu():
    jax = _setup_jax()
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

    # shared chained-N slope protocol (vsta_tpu.utils.timing is the one
    # copy of the measurement-critical code; the scripts/ benches ride
    # the same helper)
    from vsta_tpu.utils.timing import chained_slope_time

    dt = chained_slope_time(
        lambda im, k, r: step_scalar(variables, im, k, r),
        images, K, Rt, n_lo=N_LO, n_hi=N_HI, repeat=N_REPEAT,
    )
    fps = B / max(dt, 1e-9)

    # MFU estimate from XLA's own cost model for the forward program
    # (separate 1-call compile; skipped when the budget is nearly spent)
    mfu_pct = None
    if _remaining() > 90 and jax.default_backend() == "tpu":
        try:
            compiled = (
                jax.jit(step_scalar).lower(variables, images, K, Rt).compile()
            )
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops_per_call = float(ca.get("flops", 0.0))
            kind = jax.devices()[0].device_kind.lower()
            peak = next((v for k, v in _PEAK_BF16.items() if k in kind), 197e12)
            if flops_per_call > 0:
                mfu_pct = 100.0 * (flops_per_call / B) * fps / peak
        except Exception as e:  # cost model availability varies by backend
            print(f"[bench] MFU estimate unavailable: {e}", file=sys.stderr)
    return fps, mfu_pct


def bench_kernel_canary():
    """Tiny compiled-TPU parity check: grouped Pallas sampler + resident
    warp kernel vs the XLA gather path (VERDICT round 2, item 9). Returns
    (ok, max_err) or None off-TPU."""
    jax = _setup_jax()
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        return None
    from vsta_tpu.ops.warp import _flat_taps
    from vsta_tpu.ops.warp_pallas import sample_tiles_grouped, warp_tiles_resident

    rng = np.random.default_rng(7)
    V, P, K, N = 2, 64, 256, 96
    feats = jnp.asarray(rng.standard_normal((V, P, K)), jnp.float32)
    anchors = np.stack(
        [rng.integers(0, 6, (V, N)), rng.integers(0, 7, (V, N))], axis=-1
    ).astype(np.int32)  # (ya, xa) into an 8-wide padded row-major map
    idx4 = _flat_taps(jnp.asarray(anchors), 8)
    wts = jnp.asarray(rng.random((V, N, 4)), jnp.float32)

    taps = jnp.take_along_axis(
        feats[:, :, None, :], idx4[..., None], axis=1
    ).reshape(V, N, 4, K)
    ref = jnp.einsum(
        "vnk,vnkc->vnc", wts, taps, precision=jax.lax.Precision.HIGHEST
    )
    got_g = sample_tiles_grouped(feats, idx4, wts, compute_dtype=jnp.float32)
    err_g = float(jnp.max(jnp.abs(got_g - ref)))  # per-group [V, N, K]

    got_r = warp_tiles_resident(feats, idx4, wts, compute_dtype=jnp.float32)
    err_r = float(
        jnp.max(jnp.abs(got_r.astype(jnp.float32) - jnp.sum(ref, axis=0)))
    )  # resident kernel returns the view-sum [N, K]

    # windowed kernel family: exactly the forms that engage when the
    # resident VMEM budget is exceeded (e.g. batch 24+), previously only
    # covered by tpu-marked pytest the driver never runs (VERDICT r3)
    from vsta_tpu.ops.warp_pallas import scatter_taps_windowed, warp_tiles_windowed

    got_w = warp_tiles_windowed(feats, idx4, wts, compute_dtype=jnp.float32)
    err_w = float(jnp.max(jnp.abs(got_w - jnp.sum(ref, axis=0))))

    gout = jnp.asarray(rng.standard_normal((V, N, K)), jnp.float32)
    contrib = wts[..., None] * gout[:, :, None, :]
    ref_dmap = (
        jnp.zeros((V, P, K)).at[jnp.arange(V)[:, None, None], idx4, :].add(contrib)
    )
    ref_dwts = jnp.einsum(
        "vnkc,vnc->vnk", taps, gout, precision=jax.lax.Precision.HIGHEST
    )
    dmap_w = scatter_taps_windowed(gout, idx4, wts, P, compute_dtype=jnp.float32)
    err_sw = float(jnp.max(jnp.abs(dmap_w - ref_dmap)))

    # fused backward kernel (dfeats scatter + d_wts tap dots in one pass)
    from vsta_tpu.ops.warp_pallas import scatter_tapdot_grouped

    fused = scatter_tapdot_grouped(feats, gout, idx4, wts, compute_dtype=jnp.float32)
    err_b = float("inf")
    if fused is not None:
        dmap, dwts = fused
        err_b = max(
            float(jnp.max(jnp.abs(dmap - ref_dmap))),
            float(jnp.max(jnp.abs(dwts - ref_dwts))),
        )
    max_err = max(err_g, err_r, err_w, err_sw, err_b)
    return max_err < 1e-3, max_err


def bench_train_tpu(config="configs/wildtrack.yaml", batch=None):
    """Full training-step rate (fwd+bwd+optimizer) at flagship shapes."""
    jax = _setup_jax()
    import jax.numpy as jnp

    from vsta_tpu.config import load_config
    from vsta_tpu.data.synthetic import make_ring_camera
    from vsta_tpu.training.optim import build_optimizer
    from vsta_tpu.training.state import create_state, make_train_step

    cfg = load_config(config)
    B, V = batch or TRAIN_BATCH, cfg.data.views
    H, W = cfg.data.img_size
    rng = np.random.default_rng(0)
    Ks, Rts = zip(*(make_ring_camera(v, V, img_hw=(H, W)) for v in range(V)))
    boxes = np.zeros((B, cfg.loss.max_objects, 4), np.float32)
    boxes[:, 0] = [0.0, 0.0, 0.6, 0.6]
    boxes[:, 1] = [2.0, 1.0, 0.6, 0.6]
    batch = {
        "images": jnp.asarray(rng.standard_normal((B, V, H, W, 3)), jnp.float32),
        "K": jnp.asarray(np.broadcast_to(np.stack(Ks), (B, V, 3, 3)), jnp.float32),
        "Rt": jnp.asarray(np.broadcast_to(np.stack(Rts), (B, V, 4, 4)), jnp.float32),
        "boxes_world": jnp.asarray(boxes),
        "num_boxes": jnp.full((B,), 2, jnp.int32),
        "frame_idx": jnp.arange(B, dtype=jnp.int32),
        "batch_mask": jnp.ones((B,), bool),
    }
    tx = build_optimizer(cfg, steps_per_epoch=100)
    state = create_state(cfg, tx, jax.random.PRNGKey(0))
    step = make_train_step(cfg)

    @jax.jit
    def run_n(n, state, batch):
        def body(i, carry):
            st, _ = carry
            st2, m = step(st, batch)
            return (st2, m["total_loss"])

        _, loss = jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))
        return loss

    def timed(n):
        best = float("inf")
        for _ in range(N_REPEAT):
            t0 = time.perf_counter()
            float(run_n(jnp.int32(n), state, batch))
            best = min(best, time.perf_counter() - t0)
        return best

    float(run_n(jnp.int32(1), state, batch))  # compile once
    dt = (timed(TRAIN_N_HI) - timed(TRAIN_N_LO)) / (TRAIN_N_HI - TRAIN_N_LO)
    return B / max(dt, 1e-9)


def bench_int8():
    """int8-detector-stem forward+decode fps at the headline shapes
    (ops/quant.py PTQ), directly comparable to the float headline - the
    int8 path's speed had never been captured in a driver artifact
    (VERDICT round 3, item 2)."""
    jax = _setup_jax()
    import jax.numpy as jnp

    from vsta_tpu.config import load_config
    from vsta_tpu.data.synthetic import make_ring_camera
    from vsta_tpu.export import calibrate_quant_head
    from vsta_tpu.models import BEVNet
    from vsta_tpu.utils.timing import forward_decode_fps

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
    qp = calibrate_quant_head(cfg, variables, [(images, K, Rt)])
    fps = forward_decode_fps(
        cfg, model, variables, images, K, Rt, quant_head=qp,
        n_lo=N_LO, n_hi=N_HI, repeat=N_REPEAT,
    )
    return fps, qp["impl"]


def bench_pipeline_tpu():
    """Input-included inference: disk -> decode -> Prefetcher -> device ->
    forward, over a synthetic full-res (1080x1920 PNG) Wildtrack tree.

    Returns (fps_cold, fps_warm): first epoch pays PNG decode + resize on
    the host (C++ codec); later epochs hit the RAM uint8 cache
    (DATA.CACHE_IMAGES, the production configuration for a fixed dataset).
    """
    import tempfile
    from pathlib import Path

    jax = _setup_jax()
    import jax.numpy as jnp

    from vsta_tpu.config import load_config
    from vsta_tpu.data.pipeline import Prefetcher
    from vsta_tpu.data.synthetic import generate_synthetic_wildtrack
    from vsta_tpu.data.wildtrack import WildtrackDataset

    from vsta_tpu.models import BEVNet

    root = Path(tempfile.gettempdir()) / f"vsta_bench_wildtrack_{PIPELINE_FRAMES}"
    marker = root / ".complete"
    if not marker.exists():
        generate_synthetic_wildtrack(
            root, n_frames=PIPELINE_FRAMES, n_views=7, n_people=12,
            img_hw=(1080, 1920), seed=3,
        )
        marker.touch()

    import dataclasses

    cfg = load_config("configs/wildtrack.yaml")
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, data_root=str(root), batch_size=4)
    )
    ds = WildtrackDataset(cfg, train=False)
    model = BEVNet.from_config(cfg)
    B, V = cfg.data.batch_size, cfg.data.views
    H, W = cfg.data.img_size
    sample = ds[0]
    images0 = jnp.asarray(sample["images"])[None].repeat(B, axis=0)
    K0 = jnp.asarray(sample["K"])[None].repeat(B, axis=0)
    Rt0 = jnp.asarray(sample["Rt"])[None].repeat(B, axis=0)
    variables = model.init(jax.random.PRNGKey(0), images0, K0, Rt0, train=False)

    @jax.jit
    def fwd_scalar(variables, images, K, Rt, acc):
        # serialize on acc WITHOUT promoting dtype: uint8 images must stay
        # uint8 so the DEVICE_NORMALIZE branch (the production path) runs
        dep = (acc * 1e-30).astype(images.dtype)
        out = model.apply(variables, images + dep, K, Rt, train=False)
        return jnp.sum(out["heatmap"]).astype(jnp.float32)

    def run_epochs(n_epochs):
        # prefetch=4 (round 5): the warm pipeline is bound by the
        # host->TPU tunnel link (~110-175 MB/s, fluctuating - measured in
        # scripts/probe_tunnel.py); a deeper in-flight transfer queue
        # rides through link jitter: median warm fps 26.8 -> 47.8 in the
        # interleaved A/B (docs/PERFORMANCE.md "Host pipeline").
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        n = 0
        for _ in range(n_epochs):
            pf = Prefetcher(
                ds, list(range(len(ds))), B,
                num_workers=cfg.runtime.num_workers, prefetch=4,
                device_put=jax.device_put, drop_last=True,
            )
            for batch in pf:
                acc = fwd_scalar(
                    variables, batch["images"], batch["K"], batch["Rt"], acc
                )
                n += int(np.asarray(batch["batch_mask"]).sum())
        float(acc)  # drain: waits for the whole chained interval
        return n / max(time.perf_counter() - t0, 1e-9)

    # compile once on a resident batch so epoch 1 measures IO, not XLA
    float(fwd_scalar(variables, images0, K0, Rt0, jnp.float32(0.0)))
    ds._cache.clear()  # drop the frames decoded during init
    fps_cold = run_epochs(1)  # decodes every PNG on the host
    # warm: 4 epochs per timed interval so per-epoch fixed costs
    # (producer spin-up, final drain RTT ~25 ms) don't eat a 12-frame run
    fps_warm = max(run_epochs(4), run_epochs(4))  # RAM-cached
    return fps_cold, fps_warm


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


def _retry(fn, label, attempts=3, sleep_s=5):
    # the TPU tunnel occasionally drops a compile (HTTP 500); retry
    for attempt in range(attempts):
        try:
            return fn()
        except Exception as e:
            print(f"[bench] {label} attempt {attempt} failed: {e}", file=sys.stderr)
            if _remaining() < 60:
                break
            time.sleep(sleep_s)
    return None


def main():
    _start_watchdog()
    cpu_fallback = False
    if os.environ.get("VSTA_BENCH_SKIP_PROBE") != "1":
        # a healthy-but-cold TPU (loaded rig, first compile > one probe
        # timeout) must not be irreversibly demoted to cpu-fallback on a
        # single shot: keep re-probing while there is still enough budget
        # left for the fallback measurement itself (VERDICT round 3)
        ok = _probe_accelerator()
        while not ok and _remaining() > 600:
            t0 = time.monotonic()
            print(f"[bench] re-probing accelerator "
                  f"({_remaining():.0f}s budget left)", file=sys.stderr)
            ok = _probe_accelerator()
            # a probe that fails FAST (e.g. ambient backend is cpu) must
            # not spin subprocesses for 10 minutes: pace retries to ~60s
            if not ok:
                time.sleep(max(0.0, 60.0 - (time.monotonic() - t0)))
        if not ok:
            cpu_fallback = True
            _enter_cpu_fallback()
            print("[bench] accelerator unreachable; measuring on the CPU "
                  "backend (tiny shapes) so the artifact still carries a "
                  "real number", file=sys.stderr)
    res = _retry(bench_tpu, "inference")
    if res is None:
        _emit({"metric": "wildtrack_e2e_frames_per_sec", "value": 0.0,
               "unit": "frames/s/chip", "vs_baseline": 0.0})
        return
    tpu_fps, mfu_pct = res
    ref_fps = RECORDED_REFERENCE_FPS
    # every per-metric line emitted against ref_fps, so they can all be
    # re-emitted consistently if the live reference run (at the end, to
    # keep the headline first) raises the baseline
    vs_lines = []

    def _emit_vs(line, numerator):
        line = dict(line, vs_baseline=round(numerator / ref_fps, 2))
        vs_lines.append((line, numerator))
        _emit(line)

    # headline FIRST: a later timeout can no longer lose the artifact
    headline = {
        "metric": "wildtrack_e2e_frames_per_sec",
        "value": round(tpu_fps, 3), "unit": "frames/s/chip",
    }
    if cpu_fallback:
        # never let a CPU number masquerade as the TPU rate
        headline["platform"] = "cpu-fallback"
        headline["error"] = "accelerator unreachable (stalled tunnel?)"
    _emit_vs(headline, tpu_fps)

    extras = {}
    if cpu_fallback:
        extras["platform"] = "cpu-fallback"
    if mfu_pct is not None:
        extras["mfu_pct"] = round(mfu_pct, 2)

    fast = bool(os.environ.get("VSTA_BENCH_FAST"))

    if not fast and _remaining() > 60:
        canary = _retry(bench_kernel_canary, "kernel-canary", attempts=1)
        if canary is not None:
            ok, max_err = canary
            extras["kernel_parity_ok"] = bool(ok)
            _emit({"metric": "kernel_parity", "ok": bool(ok),
                   "max_err": float(max_err)})

    if not fast and _remaining() > 240:
        train_fps = _retry(bench_train_tpu, "train-step", attempts=2)
        if train_fps is not None:
            extras["train_fps"] = round(train_fps, 3)
            _emit_vs({
                "metric": "wildtrack_train_frames_per_sec",
                "value": round(train_fps, 3), "unit": "frames/s/chip",
            }, train_fps)

    if not fast and _remaining() > 240:
        deform_fps = _retry(
            lambda: bench_train_tpu("configs/wildtrack_deform.yaml", batch=8),
            "deform-train-step", attempts=2,
        )
        if deform_fps is not None:
            extras["deform_train_fps"] = round(deform_fps, 3)
            _emit_vs({
                "metric": "wildtrack_deform_train_frames_per_sec",
                "value": round(deform_fps, 3), "unit": "frames/s/chip",
            }, deform_fps)

    if not fast and _remaining() > 180:
        int8 = _retry(bench_int8, "int8-inference", attempts=1)
        if int8 is not None:
            int8_fps, impl = int8
            extras["int8_fps"] = round(int8_fps, 3)
            extras["int8_conv_impl"] = impl
            _emit_vs({
                "metric": "wildtrack_int8_frames_per_sec",
                "value": round(int8_fps, 3), "unit": "frames/s/chip",
                "conv_impl": impl,
            }, int8_fps)

    if not fast and _remaining() > 300:
        pipe = _retry(bench_pipeline_tpu, "input-pipeline", attempts=1)
        if pipe is not None:
            fps_cold, fps_warm = pipe
            extras["pipeline_fps_cold"] = round(fps_cold, 3)
            extras["pipeline_fps_warm"] = round(fps_warm, 3)
            # the warm rate is bound by the host->TPU tunnel link, whose
            # bandwidth fluctuates 2-3x minute-to-minute (measured:
            # docs/PERFORMANCE.md "Host input pipeline"); record the link
            # rate this run implies (7x270x480x3 B uint8 = 2.6 MB/frame)
            # so each artifact explains its own pipeline number
            frame_mb = 7 * 270 * 480 * 3 / 2**20
            extras["pipeline_implied_link_mb_per_s"] = round(
                fps_warm * frame_mb, 1)
            _emit_vs({
                "metric": "wildtrack_input_included_frames_per_sec",
                "value": round(fps_warm, 3), "unit": "frames/s/chip",
                "cold_fps": round(fps_cold, 3),
                "implied_link_mb_per_s": round(fps_warm * frame_mb, 1),
            }, fps_warm)

    def _final_headline():
        _emit({
            "metric": "wildtrack_e2e_frames_per_sec",
            "value": round(tpu_fps, 3),
            "unit": "frames/s/chip",
            "vs_baseline": round(tpu_fps / max(1e-9, ref_fps), 2),
            **extras,
        })

    # combined headline (first line + extras) BEFORE the trailing live
    # reference rerun, then mark the artifact complete: if the rerun
    # overruns the budget, the watchdog exits 0 with everything emitted
    _final_headline()
    global _DONE
    _DONE = True

    if _remaining() > 45:
        live = bench_reference_cpu()
        if live and live > ref_fps:
            # baseline moved: re-emit every per-metric line with the
            # corrected vs_baseline so the run is self-consistent (the
            # tail parser keeps the LAST line per metric)
            ref_fps = live
            for line, numerator in vs_lines:
                _emit(dict(line, vs_baseline=round(numerator / ref_fps, 2)))
            _final_headline()


if __name__ == "__main__":
    main()
