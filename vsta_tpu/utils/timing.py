"""Chained-N slope timing: the one honest protocol on this rig.

The TPU tunnel's ``block_until_ready`` acks at dispatch, not completion,
so naive loop timing overstates throughput by orders of magnitude. The
protocol used by every benchmark in this repo (bench.py and the
scripts/) lives here once: chain N data-dependent evaluations of a
scalar-returning step inside ONE jit program (dynamic ``fori_loop`` trip
count - a single compile serves every N), end with a real device->host
scalar fetch, and report the two-point slope between a short and a long
chain, which cancels the fixed tunnel/dispatch latency.
"""

from __future__ import annotations

import time
from typing import Callable

N_LO, N_HI, N_REPEAT = 2, 12, 3


def chained_slope_time(
    step_scalar: Callable,
    *args,
    n_lo: int = N_LO,
    n_hi: int = N_HI,
    repeat: int = N_REPEAT,
):
    """Seconds per evaluation of ``step_scalar(*args) -> f32 scalar``.

    ``step_scalar``'s first argument must be the tensor the serial
    dependency folds into (``arg0 + acc * 1e-30`` - numerically
    negligible but forces step i+1 to wait for step i).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run_n(n, *a):
        def body(i, acc):
            return step_scalar(a[0] + acc * 1e-30, *a[1:])

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed(n):
        best = float("inf")
        for _ in range(repeat):
            t0 = time.perf_counter()
            float(run_n(jnp.int32(n), *args))  # scalar fetch = real sync
            best = min(best, time.perf_counter() - t0)
        return best

    float(run_n(jnp.int32(1), *args))  # compile once
    return (timed(n_hi) - timed(n_lo)) / (n_hi - n_lo)


def forward_decode_fps(
    cfg, model, variables, images, K, Rt, quant_head=None, quant_encoder=None,
    n_lo: int = N_LO, n_hi: int = N_HI, repeat: int = N_REPEAT,
):
    """frames/sec of the full forward+decode program (the bench headline
    shape) for a constructed model + inputs."""
    import jax.numpy as jnp

    from ..ops.decode import decode_detections

    def step_scalar(images, K, Rt):
        out = model.apply(
            variables, images, K, Rt, train=False,
            quant_head=quant_head, quant_encoder=quant_encoder,
        )
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

    dt = chained_slope_time(
        step_scalar, images, K, Rt, n_lo=n_lo, n_hi=n_hi, repeat=repeat
    )
    return images.shape[0] / max(dt, 1e-9)
