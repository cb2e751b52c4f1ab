"""Microbenchmark: XLA grouped-conv depthwise lowering vs shift-based formulation.

Round-3/4 profiling showed EfficientNet-B0's training step is dominated by
the depthwise-conv backward (backward-input lowers as a dilated transposed
dw-conv, backward-filter as a grouped correlation; both lower poorly on the
MXU and are additionally HBM-bound - docs/PERFORMANCE.md "Training step").

A k x k depthwise conv is algebraically a sum of k^2 shifted elementwise
multiplies: out = sum_{dy,dx} shift(x, dy, dx) * w[dy, dx, :]. On TPU this
is pure VPU work; its VJP is the same shape of computation (shifts of the
cotangent for dx, shifted-multiply-reduce for dw), so the backward cannot
hit the dilated-transposed-conv path. This script measures both lowerings
fwd and fwd+bwd at B0's actual layer shapes (batch 8 flagship: B*V=56
images of 270x480), with the repo's chained-N slope timing (each iteration
data-dependent on the last so the tunnel's async ack can't hide compute).

Usage: python scripts/bench_dwconv.py [--batch 8]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp

N_LO, N_HI, N_REPEAT = 2, 10, 3

# (repeats, H, W, C, k, stride) for every depthwise conv B0 runs at
# 270x480 input. With out_index=2 (stride 8) only stages 0-2 feed the
# loss, but train-mode BN stats keep the later stages' forward alive;
# measure all for honesty, and stages 0-2 separately (the backward set).
B0_DW_LAYERS = [
    (1, 135, 240, 32, 3, 1),    # stage0
    (1, 135, 240, 96, 3, 2),    # stage1 block0
    (1, 68, 120, 144, 3, 1),    # stage1 block1
    (1, 68, 120, 144, 5, 2),    # stage2 block0
    (1, 34, 60, 240, 5, 1),     # stage2 block1
    (1, 34, 60, 240, 3, 2),     # stage3 block0
    (2, 17, 30, 480, 3, 1),     # stage3 blocks 1-2
    (1, 17, 30, 480, 5, 1),     # stage4 block0
    (2, 17, 30, 672, 5, 1),     # stage4 blocks 1-2
    (1, 17, 30, 672, 5, 2),     # stage5 block0
    (3, 9, 15, 1152, 5, 1),     # stage5 blocks 1-3
    (1, 9, 15, 1152, 3, 1),     # stage6
]
N_STRIDE8 = 5  # first 5 rows are the stride<=8 (loss-feeding) set


def dw_conv_xla(x, w, stride, precision=None):
    """Reference lowering: lax grouped conv (what flax nn.Conv emits)."""
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
        precision=precision,
    )


def dw_conv_shift(x, w, stride):
    """Shift-based: sum of k^2 shifted elementwise multiplies (VPU only).

    Matches lax SAME-padding semantics exactly, including the asymmetric
    low/high split strided convs get (pad_total = (out-1)*s + k - dim).
    """
    k = w.shape[0]
    N, H, W, C = x.shape
    oh = -(-H // stride)
    ow = -(-W // stride)
    ph = max((oh - 1) * stride + k - H, 0)
    pw = max((ow - 1) * stride + k - W, 0)
    xp = jnp.pad(
        x, ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0))
    )
    out = None
    for dy in range(k):
        for dx in range(k):
            tap = jax.lax.slice(
                xp,
                (0, dy, dx, 0),
                (N, dy + (oh - 1) * stride + 1, dx + (ow - 1) * stride + 1, C),
                (1, stride, stride, 1),
            )
            term = tap * w[dy, dx, 0, :]
            out = term if out is None else out + term
    return out


def slope_time(run_n, *args):
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--views", type=int, default=7)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--all-stages", action="store_true",
                    help="include stride-16/32 layers (default: loss set)")
    args = ap.parse_args()

    N = args.batch * args.views
    dtype = jnp.dtype(args.dtype)
    key = jax.random.PRNGKey(0)
    layers = B0_DW_LAYERS if args.all_stages else B0_DW_LAYERS[:N_STRIDE8]

    xs, ws, meta = [], [], []
    for reps, H, W, C, k, stride in layers:
        key, k1, k2 = jax.random.split(key, 3)
        xs.append(jax.random.normal(k1, (N, H, W, C), dtype))
        ws.append(jax.random.normal(k2, (k, k, 1, C), dtype) * 0.1)
        meta.append((stride, reps))

    def total_loss(impl, xs_, ws_):
        total = jnp.zeros((), jnp.float32)
        for x, w, (stride, reps) in zip(xs_, ws_, meta):
            y = impl(x, w, stride)
            total = total + reps * jnp.mean(y.astype(jnp.float32) ** 2)
        return total

    results = {}
    for name, impl in [("xla_grouped", dw_conv_xla), ("shift", dw_conv_shift)]:
        loss = functools.partial(total_loss, impl)

        @functools.partial(jax.jit, static_argnums=(0,))
        def run_fwd(n, xs_, ws_, _loss=loss):
            def body(i, acc):
                xs_i = [x + (acc * 1e-20).astype(x.dtype) for x in xs_]
                return _loss(xs_i, ws_)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        @functools.partial(jax.jit, static_argnums=(0,))
        def run_gw(n, xs_, ws_, _loss=loss):
            g = jax.grad(lambda ws__, xs__: _loss(xs__, ws__))

            def body(i, acc):
                ws_i = [w + (acc * 1e-20).astype(w.dtype) for w in ws_]
                gs = g(ws_i, xs_)
                return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(gs))

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        @functools.partial(jax.jit, static_argnums=(0,))
        def run_gxw(n, xs_, ws_, _loss=loss):
            g = jax.grad(lambda xw: _loss(xw[0], xw[1]))

            def body(i, acc):
                xs_i = [x + (acc * 1e-20).astype(x.dtype) for x in xs_]
                gs = g((xs_i, ws_))
                return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(gs))

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        t_fwd = slope_time(run_fwd, xs, ws) * 1e3
        t_gw = slope_time(run_gw, xs, ws) * 1e3
        t_gxw = slope_time(run_gxw, xs, ws) * 1e3
        results[name] = (t_fwd, t_gw, t_gxw)
        print(
            f"{name:12s}  fwd {t_fwd:7.2f} ms   grad(w) {t_gw:7.2f} ms   "
            f"grad(x,w) {t_gxw:7.2f} ms"
        )

    # parity check (f32 + HIGHEST precision: TPU convs default to bf16
    # passes, which would show ~1e-3 artifacts that are not mismatches)
    for i, (x, w, (stride, _)) in enumerate(zip(xs, ws, meta)):
        a = dw_conv_xla(x.astype(jnp.float32), w.astype(jnp.float32), stride,
                        precision=jax.lax.Precision.HIGHEST)
        b = dw_conv_shift(x.astype(jnp.float32), w.astype(jnp.float32), stride)
        err = float(jnp.max(jnp.abs(a - b)))
        print(f"layer{i} (k={w.shape[0]}, s={stride}) parity max_err: {err:.2e}")


if __name__ == "__main__":
    main()
