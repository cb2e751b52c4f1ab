"""Roofline arithmetic for the warp+proj stage (VERDICT r4, task 7).

The forward table labels warp "gather/DMA-bound by design". This script
turns that label into checkable arithmetic at flagship shapes:

  1. splits the measured warp+proj time into its two sub-programs
     (the per-view projection einsum, and the resident Pallas kernel),
  2. computes the kernel's span statistics from the REAL projected
     coordinates (the same planning math warp_tiles_resident runs),
  3. derives the three candidate bounds:
       - HBM bytes moved (feats in + idx/wts + output out)
       - MXU FLOPs (one [TILE_N, RWIN] @ [RWIN, K_pad] matmul per span)
       - VPU ops for the one-hot build (4 taps x compare/select/add
         over [TILE_N, RWIN] per span)
     against v5e peaks (810 GB/s HBM, 197 TFLOP/s bf16 MXU, ~3.9 TOP/s
     VPU = 8x128 lanes x 4 ALUs x 0.94 GHz),
  4. prints measured vs bound so "at the limit" is checkable.

Usage: python scripts/roofline_warp.py [--batch 16]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.profile_parts import slope_time, chained  # noqa: E402

HBM_GBPS = 810e9
MXU_FLOPS = 197e12
VPU_OPS = 8 * 128 * 4 * 0.94e9  # lanes x ALUs x clock ~= 3.85e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--config", default="configs/wildtrack.yaml")
    ap.add_argument("--variants", action="store_true",
                    help="also time ablated kernel bodies (cost attribution)")
    ap.add_argument("--skip-base", action="store_true",
                    help="skip the base proj/kernel/full measurements")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vsta_tpu.config import load_config
    from vsta_tpu.data.synthetic import make_ring_camera
    from vsta_tpu.geometry import ground_grid
    from vsta_tpu.geometry.bev import bev_sample_coords_with_depth
    from vsta_tpu.models.encoders.encoder import ViewEncoder
    from vsta_tpu.ops import warp_pallas as wp
    from vsta_tpu.ops.warp import precompute_warp_lut

    cfg = load_config(args.config)
    B, V = args.batch, cfg.data.views
    H, W = cfg.data.img_size
    Hb, Wb = cfg.model.bev_size
    compute_dtype = jnp.bfloat16 if cfg.runtime.use_amp else jnp.float32
    itemsize = jnp.dtype(compute_dtype).itemsize

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((B, V, H, W, 3)), jnp.float32)
    Ks, Rts = zip(*(make_ring_camera(v, V, img_hw=(H, W)) for v in range(V)))
    K = jnp.asarray(np.stack(Ks), jnp.float32)
    Rt = jnp.asarray(np.stack(Rts), jnp.float32)

    enc = ViewEncoder(
        backbone=cfg.model.backbone, feat_dim=cfg.model.feat_dim,
        out_index=cfg.model.out_index, dtype=compute_dtype,
    )
    enc_vars = enc.init(jax.random.PRNGKey(0), images, train=False)
    feats = enc.apply(enc_vars, images, train=False)
    _, _, Hf, Wf, C = feats.shape
    C_out = cfg.model.bev_proj_ch
    print(f"feats [{B},{V},{Hf},{Wf},{C}] -> proj {C_out}ch, bev {Hb}x{Wb}")

    grid = ground_grid(Hb, Wb, cfg.model.bev_bounds)
    coords, _ = bev_sample_coords_with_depth(K, Rt, (H, W), (Hf, Wf), grid)
    kern = jnp.asarray(rng.standard_normal((V, C, C_out)), jnp.float32) * 0.02
    bias = jnp.zeros((C_out,), jnp.float32)

    # ---- span statistics from the REAL coords (the kernel's planning math)
    N = Hb * Wb
    idx, wts = precompute_warp_lut(coords.reshape(V, N, 2), (Hf, Wf))
    P = Hf * Wf
    P_res = ((P + 7) // 8) * 8 + wp.RWIN
    K_pad = ((B * C_out + 127) // 128) * 128
    N_pad = ((N + wp.TILE_N - 1) // wp.TILE_N) * wp.TILE_N
    T = N_pad // wp.TILE_N
    idx_np = np.asarray(idx)
    wts_np = np.asarray(wts)
    if N_pad != N:
        idx_np = np.pad(idx_np, ((0, 0), (0, N_pad - N), (0, 0)))
        wts_np = np.pad(wts_np, ((0, 0), (0, N_pad - N), (0, 0)))
    idx_t = idx_np.reshape(V, T, wp.TILE_N, 4).transpose(1, 0, 2, 3)
    wts_t = wts_np.reshape(V, T, wp.TILE_N, 4).transpose(1, 0, 2, 3)
    active = wts_t > 0
    lo = np.where(active, idx_t, P_res)
    hi = np.where(active, idx_t, -1)
    first = lo.min(axis=(2, 3))
    last = hi.max(axis=(2, 3))
    first8 = np.clip((first // 8) * 8, 0, P_res - wp.RWIN)
    cnt = np.where(last >= first, (last - first8) // wp.RWIN + 1, 0)
    spans = int(cnt.sum())
    print(f"tiles T={T}, views V={V}, spans={spans} "
          f"(avg {spans/ (T*V):.2f}/ (tile,view), active {int((cnt>0).sum())}/{T*V})")

    # ---- bound arithmetic
    feats_bytes = V * P_res * K_pad * itemsize          # one HBM->VMEM DMA
    lut_bytes = 2 * V * N_pad * 4 * 4                   # idx int32 + wts f32
    out_bytes = N_pad * K_pad * itemsize
    hbm_ms = (feats_bytes + lut_bytes + out_bytes) / HBM_GBPS * 1e3
    mxu_flop = spans * 2 * wp.TILE_N * wp.RWIN * K_pad
    mxu_ms = mxu_flop / MXU_FLOPS * 1e3
    vpu_ops = spans * 4 * 3 * wp.TILE_N * wp.RWIN       # cmp+sel+add per tap
    vpu_ms = vpu_ops / VPU_OPS * 1e3
    proj_flop = 2 * B * V * P * C * C_out
    proj_ms_bound = proj_flop / MXU_FLOPS * 1e3
    proj_bytes = (B * V * P * C + V * P * B * C_out) * itemsize
    proj_hbm_ms = proj_bytes / HBM_GBPS * 1e3
    print(f"kernel HBM bytes: feats {feats_bytes/1e6:.1f} MB + lut "
          f"{lut_bytes/1e6:.1f} MB + out {out_bytes/1e6:.1f} MB "
          f"-> {hbm_ms:.2f} ms at {HBM_GBPS/1e9:.0f} GB/s")
    print(f"kernel MXU: {spans} spans x 2*{wp.TILE_N}*{wp.RWIN}*{K_pad} "
          f"= {mxu_flop/1e9:.1f} GFLOP -> {mxu_ms:.2f} ms at peak")
    print(f"kernel VPU one-hot build: {vpu_ops/1e9:.1f} Gop "
          f"-> {vpu_ms:.2f} ms at {VPU_OPS/1e12:.2f} Top/s")
    print(f"proj einsum: {proj_flop/1e9:.1f} GFLOP -> {proj_ms_bound:.2f} ms MXU"
          f" / {proj_bytes/1e6:.0f} MB -> {proj_hbm_ms:.2f} ms HBM")

    if jax.default_backend() != "tpu":
        print("not on TPU - skipping measurements")
        return

    prec = None if compute_dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    feats_c = feats.astype(compute_dtype)

    def proj_only(feats, kern, acc):
        p = jnp.einsum("bvhwc,vco->vhwbo", feats + acc.astype(feats.dtype) * 0
                       + (acc * 1e-30).astype(feats.dtype),
                       kern.astype(compute_dtype), precision=prec)
        return jnp.sum(p.astype(jnp.float32))

    proj = jnp.einsum("bvhwc,vco->vhwbo", feats_c,
                      kern.astype(compute_dtype), precision=prec)
    proj_flat = proj.reshape(V, P, B * C_out)
    idx_j = jnp.asarray(idx)
    wts_j = jnp.asarray(wts)

    def kernel_only(pf, idx_j, wts_j, acc):
        out = wp.warp_tiles_resident(
            pf + (acc * 1e-30).astype(pf.dtype), idx_j, wts_j,
            compute_dtype=compute_dtype)
        return jnp.sum(out.astype(jnp.float32))

    def full_warp(feats, coords, kern, bias, acc):
        out = wp.fused_warp_proj_pallas(
            feats + (acc * 1e-30).astype(feats.dtype), coords, kern, bias,
            compute_dtype=compute_dtype)
        return jnp.sum(out.astype(jnp.float32))

    base_stages = [] if args.skip_base else [
        ("proj einsum", proj_only, (feats_c, kern)),
        ("resident kernel", kernel_only, (proj_flat, idx_j, wts_j)),
        ("warp+proj full", full_warp, (feats_c, coords, kern, bias)),
    ]
    for name, fn, fargs in base_stages:
        dt = slope_time(chained(fn), *fargs)
        print(f"measured {name:16s} {dt*1e3:7.2f} ms", flush=True)

    if args.variants:
        for vname in ("full", "no_sbuild", "static_slice", "no_dot"):
            def var_fn(pf, idx_j, wts_j, acc, _v=vname):
                out = _resident_variant(
                    pf + (acc * 1e-30).astype(pf.dtype), idx_j, wts_j,
                    compute_dtype=compute_dtype, variant=_v)
                return jnp.sum(out.astype(jnp.float32))

            dt = slope_time(chained(var_fn), proj_flat, idx_j, wts_j)
            print(f"variant  {vname:16s} {dt*1e3:7.2f} ms", flush=True)


def _resident_variant(feats_vpk, idx, wts, *, compute_dtype, variant):
    """warp_tiles_resident with ablated kernel bodies, for cost attribution.

    no_sbuild: one-hot build replaced by a constant matrix (dot cost only)
    static_slice: span start forced to 0 (tests dynamic-slice copy cost)
    no_dot: dot replaced by summing s into the accumulator (VPU cost only)
    All variants are WRONG numerically - diagnostics only.
    """
    import functools as _ft

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from vsta_tpu.ops import warp_pallas as wp

    def kernel(start_ref, view_ref, win_n_ref, idx_ref, wts_ref, feats_ref,
               out_ref):
        t = pl.program_id(0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (wp.TILE_N, wp.RWIN), 1)

        def body(w, acc):
            v = view_ref[t, w]
            start = pl.multiple_of(start_ref[t, w], 8)
            if variant == "static_slice":
                start = 0
            idx_v = idx_ref[0, v]
            wts_v = wts_ref[0, v]
            if variant == "no_sbuild":
                s = jnp.full((wp.TILE_N, wp.RWIN), 0.25, jnp.float32)
            else:
                s = jnp.zeros((wp.TILE_N, wp.RWIN), jnp.float32)
                for k in range(4):
                    rel = idx_v[:, k][:, None] - start
                    s = s + jnp.where(iota == rel, wts_v[:, k][:, None], 0.0)
            if variant == "no_dot":
                return acc + jnp.sum(s, axis=1, keepdims=True) * jnp.ones(
                    (1, out_ref.shape[-1]), jnp.float32)
            return acc + jnp.dot(
                s.astype(compute_dtype),
                feats_ref[v, pl.ds(start, wp.RWIN), :],
                preferred_element_type=jnp.float32,
                precision=wp._mxu_precision(compute_dtype),
            )

        acc = jax.lax.fori_loop(
            0, win_n_ref[t, 0], body,
            jnp.zeros((wp.TILE_N, out_ref.shape[-1]), jnp.float32))
        out_ref[:, :] = acc.astype(out_ref.dtype)

    V, P, K = feats_vpk.shape
    N = idx.shape[1]
    P_res = ((P + 7) // 8) * 8 + wp.RWIN
    K_pad = ((K + 127) // 128) * 128
    N_pad = ((N + wp.TILE_N - 1) // wp.TILE_N) * wp.TILE_N
    T = N_pad // wp.TILE_N

    feats_vpk = feats_vpk.astype(compute_dtype)
    feats_vpk = jnp.pad(feats_vpk, ((0, 0), (0, P_res - P), (0, K_pad - K)))
    if N_pad != N:
        idx = jnp.pad(idx, ((0, 0), (0, N_pad - N), (0, 0)))
        wts = jnp.pad(wts, ((0, 0), (0, N_pad - N), (0, 0)))
    idx_t = idx.reshape(V, T, wp.TILE_N, 4).transpose(1, 0, 2, 3)
    wts_t = wts.reshape(V, T, wp.TILE_N, 4).transpose(1, 0, 2, 3).astype(
        jnp.float32)
    active = wts_t > 0.0
    lo = jnp.where(active, idx_t, P_res)
    hi = jnp.where(active, idx_t, -1)
    first = jnp.min(lo, axis=(2, 3))
    last = jnp.max(hi, axis=(2, 3))
    first8 = jnp.clip((first // 8) * 8, 0, P_res - wp.RWIN).astype(jnp.int32)
    nspan_max = (P + wp.RWIN - 1) // wp.RWIN + 1
    j = jnp.arange(nspan_max, dtype=jnp.int32)
    cnt = jnp.where(last >= first, (last - first8) // wp.RWIN + 1, 0)
    cand_start = first8[..., None] + j[None, None, :] * wp.RWIN
    cand_ok = j[None, None, :] < cnt[..., None]
    cand_v = jnp.broadcast_to(
        jnp.arange(V, dtype=jnp.int32)[None, :, None], cand_start.shape)
    sortkey = jnp.where(cand_ok, 0, 1).reshape(T, V * nspan_max)
    order = jnp.argsort(sortkey, axis=1, stable=True)
    starts = jnp.take_along_axis(
        jnp.clip(cand_start, 0, P_res - wp.RWIN).reshape(T, V * nspan_max),
        order, axis=1).astype(jnp.int32)
    views = jnp.take_along_axis(
        cand_v.reshape(T, V * nspan_max), order, axis=1).astype(jnp.int32)
    win_n = jnp.sum(
        cand_ok.reshape(T, V * nspan_max), axis=1).astype(jnp.int32)[:, None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, V, wp.TILE_N, 4), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V, wp.TILE_N, 4), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, P_res, K_pad), lambda t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wp.TILE_N, K_pad), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N_pad, K_pad), compute_dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                V * P_res * K_pad * jnp.dtype(compute_dtype).itemsize
                + 16 * 1024 * 1024),
        ),
    )(starts, views, win_n, idx_t, wts_t, feats_vpk)
    return out[:N, :K]


if __name__ == "__main__":
    main()
