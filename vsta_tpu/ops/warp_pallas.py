"""Pallas TPU kernel: fused multi-view homography warp + view-sum via
one-hot scatter matmuls (EXPERIMENTAL alternative backend).

Formulation: after the per-view 1x1 projection (done outside in XLA),
each 128-cell BEV tile builds an on-the-fly one-hot scatter matrix
S[tile, P] = sum_k onehot(idx_k) * w_k (VPU compares against an iota)
and multiplies it with the view's flattened feature map F_v[P, C] on the
MXU, accumulating over views in registers:

    out[tile, :] = sum_v S_v @ F_v            (one matmul per view/tile)

Status: measured on TPU v5e, the dense one-hot formulation spends
O(N*P*C) MXU FLOPs to emulate a sparse map (~1 PFLOP at flagship
shapes) and LOSES to the anchored patch-gather / shared-camera row-pair
design in :mod:`vsta_tpu.ops.warp` (MODEL.WARP_IMPL: "fused", the
default). Mosaic's dynamic-gather support on this generation is limited
to 128-lane take_along_axis, which rules out a gather-based kernel; the
one-hot kernel is kept as a correct, self-contained Pallas reference
backend (MODEL.WARP_IMPL: "pallas") and a starting point for a future
scalar-prefetch windowed variant that bounds P per tile.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .warp import precompute_warp_lut

TILE_N = 128  # BEV cells per grid step


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _warp_kernel(idx_ref, wts_ref, feat_ref, out_ref, *, n_views: int, P: int):
    """Grid: (B, N // TILE_N).

    idx_ref:  [1, V, TILE_N, 4] int32 (flat source index per tap)
    wts_ref:  [1, V, TILE_N, 4] f32  (0 for out-of-image taps)
    feat_ref: [1, V, P, C]           (projected per-view features)
    out_ref:  [1, TILE_N, C]
    """
    pcols = jax.lax.broadcasted_iota(jnp.int32, (TILE_N, P), 1)
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for v in range(n_views):
        s = jnp.zeros((TILE_N, P), jnp.float32)
        for k in range(4):
            idx_k = idx_ref[0, v, :, k][:, None]  # [TILE_N, 1]
            w_k = wts_ref[0, v, :, k][:, None]
            s = s + jnp.where(pcols == idx_k, w_k, 0.0)
        acc = acc + jnp.dot(
            s, feat_ref[0, v].astype(jnp.float32), preferred_element_type=jnp.float32
        )
    out_ref[0] = acc.astype(out_ref.dtype)


def warp_views_sum_pallas(
    feats_flat: jax.Array, idx: jax.Array, wts: jax.Array
) -> jax.Array:
    """sum_v bilinear-warp(feats[v]) for all BEV cells, fused.

    feats_flat: [B, V, P, C] (P = Hf*Wf, padded ok)
    idx:        [B, V, N, 4] int32 flat taps (N = Hb*Wb, padded ok)
    wts:        [B, V, N, 4] float32
    Returns [B, N, C] float32.
    """
    B, V, P, C = feats_flat.shape
    N = idx.shape[2]
    P_pad = _round_up(P, 128)
    C_pad = _round_up(C, 128)
    N_pad = _round_up(N, TILE_N)
    if P_pad != P or C_pad != C:
        feats_flat = jnp.pad(feats_flat, ((0, 0), (0, 0), (0, P_pad - P), (0, C_pad - C)))
    if N_pad != N:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, N_pad - N), (0, 0)))
        wts = jnp.pad(wts, ((0, 0), (0, 0), (0, N_pad - N), (0, 0)))

    grid = (B, N_pad // TILE_N)
    out = pl.pallas_call(
        functools.partial(_warp_kernel, n_views=V, P=P_pad),
        out_shape=jax.ShapeDtypeStruct((B, N_pad, C_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, V, TILE_N, 4), lambda b, n: (b, 0, n, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, V, TILE_N, 4), lambda b, n: (b, 0, n, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, V, P_pad, C_pad), lambda b, n: (b, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_N, C_pad), lambda b, n: (b, n, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1.2 * (V * P_pad * C_pad * 4 + 3 * TILE_N * P_pad * 4))
            + 2 * TILE_N * C_pad * 4,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * V * N_pad * P_pad * C_pad,
            bytes_accessed=B * V * P_pad * C_pad * 4 + B * N_pad * C_pad * 4,
            transcendentals=0,
        ),
    )(idx, wts, feats_flat)
    return out[:, :N, :C]


def fused_warp_proj_pallas(
    feats: jax.Array,
    coords: jax.Array,
    proj_kernel: jax.Array,
    proj_bias: Optional[jax.Array] = None,
    *,
    compute_dtype: jnp.dtype = jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in twin of :func:`vsta_tpu.ops.warp.fused_warp_proj` backed by
    the Pallas kernel. Same contract: feats [B,V,Hf,Wf,C],
    coords [B,V,Hb,Wb,2], proj_kernel [V,C,C_out] -> [B,Hb,Wb,C_out]."""
    B, V, Hf, Wf, C = feats.shape
    Hb, Wb = coords.shape[2], coords.shape[3]
    prec = None if compute_dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    proj = jnp.einsum(
        "bvhwc,vco->bvhwo",
        feats.astype(compute_dtype),
        proj_kernel.astype(compute_dtype),
        precision=prec,
    )
    C_out = proj.shape[-1]
    idx, wts = precompute_warp_lut(coords, (Hf, Wf))
    feats_flat = proj.reshape(B, V, Hf * Wf, C_out)
    idx_flat = idx.reshape(B, V, Hb * Wb, 4)
    wts_flat = wts.reshape(B, V, Hb * Wb, 4)

    if interpret:
        with pltpu.force_tpu_interpret_mode():
            out = warp_views_sum_pallas(feats_flat, idx_flat, wts_flat)
    else:
        out = warp_views_sum_pallas(feats_flat, idx_flat, wts_flat)
    out = out.reshape(B, Hb, Wb, C_out)
    if proj_bias is not None:
        out = out + proj_bias.astype(out.dtype)
    return out.astype(compute_dtype)
