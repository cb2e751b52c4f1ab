"""Pallas TPU kernels for the fused multi-view homography warp.

The hot op of the whole pipeline (reference analog: the per-(b, v)
Python loop over kornia/grid_sample, project/models/fusion/geometry.py:
120-162, plus the ConcatFusion 1x1 conv, model_wrapper.py:69-73).

Two kernels:

1. :func:`warp_tiles_windowed` (the production path, shared cameras) -
   a windowed one-hot scatter-matmul. For each 128-cell BEV tile the
   bilinear taps of a view cluster inside a narrow band of the flat
   source map (BEV rows map to image lines under a homography). The
   kernel walks only the active 512-row windows (per-tile/view bounds
   are scalar-prefetched), DMAs each window HBM->VMEM, builds the
   one-hot weight matrix S[tile, WIN] on the VPU with iota compares,
   and accumulates S @ window on the MXU across views and windows:

       out[tile] = sum_v sum_w S_{v,w} @ F_v[w*WIN : (w+1)*WIN]

   FLOPs scale with the ACTIVE window count (~1-2 per tile/view), not
   with the full source map - unlike the dense one-hot formulation.
   The batch rides the channel axis (K = B*C), so the window DMA and
   the matmul amortize over the whole batch.

2. :func:`warp_views_sum_pallas` (legacy/experimental) - the dense
   one-hot variant that multiplies against the ENTIRE flattened source
   map per tile. Correct but O(N*P*K) FLOPs; kept as a self-contained
   reference backend and for the per-batch-coords case.

Mosaic note: dynamic gather on this TPU generation only supports
128-lane take_along_axis, so a gather-based kernel is not expressible;
the scatter-matmul rides the MXU instead.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .warp import precompute_warp_lut

TILE_N = 128  # BEV cells per grid step
WIN = 512    # source rows per DMA window


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mxu_precision(compute_dtype):
    """f32 kernels must ask for HIGHEST: the MXU's default f32 matmul is
    a fast bf16-pass emulation (~1e-2 abs error on O(1) data - measured
    on-device; interpret mode is exact). bf16 inputs are single-pass
    either way."""
    return (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(compute_dtype) == jnp.float32
        else None
    )


# ---------------------------------------------------------------------------
# resident kernel (shared cameras, feature block fits VMEM)
# ---------------------------------------------------------------------------

RWIN = int(os.environ.get("VSTA_RWIN", "384"))
# source rows per matmul span (resident kernel). TPU sweep at flagship
# shapes (serialized kernel): 384 -> 7.42 ms vs 256 -> 7.75, 512 -> 7.58.
# The round-5 software-pipelined s-build (see _resident_kernel) measured
# 7.01 ms at 384; unrolled by 2, 6.76 ms. VSTA_RWIN exists for sweeps.
assert RWIN % 8 == 0, "VSTA_RWIN must be a multiple of 8"
# feats must fit VMEM alongside ~2 MB of working set; v5e/v5p have 128 MB
RESIDENT_BUDGET_BYTES = 80 * 1024 * 1024


def _resident_kernel(
    start_ref,   # [T, MAXW] int32 (scalar-prefetched): span start row, 8-aligned
    view_ref,    # [T, MAXW] int32: view of each work item
    win_n_ref,   # [T, 1] int32: active work items for this tile
    idx_ref,     # [1, V, TILE_N, 4] int32 (flat source row per tap)
    wts_ref,     # [1, V, TILE_N, 4] f32 (0 for out-of-image taps)
    feats_ref,   # [V, P_res, K] compute dtype, VMEM-RESIDENT across all tiles
    out_ref,     # [TILE_N, K] f32
    *,
    compute_dtype,
):
    t = pl.program_id(0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_N, RWIN), 1)
    maxw = start_ref.shape[1]
    n = win_n_ref[t, 0]

    def make_s(w):
        """One-hot scatter matrix for work item w (VPU work).

        Dead items (w >= n: the unroll tail and prefetch past the active
        count) are clamped in-bounds and their weights zeroed, so their
        dot contributes exactly 0 (host planning keeps inactive
        view/start slots in range)."""
        wc = jnp.minimum(w, maxw - 1)
        v = view_ref[t, wc]
        start = start_ref[t, wc]
        live = jnp.where(w < n, 1.0, 0.0)
        idx_v = idx_ref[0, v]  # [TILE_N, 4] (dynamic view index)
        wts_v = wts_ref[0, v]
        # (building S directly in bf16 trips a Mosaic relayout bug on
        # 16-bit selects; build f32 and cast at the dot instead)
        s = jnp.zeros((TILE_N, RWIN), jnp.float32)
        for k in range(4):
            rel = idx_v[:, k][:, None] - start
            s = s + jnp.where(iota == rel, (wts_v[:, k] * live)[:, None], 0.0)
        return s, start, v

    def dot(acc, s, start, v):
        # starts are built 8-aligned on the host side; the hint lets
        # Mosaic prove the sublane alignment of the dynamic slice
        return acc + jnp.dot(
            s.astype(compute_dtype),
            feats_ref[v, pl.ds(pl.multiple_of(start, 8), RWIN), :],
            preferred_element_type=jnp.float32,
            precision=_mxu_precision(compute_dtype),
        )

    # Software-pipelined span loop, unrolled by 2: iteration i dots the
    # two s-matrices built LAST iteration while the VPU builds the next
    # pair - no data dependency inside an iteration, so Mosaic can
    # overlap MXU and VPU issue - and the halved trip count amortizes
    # the loop bookkeeping that the pipelined-by-1 form left on the
    # table. Measured at flagship shapes (scripts/roofline_warp.py):
    # serialized 7.7 ms, pipelined-by-1 7.0 ms, vs the 3.8 ms MXU bound
    # (ablation: dot 4.9 ms + s-build/loop 2.8 ms, --variants).
    npairs = (n + 1) // 2

    def body(i, carry):
        acc, sA, stA, vA, sB, stB, vB = carry
        ip = jnp.minimum(i + 1, jnp.maximum(npairs - 1, 0))
        sA_n, stA_n, vA_n = make_s(2 * ip)
        sB_n, stB_n, vB_n = make_s(2 * ip + 1)
        acc = dot(acc, sA, stA, vA)
        acc = dot(acc, sB, stB, vB)
        return acc, sA_n, stA_n, vA_n, sB_n, stB_n, vB_n

    sA0, stA0, vA0 = make_s(0)
    sB0, stB0, vB0 = make_s(1)
    acc, *_ = jax.lax.fori_loop(
        0,
        npairs,
        body,
        (jnp.zeros((TILE_N, out_ref.shape[-1]), jnp.float32),
         sA0, stA0, vA0, sB0, stB0, vB0),
    )
    # accumulate f32, store in compute dtype: halves the output traffic
    # (and the downstream [N, B, C] -> [B, N, C] transpose) under AMP
    out_ref[:, :] = acc.astype(out_ref.dtype)


def warp_tiles_resident(
    feats_vpk: jax.Array,
    idx: jax.Array,
    wts: jax.Array,
    *,
    compute_dtype: jnp.dtype = jnp.bfloat16,
) -> jax.Array:
    """sum_v bilinear-warp(feats[v]): VMEM-resident variant.

    Same SHAPE contract as :func:`warp_tiles_windowed` (feats [V, P, K],
    idx/wts [V, N, 4] -> [N, K], f32-accumulated) but a different output
    dtype: this kernel stores ``compute_dtype`` (bf16 under AMP) while
    the windowed kernel returns float32 - callers casting afterwards
    must not assume the two are interchangeable (ADVICE round 2). The
    whole feature block is pinned in
    VMEM for the kernel's lifetime, so the per-(tile, view) work items
    read their span directly instead of re-DMAing 512-row windows from
    HBM per tile. At flagship shapes (V=7, P=2040, K=B*128) that removes
    ~6.6 GB of repeated window DMA per call - the round-1 kernel's
    bottleneck - leaving one [TILE, RWIN] @ [RWIN, K] MXU matmul per
    active span. Spans start at the tile/view's first active tap (rounded
    down to the 8-row sublane), so a span count of 1 covers most items.

    Caller must ensure V * P_res * K_pad * itemsize fits the VMEM budget
    (see RESIDENT_BUDGET_BYTES); :func:`fused_warp_proj_pallas` dispatches
    to the windowed kernel otherwise.
    """
    V, P, K = feats_vpk.shape
    N = idx.shape[1]
    # headroom so a span starting near P never reads past the buffer
    P_res = _round_up(P, 8) + RWIN
    K_pad = _round_up(K, 128)
    N_pad = _round_up(N, TILE_N)
    T = N_pad // TILE_N

    feats_vpk = feats_vpk.astype(compute_dtype)
    feats_vpk = jnp.pad(feats_vpk, ((0, 0), (0, P_res - P), (0, K_pad - K)))
    if N_pad != N:
        idx = jnp.pad(idx, ((0, 0), (0, N_pad - N), (0, 0)))
        wts = jnp.pad(wts, ((0, 0), (0, N_pad - N), (0, 0)))

    idx_t = idx.reshape(V, T, TILE_N, 4).transpose(1, 0, 2, 3)
    wts_t = wts.reshape(V, T, TILE_N, 4).transpose(1, 0, 2, 3).astype(jnp.float32)
    active = wts_t > 0.0
    lo = jnp.where(active, idx_t, P_res)
    hi = jnp.where(active, idx_t, -1)
    first = jnp.min(lo, axis=(2, 3))                     # [T, V]
    last = jnp.max(hi, axis=(2, 3))
    first8 = jnp.clip((first // 8) * 8, 0, P_res - RWIN).astype(jnp.int32)
    # spans per (tile, view): consecutive RWIN blocks from first8; each
    # tap belongs to exactly one span (coverage is disjoint), so no
    # double counting
    nspan_max = (P + RWIN - 1) // RWIN + 1
    j = jnp.arange(nspan_max, dtype=jnp.int32)
    cnt = jnp.where(
        last >= first,
        (last - first8) // RWIN + 1,
        0,
    )                                                     # [T, V]
    cand_start = first8[..., None] + j[None, None, :] * RWIN   # [T, V, S]
    cand_ok = j[None, None, :] < cnt[..., None]
    cand_v = jnp.broadcast_to(
        jnp.arange(V, dtype=jnp.int32)[None, :, None], cand_start.shape
    )
    # sort active items first (inactive -> sentinel at the end)
    sortkey = jnp.where(cand_ok, 0, 1).reshape(T, V * nspan_max)
    order = jnp.argsort(sortkey, axis=1, stable=True)
    starts = jnp.take_along_axis(
        jnp.clip(cand_start, 0, P_res - RWIN).reshape(T, V * nspan_max),
        order, axis=1,
    ).astype(jnp.int32)
    views = jnp.take_along_axis(
        cand_v.reshape(T, V * nspan_max), order, axis=1
    ).astype(jnp.int32)
    win_n = jnp.sum(cand_ok.reshape(T, V * nspan_max), axis=1).astype(jnp.int32)[:, None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (1, V, TILE_N, 4), lambda t, *_: (t, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, V, TILE_N, 4), lambda t, *_: (t, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (V, P_res, K_pad), lambda t, *_: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (TILE_N, K_pad), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        functools.partial(_resident_kernel, compute_dtype=compute_dtype),
        out_shape=jax.ShapeDtypeStruct((N_pad, K_pad), compute_dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                V * P_res * K_pad * jnp.dtype(compute_dtype).itemsize
                + 16 * 1024 * 1024
            ),
        ),
    )(starts, views, win_n, idx_t, wts_t, feats_vpk)
    return out[:N, :K]


# ---------------------------------------------------------------------------
# windowed kernel (shared cameras)
# ---------------------------------------------------------------------------


def _windowed_kernel(
    win_vc_ref,  # [T, MAXW] int32 (scalar-prefetched): packed v*pack + c
    win_n_ref,   # [T, 1] int32: number of active work items for this tile
    idx_ref,    # [1, V, TILE_N, 4] int32 (flat source row per tap)
    wts_ref,    # [1, V, TILE_N, 4] f32 (0 for out-of-image taps)
    feats_ref,  # [V, P_pad, K] compute dtype, stays in HBM (ANY)
    out_ref,    # [TILE_N, K] f32
    buf_ref,    # scratch VMEM [2, WIN, K] compute dtype (double buffer)
    sems,       # DMA semaphores [2]
    *,
    n_views: int,
    pack: int,
    compute_dtype,
):
    t = pl.program_id(0)
    K = out_ref.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_N, WIN), 1)
    n_work = win_n_ref[t, 0]
    maxw = win_vc_ref.shape[1]

    def dma(w, slot):
        vc = win_vc_ref[t, w]
        v = vc // pack
        c = vc % pack
        return pltpu.make_async_copy(
            feats_ref.at[v, pl.ds(c * WIN, WIN), :], buf_ref.at[slot], sems.at[slot]
        )

    def make_s(w):
        """One-hot scatter matrix for work item w (VPU work, no DMA dep).

        Clamps the view index: the pipelined loop prefetches item w+1,
        which past the active count is the int32 sentinel (1 << 30) -
        its s-matrix is discarded but the idx/wts reads must stay in
        bounds.
        """
        vc = win_vc_ref[t, w]
        v = jnp.minimum(vc // pack, n_views - 1)
        base = (vc % pack) * WIN
        idx_v = idx_ref[0, v]  # [TILE_N, 4] (dynamic view index)
        wts_v = wts_ref[0, v]
        s = jnp.zeros((TILE_N, WIN), jnp.float32)
        for k in range(4):
            rel = idx_v[:, k][:, None] - base
            s = s + jnp.where(iota == rel, wts_v[:, k][:, None], 0.0)
        return s

    @pl.when(n_work > 0)
    def _():
        dma(0, 0).start()

    # Software-pipelined like _resident_kernel: build item w+1's s-matrix
    # (VPU) before waiting on item w's DMA and issuing its dot (MXU), so
    # Mosaic can overlap the two engines.
    def body(w, carry):
        acc, s = carry
        slot = w % 2

        @pl.when(w + 1 < n_work)
        def _():
            dma(w + 1, (w + 1) % 2).start()

        s_n = make_s(jnp.minimum(w + 1, maxw - 1))
        dma(w, slot).wait()
        acc = acc + jnp.dot(
            s.astype(compute_dtype),
            buf_ref[slot],
            preferred_element_type=jnp.float32,
            precision=_mxu_precision(compute_dtype),
        )
        return acc, s_n

    acc, _ = jax.lax.fori_loop(
        0, n_work, body, (jnp.zeros((TILE_N, K), jnp.float32), make_s(0))
    )
    out_ref[:, :] = acc


def warp_tiles_windowed(
    feats_vpk: jax.Array,
    idx: jax.Array,
    wts: jax.Array,
    *,
    compute_dtype: jnp.dtype = jnp.bfloat16,
) -> jax.Array:
    """sum_v bilinear-warp(feats[v]) for all BEV cells, batch in channels.

    feats_vpk: [V, P, K] bf16/f32 (P = Hf*Wf; K = B*C or C)
    idx:       [V, N, 4] int32 flat taps; wts [V, N, 4] f32 (0 = masked).
    compute_dtype: matmul input dtype; bf16 under AMP, f32 otherwise
    (accumulation is always f32).
    Returns [N, K] float32 (unlike :func:`warp_tiles_resident`, which
    returns ``compute_dtype`` - see its docstring).
    """
    V, P, K = feats_vpk.shape
    N = idx.shape[1]
    P_pad = _round_up(P, WIN)
    K_pad = _round_up(K, 128)
    N_pad = _round_up(N, TILE_N)
    T = N_pad // TILE_N

    feats_vpk = feats_vpk.astype(compute_dtype)
    if P_pad != P or K_pad != K:
        feats_vpk = jnp.pad(feats_vpk, ((0, 0), (0, P_pad - P), (0, K_pad - K)))
    if N_pad != N:
        idx = jnp.pad(idx, ((0, 0), (0, N_pad - N), (0, 0)))
        wts = jnp.pad(wts, ((0, 0), (0, N_pad - N), (0, 0)))

    # [T, V, TILE, 4] tiling + per-(tile, view) active window bounds
    idx_t = idx.reshape(V, T, TILE_N, 4).transpose(1, 0, 2, 3)
    wts_t = wts.reshape(V, T, TILE_N, 4).transpose(1, 0, 2, 3).astype(jnp.float32)
    active = wts_t > 0.0
    lo = jnp.where(active, idx_t, P_pad)
    hi = jnp.where(active, idx_t, -1)
    first = jnp.min(lo, axis=(2, 3)) // WIN            # [T, V]
    last = jnp.max(hi, axis=(2, 3)) // WIN             # [T, V]; -1 // WIN = -1 -> empty
    first = jnp.clip(first, 0, P_pad // WIN - 1).astype(jnp.int32)
    last = jnp.clip(last, -1, P_pad // WIN - 1).astype(jnp.int32)

    # flatten the active (view, window) pairs of each tile into a packed
    # worklist so the kernel can double-buffer DMA across views
    nc = P_pad // WIN
    # (view, window) pack base: the next power of two above the window
    # count, so the encoding never collides for any source-map size
    # (the fixed 1024 of round 1 silently corrupted at P_pad/WIN >= 1024)
    pack = max(1024, 1 << nc.bit_length())
    if V * pack >= (1 << 30):
        raise ValueError(
            f"warp worklist packing overflow: V={V}, windows={nc} "
            f"(pack={pack}) exceeds the int32 sentinel"
        )
    j = jnp.arange(nc, dtype=jnp.int32)
    cnt = jnp.maximum(0, last - first + 1)                       # [T, V]
    cand_c = first[..., None] + j[None, None, :]                  # [T, V, nc]
    cand_ok = j[None, None, :] < cnt[..., None]
    cand_v = jnp.broadcast_to(
        jnp.arange(V, dtype=jnp.int32)[None, :, None], cand_c.shape
    )
    vc = jnp.where(cand_ok, cand_v * pack + cand_c, jnp.int32(1 << 30))
    vc_flat = vc.reshape(T, V * nc)
    vc_sorted = jnp.sort(vc_flat, axis=1)                         # active first
    win_n = jnp.sum(cand_ok.reshape(T, V * nc), axis=1).astype(jnp.int32)[:, None]
    win_vc = vc_sorted.astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (1, V, TILE_N, 4), lambda t, *_: (t, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, V, TILE_N, 4), lambda t, *_: (t, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # feats stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (TILE_N, K_pad), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, WIN, K_pad), compute_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _windowed_kernel, n_views=V, pack=pack, compute_dtype=compute_dtype
        ),
        out_shape=jax.ShapeDtypeStruct((N_pad, K_pad), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            # live set: 2x DMA buf (WIN*K bf16) + acc/out (TILE*K f32 each)
            # + S and iota (TILE*WIN f32) + loop-carry copies; give the
            # scheduler generous headroom.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(win_vc, win_n, idx_t, wts_t, feats_vpk)
    return out[:N, :K]


def fused_warp_proj_pallas(
    feats: jax.Array,
    coords: jax.Array,
    proj_kernel: jax.Array,
    proj_bias: Optional[jax.Array] = None,
    *,
    compute_dtype: jnp.dtype = jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    """Pallas-backed twin of :func:`vsta_tpu.ops.warp.fused_warp_proj`.

    feats [B,V,Hf,Wf,C]; coords [V,Hb,Wb,2] (shared cameras - the
    windowed kernel) or [B,V,Hb,Wb,2] (dense legacy kernel);
    proj_kernel [V,C,C_out] -> [B,Hb,Wb,C_out].

    Differentiable: the op's math is identical to the XLA
    :func:`fused_warp_proj`, so the backward pass is that function's
    autodiff VJP (custom_vjp) - the Pallas kernel only accelerates the
    forward.
    """
    if proj_bias is None:
        B = feats.shape[0]
        proj_bias = jnp.zeros((proj_kernel.shape[-1],), feats.dtype)
    return _fwp_pallas(feats, coords, proj_kernel, proj_bias, compute_dtype, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fwp_pallas(feats, coords, proj_kernel, proj_bias, compute_dtype, interpret):
    return _fwp_pallas_impl(
        feats, coords, proj_kernel, proj_bias, compute_dtype, interpret
    )


def _fwp_pallas_fwd(feats, coords, proj_kernel, proj_bias, compute_dtype, interpret):
    out = _fwp_pallas_impl(
        feats, coords, proj_kernel, proj_bias, compute_dtype, interpret
    )
    return out, (feats, coords, proj_kernel, proj_bias)


def _fwp_pallas_bwd(compute_dtype, interpret, res, g):
    from .warp import fused_warp_proj

    feats, coords, proj_kernel, proj_bias = res
    _, vjp = jax.vjp(
        lambda f, c, k, b: fused_warp_proj(f, c, k, b, compute_dtype=compute_dtype),
        feats,
        coords,
        proj_kernel,
        proj_bias,
    )
    return vjp(g)


_fwp_pallas.defvjp(_fwp_pallas_fwd, _fwp_pallas_bwd)


def _fwp_pallas_impl(
    feats: jax.Array,
    coords: jax.Array,
    proj_kernel: jax.Array,
    proj_bias: Optional[jax.Array],
    compute_dtype: jnp.dtype,
    interpret: bool,
) -> jax.Array:
    B, V, Hf, Wf, C = feats.shape
    C_out = proj_kernel.shape[-1]
    prec = None if compute_dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    if coords.ndim == 4:
        # Shared cameras: project first (the kernel sums over views, so
        # the per-view projection must happen before the warp), then run
        # the windowed kernel with the batch folded into channels.
        Hb, Wb = coords.shape[1], coords.shape[2]
        N = Hb * Wb
        idx, wts = precompute_warp_lut(coords.reshape(V, N, 2), (Hf, Wf))
        proj = jnp.einsum(
            "bvhwc,vco->vhwbo",
            feats.astype(compute_dtype),
            proj_kernel.astype(compute_dtype),
            precision=prec,
        )
        # resident kernel when the projected feature block fits VMEM
        # (flagship: 7 x 2304 x 2048 bf16 = 63 MB); windowed-DMA fallback
        # for larger batch x channel products
        P_res = _round_up(Hf * Wf, 8) + RWIN
        K_pad = _round_up(B * C_out, 128)
        itemsize = jnp.dtype(compute_dtype).itemsize
        resident = V * P_res * K_pad * itemsize <= RESIDENT_BUDGET_BYTES
        kern = warp_tiles_resident if resident else warp_tiles_windowed
        if interpret:
            with pltpu.force_tpu_interpret_mode():
                warped = kern(
                    proj.reshape(V, Hf * Wf, B * C_out),
                    idx,
                    wts,
                    compute_dtype=compute_dtype,
                )
        else:
            warped = kern(
                proj.reshape(V, Hf * Wf, B * C_out),
                idx,
                wts,
                compute_dtype=compute_dtype,
            )
        out = warped.reshape(N, B, C_out)
        out = jnp.transpose(out, (1, 0, 2)).reshape(B, Hb, Wb, C_out)
    else:
        # per-batch coords: dense legacy kernel
        Hb, Wb = coords.shape[2], coords.shape[3]
        proj = jnp.einsum(
            "bvhwc,vco->bvhwo",
            feats.astype(compute_dtype),
            proj_kernel.astype(compute_dtype),
            precision=prec,
        )
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


# ---------------------------------------------------------------------------
# windowed scatter kernel: the transpose of the warp, for the backward pass
# ---------------------------------------------------------------------------


def _scatter_kernel(
    first_ref,  # [V, T] int32 (scalar-prefetched)
    last_ref,   # [V, T] int32
    idx_ref,    # [1, 1, TILE_N, 4] int32
    wts_ref,    # [1, 1, TILE_N, 4] f32
    g_ref,      # [1, TILE_N, K] f32 (incoming cotangent per view)
    out_ref,    # [1, P_pad, K] f32 (dfeats for view v; revisited across t)
    *,
    n_tiles: int,
    compute_dtype,
):
    v = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[0, :, :] = jnp.zeros_like(out_ref[0])

    idx_t = idx_ref[0, 0]  # [tile, 4]
    wts_t = wts_ref[0, 0]
    tile = idx_t.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (WIN, tile), 0)
    g_t = g_ref[0].astype(compute_dtype)  # [tile, K]
    first = first_ref[v, t]
    last = last_ref[v, t]

    def make_s(c):
        # pure VPU arithmetic - safe to prefetch one window past `last`
        base = c * WIN
        s_t = jnp.zeros((WIN, tile), jnp.float32)
        for k in range(4):
            rel = idx_t[:, k][None, :] - base
            s_t = s_t + jnp.where(iota == rel, wts_t[:, k][None, :], 0.0)
        return s_t, base

    # software-pipelined VPU s-build / MXU dot (see _resident_kernel);
    # windows are disjoint, so the deferred accumulate stays race-free
    def body(c, carry):
        s_t, base = carry
        s_n, base_n = make_s(c + 1)
        contrib = jnp.dot(
            s_t.astype(compute_dtype), g_t,
            preferred_element_type=jnp.float32,
            precision=_mxu_precision(compute_dtype),
        )
        out_ref[0, pl.ds(pl.multiple_of(base, 8), WIN), :] += contrib
        return s_n, base_n

    jax.lax.fori_loop(first, last + 1, body, make_s(first))


def _scatter_gmajor_kernel(
    idx_ref, wts_ref, g_ref, out_ref, *, compute_dtype, n_tiles, n_win
):
    """One program per group: zero the output block once, loop sample
    tiles in-kernel (same per-program-overhead argument as the grouped
    sampler's g-major variant)."""
    out_ref[0, :, :] = jnp.zeros_like(out_ref[0])
    iota = jax.lax.broadcasted_iota(jnp.int32, (WIN, TILE_N), 0)

    def tloop(t, _):
        idx_t = idx_ref[0, :, pl.ds(t * TILE_N, TILE_N)]  # [4, TILE]
        wts_t = wts_ref[0, :, pl.ds(t * TILE_N, TILE_N)]
        g_t = g_ref[0, pl.ds(t * TILE_N, TILE_N), :].astype(compute_dtype)
        first = jnp.clip(jnp.min(idx_t) // WIN, 0, n_win - 1)
        last = jnp.clip(jnp.max(idx_t) // WIN, 0, n_win - 1)

        def make_s(c):
            # pure VPU arithmetic - safe to prefetch one window past last
            base = c * WIN
            s_t = jnp.zeros((WIN, TILE_N), jnp.float32)
            for k in range(4):
                rel = idx_t[k][None, :] - base
                s_t = s_t + jnp.where(iota == rel, wts_t[k][None, :], 0.0)
            return s_t, base

        # software-pipelined VPU s-build / MXU dot (see _resident_kernel)
        def body(c, carry):
            s_t, base = carry
            s_n, base_n = make_s(c + 1)
            contrib = jnp.dot(
                s_t.astype(compute_dtype), g_t,
                preferred_element_type=jnp.float32,
                precision=_mxu_precision(compute_dtype),
            )
            out_ref[0, pl.ds(pl.multiple_of(base, 8), WIN), :] += contrib
            return s_n, base_n

        jax.lax.fori_loop(first, last + 1, body, make_s(first))
        return 0

    jax.lax.fori_loop(0, n_tiles, tloop, 0)


def scatter_taps_windowed(
    g: jax.Array,
    idx: jax.Array,
    wts: jax.Array,
    p_out: int,
    *,
    compute_dtype: jnp.dtype = jnp.bfloat16,
) -> jax.Array:
    """Transpose of the windowed warp: dfeats[v, p] = sum over the BEV
    cells/taps that read p.

    g:   [V, N, K] cotangent of the per-view warped output
    idx: [V, N, 4] flat tap indices into [0, p_out)
    wts: [V, N, 4] tap weights (0 = masked)
    Returns [V, p_out, K] float32.

    Same windowed walk as the forward: per (view, tile), only the active
    WIN-row windows receive a S^T @ g_tile MXU contribution, accumulated
    in a VMEM-resident per-view output block (TPU grids run sequentially,
    so the revisit accumulation is race-free). This replaces XLA's
    per-index scatter-add lowering, which is ~100x slower.
    """
    V, N, _ = idx.shape
    K = g.shape[-1]
    K_pad = _round_up(K, 128)
    P_pad = _round_up(p_out, WIN)

    # g-major variant: one program per group when the whole per-group
    # workload fits VMEM (large-G deformable-attention backward); else
    # the (group, tile) grid with overhead-amortizing tile sizes
    N_pad_g = _round_up(N, TILE_N)
    gmajor_bytes = 2 * ((N_pad_g + P_pad) * K_pad * 4 + N_pad_g * 4 * 8)
    gmajor = gmajor_bytes <= _GMAJOR_VMEM_BYTES
    if gmajor:
        tile, T = N_pad_g, 1
    else:
        # large-G callers need big tiles for the same per-program-
        # overhead reason as the grouped sampler (see _grouped_tile)
        tile = _grouped_tile(V, N)
        T = _round_up(N, tile) // tile
    # unconditional: keeps block shape <= padded array when T == 1 with
    # tile > N_pad_g (ADVICE round 2)
    N_pad = tile * T

    g = g.astype(jnp.float32)
    if K_pad != K:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, K_pad - K)))
    if N_pad != N:
        g = jnp.pad(g, ((0, 0), (0, N_pad - N), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, N_pad - N), (0, 0)))
        wts = jnp.pad(wts, ((0, 0), (0, N_pad - N), (0, 0)))

    if gmajor:
        # tap-major layout (see note above _span_dot)
        idx_tm = jnp.transpose(idx, (0, 2, 1)).astype(jnp.int32)
        wts_tm = jnp.transpose(wts, (0, 2, 1)).astype(jnp.float32)
        out = pl.pallas_call(
            functools.partial(
                _scatter_gmajor_kernel,
                compute_dtype=compute_dtype,
                n_tiles=N_pad // TILE_N,
                n_win=P_pad // WIN,
            ),
            out_shape=jax.ShapeDtypeStruct((V, P_pad, K_pad), jnp.float32),
            grid=(V,),
            in_specs=[
                pl.BlockSpec((1, 4, N_pad), lambda v: (v, 0, 0)),
                pl.BlockSpec((1, 4, N_pad), lambda v: (v, 0, 0)),
                pl.BlockSpec((1, N_pad, K_pad), lambda v: (v, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, P_pad, K_pad), lambda v: (v, 0, 0)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(gmajor_bytes + 16 * 1024 * 1024),
            ),
        )(idx_tm, wts_tm, g)
        return out[:, :p_out, :K]

    idx_t = idx.reshape(V, T, tile, 4)
    wts_t = wts.reshape(V, T, tile, 4).astype(jnp.float32)
    active = wts_t > 0.0
    lo = jnp.where(active, idx_t, P_pad)
    hi = jnp.where(active, idx_t, -1)
    first = jnp.clip(jnp.min(lo, axis=(2, 3)) // WIN, 0, P_pad // WIN - 1).astype(jnp.int32)
    last = jnp.clip(jnp.max(hi, axis=(2, 3)) // WIN, -1, P_pad // WIN - 1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(V, T),
        in_specs=[
            pl.BlockSpec(
                (1, 1, tile, 4), lambda v, t, *_: (v, t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, tile, 4), lambda v, t, *_: (v, t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile, K_pad), lambda v, t, *_: (v, t, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, P_pad, K_pad), lambda v, t, *_: (v, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, n_tiles=T, compute_dtype=compute_dtype),
        out_shape=jax.ShapeDtypeStruct((V, P_pad, K_pad), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
    )(first, last, idx_t, wts_t.astype(jnp.float32), g)
    return out[:, :p_out, :K]


# ---------------------------------------------------------------------------
# grouped sampler: G independent maps, G independent index sets
# ---------------------------------------------------------------------------
#
# The deformable-attention sampler (models/fusion.py DeformableFusion) and
# the shared-camera row-pair warp (_warp_pairs_shared) both reduce to:
# for each group g, bilinearly read S locations from map g. XLA lowers
# that as a per-index gather (~15 ns/index on this TPU: 70 ms for the
# flagship deform shapes G=224, S=10800). Here each group's map is
# VMEM-resident for all its sample tiles and every tile is one (or a
# few) [TILE_N, RWIN] @ [RWIN, K] scatter-matmuls over the span its taps
# actually touch - the same trick as the resident warp kernel, minus the
# cross-view sum. Span bounds are computed in-kernel from the tap
# indices (no scalar prefetch needed: a [TILE_N, 4] min/max is VPU
# noise), which keeps the grid spec trivial.

GROUPED_BUDGET_BYTES = 64 * 1024 * 1024  # one group's map must fit VMEM


def _grouped_tile(G: int, N: int) -> int:
    """Samples per grid program. Large-G workloads (deformable attention:
    G = B*V*heads) would otherwise spawn tens of thousands of TILE_N
    programs whose ~us-scale per-step overhead dwarfs the 0.1-us matmuls;
    bigger tiles amortize it (overhead scales 1/tile, one-hot build cost
    is tile-invariant, span waste grows slowly)."""
    tile = TILE_N
    while G * ((N + tile - 1) // tile) > 4096 and tile < 2048:
        tile *= 2
    return tile


# A (g, tile)-grid program does ~0.1 us of matmul behind ~us of grid-step
# overhead when G is large (deformable attention: G = B*V*heads -> tens
# of thousands of programs). The g-major variants below run ONE program
# per group and loop the sample tiles in-kernel (the same trick as the
# resident warp kernel's span walk): block DMA happens once per group,
# the tile loop costs scalar ops only. Used whenever the per-group
# blocks fit VMEM (see _GMAJOR_VMEM_BYTES); the (g, t) grid remains for
# wide-K cases like the batch-folded shared warp.

_GMAJOR_VMEM_BYTES = 48 * 1024 * 1024
# span width for the grouped kernels. Wider than the resident kernel's
# RWIN=384: an on-TPU sweep at flagship deform shapes (module fwd, ms):
# 128->47.5, 256->32.2, 384->28.8, 512->25.1, 1024->25.1, 1280->26.4 -
# fewer span iterations and wider MXU matmuls win until ~512. Env
# override (VSTA_GRWIN) exists for sweeps (scripts/profile_deform.py);
# must stay a multiple of 8 (sublane alignment of the span starts).
import os as _os

GRWIN = int(_os.environ.get("VSTA_GRWIN", "512"))
assert GRWIN % 8 == 0, "VSTA_GRWIN must be a multiple of 8"


# Index/weight layout note: the 4 taps ride the SUBLANE axis ([G, 4, N],
# N in lanes). A [N, 4] layout looks natural but pads the 4-wide minor
# dim to 128 lanes inside VMEM - a 32x blowup that OOMs the g-major
# blocks (43k-sample group: 692 KB of indices becomes 44 MB). The
# one-hot matrix is built [GRWIN, tile]-oriented to match and contracted
# with dot_general over dim 0 (a transposed matmul, native on the MXU).


def _span_dot(s, span, compute_dtype):
    """[GRWIN, tile] one-hot (f32) x [GRWIN, K] span -> [tile, K] f32."""
    return jax.lax.dot_general(
        s.astype(compute_dtype), span,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(compute_dtype),
    )


def _grouped_sample_gmajor_kernel(
    idx_ref, wts_ref, map_ref, out_ref, *, compute_dtype, p_res, n_tiles
):
    iota = jax.lax.broadcasted_iota(jnp.int32, (GRWIN, TILE_N), 0)

    def tloop(t, _):
        idxb = idx_ref[0, :, pl.ds(t * TILE_N, TILE_N)]  # [4, TILE]
        wtsb = wts_ref[0, :, pl.ds(t * TILE_N, TILE_N)]
        lo = jnp.min(idxb)
        hi = jnp.max(idxb)
        lo8 = jnp.clip((lo // 8) * 8, 0, p_res - GRWIN)
        nw = (hi - lo8) // GRWIN + 1

        def make_s(w):
            # pure VPU arithmetic (no memory reads depend on w), so the
            # prefetched w+1 needs no bounds clamp
            start = lo8 + w * GRWIN
            s = jnp.zeros((GRWIN, TILE_N), jnp.float32)
            for k in range(4):
                rel = idxb[k][None, :] - start
                s = s + jnp.where(iota == rel, wtsb[k][None, :], 0.0)
            return s, start

        # software-pipelined: build span w+1's one-hot (VPU) before span
        # w's dot (MXU) so Mosaic can overlap the engines (see
        # _resident_kernel)
        def body(w, carry):
            acc, s, start = carry
            s_n, start_n = make_s(w + 1)
            acc = acc + _span_dot(
                s,
                map_ref[0, pl.ds(pl.multiple_of(start, 8), GRWIN), :],
                compute_dtype,
            )
            return acc, s_n, start_n

        acc, _, _ = jax.lax.fori_loop(
            0, nw, body,
            (jnp.zeros((TILE_N, out_ref.shape[-1]), jnp.float32), *make_s(0)),
        )
        out_ref[0, pl.ds(t * TILE_N, TILE_N), :] = acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_tiles, tloop, 0)


def _grouped_sample_kernel(idx_ref, wts_ref, map_ref, out_ref, *, compute_dtype, p_res):
    idxb = idx_ref[0]   # [4, tile] int32 (always in [0, P): clamped taps)
    wtsb = wts_ref[0]   # [4, tile] f32 (0 = masked)
    tile = idxb.shape[1]
    # span bounds over ALL taps (not just wts>0): zero-weight taps still
    # need exact tap-dot gradients (d_wts at integer coords is nonzero),
    # and clamped out-of-image indices are valid rows
    lo = jnp.min(idxb)
    hi = jnp.max(idxb)
    lo8 = jnp.clip((lo // 8) * 8, 0, p_res - GRWIN)
    nw = (hi - lo8) // GRWIN + 1
    iota = jax.lax.broadcasted_iota(jnp.int32, (GRWIN, tile), 0)

    def make_s(w):
        # pure VPU arithmetic - safe to prefetch one item past nw
        start = lo8 + w * GRWIN
        s = jnp.zeros((GRWIN, tile), jnp.float32)
        for k in range(4):
            rel = idxb[k][None, :] - start
            s = s + jnp.where(iota == rel, wtsb[k][None, :], 0.0)
        return s, start

    # software-pipelined VPU s-build / MXU dot (see _resident_kernel)
    def body(w, carry):
        acc, s, start = carry
        s_n, start_n = make_s(w + 1)
        acc = acc + _span_dot(
            s,
            map_ref[0, pl.ds(pl.multiple_of(start, 8), GRWIN), :],
            compute_dtype,
        )
        return acc, s_n, start_n

    acc, _, _ = jax.lax.fori_loop(
        0, nw, body,
        (jnp.zeros((tile, out_ref.shape[-1]), jnp.float32), *make_s(0)),
    )
    out_ref[0] = acc.astype(out_ref.dtype)


def sample_tiles_grouped(
    maps: jax.Array,
    idx: jax.Array,
    wts: jax.Array,
    *,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Per-group bilinear sampling as windowed scatter-matmuls.

    maps: [G, P, K] (P = padded flat pixels of one feature map)
    idx:  [G, N, 4] int32 flat taps into [0, P); wts [G, N, 4] (0 = masked)
    Returns [G, N, K] in ``compute_dtype`` (f32-accumulated).

    Replaces XLA's per-index gather for the deformable-attention sampler
    and the shared-camera warp forward (see module doc).
    """
    G, P, K = maps.shape
    N = idx.shape[1]
    P_res = _round_up(P, 8) + GRWIN
    K_pad = _round_up(K, 128)
    itemsize = jnp.dtype(compute_dtype).itemsize

    N_pad_g = _round_up(N, TILE_N)
    gmajor_bytes = 2 * ((P_res + N_pad_g) * K_pad * itemsize + N_pad_g * 4 * 8)
    if gmajor_bytes <= _GMAJOR_VMEM_BYTES:
        tile, T = N_pad_g, 1  # one program per group, tiles loop in-kernel
    else:
        tile = _grouped_tile(G, N)
        T = _round_up(N, tile) // tile
    # block shape and array padding must always agree: when _grouped_tile
    # grows tile past N (T == 1), N_pad_g < tile would make the BlockSpec
    # exceed the padded array (ADVICE round 2)
    N_pad = tile * T

    maps = maps.astype(compute_dtype)
    maps = jnp.pad(maps, ((0, 0), (0, P_res - P), (0, K_pad - K)))
    if N_pad != N:
        idx = jnp.pad(idx, ((0, 0), (0, N_pad - N), (0, 0)))
        wts = jnp.pad(wts, ((0, 0), (0, N_pad - N), (0, 0)))
    # tap-major layout (see note above _span_dot)
    idx_t = jnp.transpose(idx, (0, 2, 1)).astype(jnp.int32)      # [G, 4, N_pad]
    wts_t = jnp.transpose(wts, (0, 2, 1)).astype(jnp.float32)

    if T == 1:
        kern_fn = functools.partial(
            _grouped_sample_gmajor_kernel,
            compute_dtype=compute_dtype,
            p_res=P_res,
            n_tiles=N_pad // TILE_N,
        )
    else:
        kern_fn = functools.partial(
            _grouped_sample_kernel, compute_dtype=compute_dtype, p_res=P_res
        )
    kern = pl.pallas_call(
        kern_fn,
        out_shape=jax.ShapeDtypeStruct((G, N_pad, K_pad), compute_dtype),
        grid=(G, T),
        in_specs=[
            pl.BlockSpec((1, 4, tile), lambda g, t: (g, 0, t)),
            pl.BlockSpec((1, 4, tile), lambda g, t: (g, 0, t)),
            pl.BlockSpec((1, P_res, K_pad), lambda g, t: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, K_pad), lambda g, t: (g, t, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                (gmajor_bytes if T == 1 else (P_res + 2 * tile) * K_pad * itemsize)
                + 16 * 1024 * 1024
            ),
        ),
        interpret=interpret,
    )
    out = kern(idx_t, wts_t, maps)
    return out[:, :N, :K]


def _grouped_tapdot_gmajor_kernel(
    idx_ref, wts_ref, g_ref, map_ref, out_ref, *, compute_dtype, p_res, n_tiles
):
    iota = jax.lax.broadcasted_iota(jnp.int32, (GRWIN, TILE_N), 0)

    def tloop(t, _):
        idxb = idx_ref[0, :, pl.ds(t * TILE_N, TILE_N)]  # [4, TILE]
        gt = g_ref[0, pl.ds(t * TILE_N, TILE_N), :].astype(compute_dtype)
        lo = jnp.min(idxb)
        hi = jnp.max(idxb)
        lo8 = jnp.clip((lo // 8) * 8, 0, p_res - GRWIN)
        nw = (hi - lo8) // GRWIN + 1

        def make_dots(w):
            start = lo8 + w * GRWIN
            # the prefetched span (w == nw) is discarded but its map read
            # must stay in bounds; executed spans never clamp (their
            # starts are <= hi < p_res - GRWIN)
            start_m = pl.multiple_of(jnp.minimum(start, p_res - GRWIN), 8)
            span = map_ref[0, pl.ds(start_m, GRWIN), :]
            dots = jax.lax.dot_general(
                span, gt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mxu_precision(compute_dtype),
            )  # [GRWIN, TILE_N]
            return dots, start

        # software-pipelined: issue span w+1's MXU dot before span w's
        # VPU tap-selects so the engines overlap (mirror image of
        # _resident_kernel, where the VPU work leads)
        def body(w, carry):
            acc, dots, start = carry
            dots_n, start_n = make_dots(w + 1)
            new = []
            for k in range(4):
                rel = idxb[k][None, :] - start
                new.append(acc[k] + jnp.sum(jnp.where(iota == rel, dots, 0.0), axis=0))
            return tuple(new), dots_n, start_n

        acc, _, _ = jax.lax.fori_loop(
            0, nw, body,
            (tuple(jnp.zeros((TILE_N,), jnp.float32) for _ in range(4)),
             *make_dots(0)),
        )
        for k in range(4):
            out_ref[0, t, k, :] = acc[k]
        return 0

    jax.lax.fori_loop(0, n_tiles, tloop, 0)


def _grouped_tapdot_kernel(idx_ref, wts_ref, g_ref, map_ref, out_ref, *, compute_dtype, p_res):
    idxb = idx_ref[0]   # [4, tile]
    tile = idxb.shape[1]
    lo = jnp.min(idxb)
    hi = jnp.max(idxb)
    lo8 = jnp.clip((lo // 8) * 8, 0, p_res - GRWIN)
    nw = (hi - lo8) // GRWIN + 1
    iota = jax.lax.broadcasted_iota(jnp.int32, (GRWIN, tile), 0)
    gt = g_ref[0].astype(compute_dtype)  # [tile, K]

    def make_dots(w):
        # dots[r, s] = <map[start + r], g[s]> - contract K without
        # materializing a transpose. The prefetched span (w == nw) is
        # discarded but its map read must stay in bounds.
        start = lo8 + w * GRWIN
        start_m = pl.multiple_of(jnp.minimum(start, p_res - GRWIN), 8)
        span = map_ref[0, pl.ds(start_m, GRWIN), :]
        dots = jax.lax.dot_general(
            span, gt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mxu_precision(compute_dtype),
        )  # [GRWIN, tile]
        return dots, start

    # software-pipelined MXU dot prefetch (see _grouped_tapdot_gmajor_kernel)
    def body(w, carry):
        acc, dots, start = carry
        dots_n, start_n = make_dots(w + 1)
        new = []
        for k in range(4):
            rel = idxb[k][None, :] - start             # [1, tile]
            new.append(acc[k] + jnp.sum(jnp.where(iota == rel, dots, 0.0), axis=0))
        return tuple(new), dots_n, start_n

    acc, _, _ = jax.lax.fori_loop(
        0, nw, body,
        (tuple(jnp.zeros((tile,), jnp.float32) for _ in range(4)), *make_dots(0)),
    )
    for k in range(4):
        out_ref[0, 0, k, :] = acc[k]


def taps_dot_grouped(
    maps: jax.Array,
    gout: jax.Array,
    idx: jax.Array,
    wts: jax.Array,
    *,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """d_wts of the grouped sampler: d_wts[g,n,k] = <maps[g, idx[g,n,k]], gout[g,n]>.

    maps [G, P, K]; gout [G, N, K]; idx/wts [G, N, 4].
    Returns [G, N, 4] float32. The weight gradient drives LEARNED
    sampling locations (deformable attention); masked taps get junk
    values that the caller's in-image mask multiplies away - identical
    semantics to the XLA re-gather path (_warp_pairs_shared_bwd).
    """
    G, P, K = maps.shape
    N = idx.shape[1]
    P_res = _round_up(P, 8) + GRWIN
    K_pad = _round_up(K, 128)
    itemsize = jnp.dtype(compute_dtype).itemsize

    N_pad_g = _round_up(N, TILE_N)
    gmajor_bytes = 2 * ((P_res + 2 * N_pad_g) * K_pad * itemsize + N_pad_g * 4 * 8)
    gmajor = gmajor_bytes <= _GMAJOR_VMEM_BYTES
    if gmajor:
        tile, T = N_pad_g, 1
        TT = N_pad_g // TILE_N  # in-kernel tile count (output layout)
    else:
        tile = _grouped_tile(G, N)
        T = _round_up(N, tile) // tile
        TT = T
    # unconditional (ADVICE round 2): block shape must not exceed padding
    N_pad = tile * T

    maps = maps.astype(compute_dtype)
    maps = jnp.pad(maps, ((0, 0), (0, P_res - P), (0, K_pad - K)))
    gout = gout.astype(compute_dtype)
    if K_pad != K:
        gout = jnp.pad(gout, ((0, 0), (0, 0), (0, K_pad - K)))
    if N_pad != N:
        gout = jnp.pad(gout, ((0, 0), (0, N_pad - N), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, N_pad - N), (0, 0)))
        wts = jnp.pad(wts, ((0, 0), (0, N_pad - N), (0, 0)))
    # tap-major layout (see note above _span_dot)
    idx_tm = jnp.transpose(idx, (0, 2, 1)).astype(jnp.int32)     # [G, 4, N_pad]
    wts_tm = jnp.transpose(wts, (0, 2, 1)).astype(jnp.float32)

    if gmajor:
        kern_fn = functools.partial(
            _grouped_tapdot_gmajor_kernel,
            compute_dtype=compute_dtype, p_res=P_res, n_tiles=TT,
        )
        out_block = pl.BlockSpec((1, TT, 4, TILE_N), lambda g, t: (g, 0, 0, 0))
        out_tile = TILE_N
    else:
        kern_fn = functools.partial(
            _grouped_tapdot_kernel, compute_dtype=compute_dtype, p_res=P_res
        )
        out_block = pl.BlockSpec((1, 1, 4, tile), lambda g, t: (g, t, 0, 0))
        out_tile = tile

    kern = pl.pallas_call(
        kern_fn,
        out_shape=jax.ShapeDtypeStruct((G, TT, 4, out_tile), jnp.float32),
        grid=(G, T),
        in_specs=[
            pl.BlockSpec((1, 4, tile), lambda g, t: (g, 0, t)),
            pl.BlockSpec((1, 4, tile), lambda g, t: (g, 0, t)),
            pl.BlockSpec((1, tile, K_pad), lambda g, t: (g, t, 0)),
            pl.BlockSpec((1, P_res, K_pad), lambda g, t: (g, 0, 0)),
        ],
        out_specs=out_block,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                (gmajor_bytes if gmajor else (P_res + 2 * tile) * K_pad * itemsize)
                + 16 * 1024 * 1024
            ),
        ),
        interpret=interpret,
    )
    out = kern(idx_tm, wts_tm, gout, maps)  # [G, TT, 4, out_tile]
    out = jnp.transpose(out, (0, 1, 3, 2)).reshape(G, N_pad, 4)
    return out[:, :N]


def _grouped_bwd_gmajor_kernel(
    idx_ref,   # [1, 4, N_pad] int32
    wts_ref,   # [1, 4, N_pad] f32
    g_ref,     # [1, N_pad, K_pad] cotangent
    map_ref,   # [1, P_res, K_pad] feature map (for d_wts tap dots)
    dmap_ref,  # [1, P_res, K_pad] f32 out (dfeats)
    dwts_ref,  # [1, TT, 4, TILE_N] f32 out (d_wts)
    *,
    compute_dtype,
    p_res,
    n_tiles,
):
    """Fused backward of the grouped sampler: ONE span walk per sample
    tile produces both gradients. The scatter half (dfeats = S^T @ g) and
    the tap-dot half (d_wts = <map, g> selected per tap) previously ran
    as two kernels repeating the same window walk, the same 4 iota==rel
    tap masks, and the same g-block DMA; here each window builds the
    masks once and feeds both MXU contractions."""
    dmap_ref[0, :, :] = jnp.zeros_like(dmap_ref[0])
    iota = jax.lax.broadcasted_iota(jnp.int32, (GRWIN, TILE_N), 0)

    def tloop(t, _):
        idxb = idx_ref[0, :, pl.ds(t * TILE_N, TILE_N)]  # [4, TILE]
        wtsb = wts_ref[0, :, pl.ds(t * TILE_N, TILE_N)]
        gt = g_ref[0, pl.ds(t * TILE_N, TILE_N), :].astype(compute_dtype)
        lo = jnp.min(idxb)
        hi = jnp.max(idxb)
        lo8 = jnp.clip((lo // 8) * 8, 0, p_res - GRWIN)
        nw = (hi - lo8) // GRWIN + 1

        def make_dots(w):
            # tap-dot half: dots[r, s] = <map[start + r], g[s]>. The
            # prefetched span (w == nw) is discarded but its map read
            # must stay in bounds.
            start = lo8 + w * GRWIN
            start_m = pl.multiple_of(jnp.minimum(start, p_res - GRWIN), 8)
            span = map_ref[0, pl.ds(start_m, GRWIN), :]
            dots = jax.lax.dot_general(
                span, gt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mxu_precision(compute_dtype),
            )  # [GRWIN, TILE_N]
            return dots, start

        # software-pipelined: span w+1's tap-dot (MXU) issues before span
        # w's VPU mask/select work and scatter-dot, so the engines overlap
        def body(w, carry):
            acc, dots, start = carry
            dots_n, start_n = make_dots(w + 1)
            s = jnp.zeros((GRWIN, TILE_N), jnp.float32)
            new = []
            for k in range(4):
                rel = idxb[k][None, :] - start
                m = iota == rel  # shared tap mask: one-hot AND dot select
                s = s + jnp.where(m, wtsb[k][None, :], 0.0)
                new.append(acc[k] + jnp.sum(jnp.where(m, dots, 0.0), axis=0))
            # scatter half: dmap[span] += S @ g  ([GRWIN, TILE] @ [TILE, K])
            dmap_ref[0, pl.ds(pl.multiple_of(start, 8), GRWIN), :] += jnp.dot(
                s.astype(compute_dtype), gt,
                preferred_element_type=jnp.float32,
                precision=_mxu_precision(compute_dtype),
            )
            return tuple(new), dots_n, start_n

        acc, _, _ = jax.lax.fori_loop(
            0, nw, body,
            (tuple(jnp.zeros((TILE_N,), jnp.float32) for _ in range(4)),
             *make_dots(0)),
        )
        for k in range(4):
            dwts_ref[0, t, k, :] = acc[k]
        return 0

    jax.lax.fori_loop(0, n_tiles, tloop, 0)


def scatter_tapdot_grouped(
    maps: jax.Array,
    gout: jax.Array,
    idx: jax.Array,
    wts: jax.Array,
    *,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    interpret: bool = False,
) -> Optional[Tuple[jax.Array, jax.Array]]:
    """Both gradients of the grouped sampler in one fused kernel pass.

    maps [G, P, K]; gout [G, N, K] (cotangent); idx/wts [G, N, 4].
    Returns ``(dmaps [G, P, K] f32, d_wts [G, N, 4] f32)`` - exactly
    ``scatter_taps_windowed`` + ``taps_dot_grouped`` - or **None** when
    the per-group blocks exceed the g-major VMEM budget (the caller falls
    back to the two separate kernels). Masked taps get junk d_wts values
    the caller masks away, same as ``taps_dot_grouped``.
    """
    G, P, K = maps.shape
    N = idx.shape[1]
    P_res = _round_up(P, 8) + GRWIN
    K_pad = _round_up(K, 128)
    itemsize = jnp.dtype(compute_dtype).itemsize

    N_pad = _round_up(N, TILE_N)
    # resident per group: map (cdt) + dmap out (f32) + g (cdt) + idx/wts
    # + dwts out, all double-buffered
    fused_bytes = 2 * (
        P_res * K_pad * (itemsize + 4)
        + N_pad * K_pad * itemsize
        + N_pad * 4 * 12
    )
    if fused_bytes > _GMAJOR_VMEM_BYTES:
        return None
    TT = N_pad // TILE_N

    maps = maps.astype(compute_dtype)
    maps = jnp.pad(maps, ((0, 0), (0, P_res - P), (0, K_pad - K)))
    gout = gout.astype(compute_dtype)
    if K_pad != K:
        gout = jnp.pad(gout, ((0, 0), (0, 0), (0, K_pad - K)))
    if N_pad != N:
        gout = jnp.pad(gout, ((0, 0), (0, N_pad - N), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, N_pad - N), (0, 0)))
        wts = jnp.pad(wts, ((0, 0), (0, N_pad - N), (0, 0)))
    # tap-major layout (see note above _span_dot)
    idx_tm = jnp.transpose(idx, (0, 2, 1)).astype(jnp.int32)
    wts_tm = jnp.transpose(wts, (0, 2, 1)).astype(jnp.float32)

    dmap, dwts = pl.pallas_call(
        functools.partial(
            _grouped_bwd_gmajor_kernel,
            compute_dtype=compute_dtype,
            p_res=P_res,
            n_tiles=TT,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, P_res, K_pad), jnp.float32),
            jax.ShapeDtypeStruct((G, TT, 4, TILE_N), jnp.float32),
        ),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 4, N_pad), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 4, N_pad), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, N_pad, K_pad), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, P_res, K_pad), lambda g: (g, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, P_res, K_pad), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, TT, 4, TILE_N), lambda g: (g, 0, 0, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(fused_bytes + 16 * 1024 * 1024),
        ),
        interpret=interpret,
    )(idx_tm, wts_tm, gout, maps)
    d_wts = jnp.transpose(dwts, (0, 1, 3, 2)).reshape(G, N_pad, 4)
    return dmap[:, :P, :K], d_wts[:, :N]


# ---------------------------------------------------------------------------
# legacy dense one-hot kernel (per-batch coords)
# ---------------------------------------------------------------------------


def _warp_kernel(idx_ref, wts_ref, feat_ref, out_ref, *, n_views: int, P: int):
    """Grid: (B, N // TILE_N). Dense one-hot scatter-matmul (see module doc)."""
    pcols = jax.lax.broadcasted_iota(jnp.int32, (TILE_N, P), 1)
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for v in range(n_views):
        s = jnp.zeros((TILE_N, P), jnp.float32)
        for k in range(4):
            idx_k = idx_ref[0, v, :, k][:, None]  # [TILE_N, 1]
            w_k = wts_ref[0, v, :, k][:, None]
            s = s + jnp.where(pcols == idx_k, w_k, 0.0)
        acc = acc + jnp.dot(
            s, feat_ref[0, v].astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    out_ref[0] = acc.astype(out_ref.dtype)


def warp_views_sum_pallas(
    feats_flat: jax.Array, idx: jax.Array, wts: jax.Array
) -> jax.Array:
    """sum_v bilinear-warp(feats[v]) for all BEV cells, dense variant.

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
