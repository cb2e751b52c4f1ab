"""Homography warp of per-view feature maps onto the BEV grid.

This replaces the reference's per-(batch, view) Python loop over
``kornia.warp_perspective`` / ``F.grid_sample``
(reference: project/models/fusion/geometry.py:120-162) with fully
vectorized, jittable ops in channels-last (NHWC) layout.

Three levels:

1. :func:`bilinear_sample` / :func:`warp_views` - XLA gather-based
   bilinear resampling, semantically identical to
   ``grid_sample(mode='bilinear', padding_mode='zeros',
   align_corners=False)`` at the reference's sample locations.

2. :func:`precompute_warp_lut` - because bilinear warping is a fixed
   linear map once calibration is known, each BEV cell reduces to 4
   (source index, weight) pairs per view. The LUT makes the warp a
   gather + weighted sum and is shared across the whole dataset
   (Wildtrack cameras are static).

3. :func:`fused_warp_proj` - the TPU-first rewrite of the reference's
   warp -> concat -> 1x1-conv pipeline (model_wrapper.py:68-73). Since
   the warp is linear in features and ConcatFusion + 1x1 conv is
   ``sum_v feat_v @ W_v + b``, we PROJECT per-view features first (a
   matmul over the small image-space map, MXU-friendly), then warp the
   projected maps and sum over views. Mathematically identical, but never
   materializes the [B, V, C, H_bev, W_bev] tensor (1.5 GB at the
   reference's full config) and warps bev_proj_ch channels instead of
   V * feat_dim.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Bilinear weighted sums are 4-term dots: keep them exact in f32
# regardless of the platform's default matmul precision.
_HI = jax.lax.Precision.HIGHEST


def _gather_weights_indices(
    coords: jax.Array, feat_hw: Tuple[int, int]
) -> Tuple[jax.Array, jax.Array]:
    """Bilinear neighbor indices and weights with zeros padding semantics.

    coords: (..., 2) float (x, y) pixel-index coordinates.
    Returns (idx, wts): idx (..., 4) int32 flat indices into [Hf*Wf]
    (clamped in-range), wts (..., 4) float32 with out-of-image neighbors
    getting weight 0 - exactly torch grid_sample zeros padding.
    """
    Hf, Wf = feat_hw
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0).astype(jnp.float32)
    dy = (y - y0).astype(jnp.float32)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(xi, yi, w):
        inb = (xi >= 0) & (xi < Wf) & (yi >= 0) & (yi < Hf)
        xi_c = jnp.clip(xi, 0, Wf - 1)
        yi_c = jnp.clip(yi, 0, Hf - 1)
        return yi_c * Wf + xi_c, w * inb.astype(jnp.float32)

    i00, w00 = corner(x0i, y0i, (1.0 - dx) * (1.0 - dy))
    i01, w01 = corner(x0i + 1, y0i, dx * (1.0 - dy))
    i10, w10 = corner(x0i, y0i + 1, (1.0 - dx) * dy)
    i11, w11 = corner(x0i + 1, y0i + 1, dx * dy)

    idx = jnp.stack([i00, i01, i10, i11], axis=-1)
    wts = jnp.stack([w00, w01, w10, w11], axis=-1)
    # Guard against non-finite sample coords (e.g. behind-camera points
    # projected through the horizon): zero their contribution entirely.
    finite = jnp.all(jnp.isfinite(coords), axis=-1, keepdims=True)
    wts = jnp.where(finite, wts, 0.0)
    idx = jnp.where(finite, idx, 0)
    return idx, wts


def _anchored_taps(
    coords: jax.Array, feat_hw: Tuple[int, int]
) -> Tuple[jax.Array, jax.Array]:
    """2x2-patch anchor + per-tap bilinear weights, zeros-padding semantics.

    coords: (..., 2) float (x, y). Returns (anchor (..., 2) int32 as
    (ya, xa) clamped in-image, weights (..., 4)) with tap order
    (ya,xa), (ya,xa+1), (ya+1,xa), (ya+1,xa+1). The weight of tap t is
    the bilinear hat max(0, 1-|t - coord|) per axis, so taps the clamp
    shifted away from the true floor get weight 0, and taps landing on
    the zero-pad row/col multiply zeros - exactly grid_sample's
    padding_mode='zeros' (reference geometry.py:142-162).

    TPU rationale: ONE gather anchor per sample instead of 4 flat
    indices - XLA:TPU gather cost is per-index, not per-byte.
    """
    Hf, Wf = feat_hw
    x = coords[..., 0]
    y = coords[..., 1]
    finite = jnp.isfinite(x) & jnp.isfinite(y)
    xs = jnp.where(finite, x, jnp.float32(-10.0)).astype(jnp.float32)
    ys = jnp.where(finite, y, jnp.float32(-10.0)).astype(jnp.float32)
    ya = jnp.clip(jnp.floor(ys), 0, Hf - 1).astype(jnp.int32)
    xa = jnp.clip(jnp.floor(xs), 0, Wf - 1).astype(jnp.int32)

    def tri(a, f):
        return jnp.maximum(0.0, 1.0 - jnp.abs(a.astype(jnp.float32) - f))

    wy0, wy1 = tri(ya, ys), tri(ya + 1, ys)
    wx0, wx1 = tri(xa, xs), tri(xa + 1, xs)
    w = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1)
    return jnp.stack([ya, xa], axis=-1), w


def _pad_feat_br(feat: jax.Array) -> jax.Array:
    """Zero-pad one row (bottom) and one col (right): [..., H+1, W+1, C]."""
    pad = [(0, 0)] * (feat.ndim - 3) + [(0, 1), (0, 1), (0, 0)]
    return jnp.pad(feat, pad)


def _gather_patches(feat_pad: jax.Array, anchors: jax.Array) -> jax.Array:
    """Gather 2x2xC patches. feat_pad [Hp, Wp, C]; anchors [N, 2] int32
    (ya, xa), guaranteed in-bounds for a 2x2 slice. Returns [N, 2, 2, C]."""
    C = feat_pad.shape[-1]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )
    return jax.lax.gather(
        feat_pad,
        anchors,
        dn,
        slice_sizes=(2, 2, C),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def bilinear_sample(feat: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinearly sample a single feature map at float pixel coords.

    feat: [Hf, Wf, C] (channels last); coords: (..., 2) as (x, y).
    Returns (..., C). Out-of-image samples read as zeros.

    Implemented as one 2x2xC patch gather per sample (4x fewer gather
    indices than 4 flat taps - the XLA:TPU gather bottleneck).
    """
    Hf, Wf, C = feat.shape
    anchors, wts = _anchored_taps(coords, (Hf, Wf))
    lead = coords.shape[:-1]
    patches = _gather_patches(_pad_feat_br(feat), anchors.reshape(-1, 2))
    patches = patches.reshape(lead + (4, C))
    return jnp.einsum(
        "...k,...kc->...c", wts, patches.astype(wts.dtype), precision=_HI
    ).astype(feat.dtype)


def sample_bilinear_many(feats: jax.Array, coords: jax.Array) -> jax.Array:
    """Batched bilinear sampling through the fast-VJP primitive.

    feats:  [G, Hf, Wf, C]; coords: [G, S, 2] (x, y) pixel coords.
    Returns [G, S, C]. Zeros-padding semantics; backward runs the
    windowed Pallas scatter on TPU (see _warp_pairs_shared) instead of
    XLA's per-index scatter-add. This is the single sampling primitive
    behind warp_views and DeformableFusion.
    """
    G, Hf, Wf, C = feats.shape
    anchors, wts = _anchored_taps(coords, (Hf, Wf))
    fp = _pad_feat_br(feats).reshape(G, (Hf + 1) * (Wf + 1), C)
    return _warp_pairs_shared(fp, anchors, wts, (Hf, Wf))


def sample_bilinear_many_scaled(
    feats: jax.Array, coords: jax.Array, scale: jax.Array
) -> jax.Array:
    """:func:`sample_bilinear_many` with a per-sample scalar folded into
    the 4 bilinear tap weights.

    Sampling is linear in the tap weights, so
    ``scale * sample(feats, coords) == sample_scaled(feats, coords,
    scale)`` exactly - but folding the scale (e.g. deformable-attention
    weights) into the weights BEFORE the kernel removes the downstream
    weighting einsum entirely: its forward is a free multiply inside the
    kernel's one-hot build, and its backward rides the kernel's exact
    ``d_wts`` path (a [G,S,4] cotangent) instead of materializing a
    [G,S,C] cotangent for a separate einsum (measured: the deform
    module's fwd+bwd drops 50.7 -> ~31 ms at batch 8 flagship shapes,
    docs/PERFORMANCE.md "Deformable-attention").

    feats [G,Hf,Wf,C]; coords [G,S,2] (x,y) px; scale [G,S] float.
    Returns [G,S,C] = scale[...,None] * bilinear_sample(feats, coords).
    """
    G, Hf, Wf, C = feats.shape
    anchors, wts = _anchored_taps(coords, (Hf, Wf))
    wts = wts * scale[..., None].astype(wts.dtype)
    fp = _pad_feat_br(feats).reshape(G, (Hf + 1) * (Wf + 1), C)
    return _warp_pairs_shared(fp, anchors, wts, (Hf, Wf))


def warp_views(feats: jax.Array, coords: jax.Array) -> jax.Array:
    """Warp per-view feature maps to BEV (unfused; parity surface).

    feats:  [B, V, Hf, Wf, C]
    coords: [B, V, Hb, Wb, 2] feature-space sample coordinates
            (from :func:`vsta_tpu.geometry.bev_sample_coords`).
    Returns [B, V, Hb, Wb, C] per-view BEV maps (reference geometry.py:80-163
    output, transposed to channels-last).
    """
    B, V, Hf, Wf, C = feats.shape
    Hb, Wb = coords.shape[2], coords.shape[3]
    out = sample_bilinear_many(
        feats.reshape(B * V, Hf, Wf, C), coords.reshape(B * V, Hb * Wb, 2)
    )
    return out.reshape(B, V, Hb, Wb, C)


def precompute_warp_lut(
    coords: jax.Array, feat_hw: Tuple[int, int]
) -> Tuple[jax.Array, jax.Array]:
    """Materialize the (index, weight) LUT of the fixed linear warp.

    coords: (..., Hb, Wb, 2). Returns idx (..., Hb, Wb, 4) int32 and
    wts (..., Hb, Wb, 4) float32. Static calibration => compute once,
    reuse every step (Fast-BEV-style LUT, built on device).
    """
    return _gather_weights_indices(coords, feat_hw)


def _warp_one_lut(feat_flat: jax.Array, idx: jax.Array, wts: jax.Array) -> jax.Array:
    """feat_flat [P, C], idx [..., 4], wts [..., 4] -> (..., C)."""
    vals = jnp.take(feat_flat, idx.reshape(-1), axis=0).reshape(idx.shape + (feat_flat.shape[-1],))
    return jnp.einsum("...k,...kc->...c", wts, vals.astype(wts.dtype), precision=_HI)


def warp_views_lut(feats: jax.Array, idx: jax.Array, wts: jax.Array) -> jax.Array:
    """LUT-based warp: feats [B,V,Hf,Wf,C], idx/wts [B,V,Hb,Wb,4] -> [B,V,Hb,Wb,C]."""
    B, V, Hf, Wf, C = feats.shape
    flat = feats.reshape(B, V, Hf * Wf, C)
    out = jax.vmap(jax.vmap(_warp_one_lut))(flat, idx, wts)
    return out.astype(feats.dtype)


def _flat_taps(anchors: jax.Array, Wp: int) -> jax.Array:
    """[V, N, 2] (ya, xa) anchors -> [V, N, 4] flat tap indices into the
    padded (Wp-wide) row-major map, tap order matching _anchored_taps."""
    p00 = anchors[..., 0] * Wp + anchors[..., 1]
    return jnp.stack([p00, p00 + 1, p00 + Wp, p00 + Wp + 1], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _warp_pairs_shared(
    feats_vpbc: jax.Array, anchors: jax.Array, wts: jax.Array, feat_hw: Tuple[int, int]
) -> jax.Array:
    """Row-pair gather warp for batch-shared cameras.

    feats_vpbc: [V, Hp*Wp, K] - padded feature maps flattened with the
                BATCH folded into the channel axis (K = B*C). Gather cost
                on XLA:TPU is per-index, so sharing one index across the
                whole batch is ~B times cheaper.
    anchors:    [V, N, 2] int32 (ya, xa); wts [V, N, 4].
    Returns [V, N, K] float of compute dtype.

    custom_vjp: XLA lowers the gather's transpose as a per-index
    scatter-add (~2.2 s/step at flagship shapes on TPU); the backward
    here uses the windowed Pallas scatter kernel instead
    (:func:`vsta_tpu.ops.warp_pallas.scatter_taps_windowed`). The weight
    gradient (needed when sampling locations are LEARNED, e.g.
    deformable attention) is computed exactly by re-gathering the taps;
    anchors are integer (piecewise-constant) and get no gradient.
    """
    return _warp_pairs_shared_impl(feats_vpbc, anchors, wts, feat_hw)


def _gather_taps(feats_vpbc, anchors, feat_hw):
    """Row-pair gather of the 4 bilinear taps: [V, N, 4, K]."""
    Hf, Wf = feat_hw
    Wp = Wf + 1
    K = feats_vpbc.shape[-1]
    p00 = (anchors[..., 0] * Wp + anchors[..., 1])[..., None]  # [V, N, 1]

    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
    )

    def gpair(f, anc):  # f [Ppad, K], anc [N, 1] -> [N, 2, K]
        return jax.lax.gather(
            f, anc, dn, slice_sizes=(2, K),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )

    top = jax.vmap(gpair)(feats_vpbc, p00)        # [V,N,2,K]: (ya,xa),(ya,xa+1)
    bot = jax.vmap(gpair)(feats_vpbc, p00 + Wp)   # [V,N,2,K]: (ya+1,xa),(ya+1,xa+1)
    return jnp.concatenate([top, bot], axis=2)    # tap order matches _anchored_taps


# Tests flip this to exercise the grouped Pallas sampler in interpret
# mode on CPU (the real kernel only lowers on TPU backends).
FORCE_GROUPED_INTERPRET = False


def spmd_local_ok() -> bool:
    """True when a Pallas call traced here runs per-device: either the
    program is single-device, or we are inside a shard_map body (mesh
    axis names are bound - every shard runs its own local kernel). Pallas
    custom calls carry no SPMD partitioning rule, so OUTSIDE shard_map a
    >1-device mesh must take the XLA paths; INSIDE one they are safe
    (vsta_tpu.parallel.warp_shard gives the flagship warp that home)."""
    if jax.device_count() == 1:
        return True
    for axis in ("data", "view"):
        try:
            jax.lax.axis_index(axis)  # raises when the axis is unbound
            return True
        except Exception:
            continue
    return False


def _grouped_dispatch(feats_vpbc):
    """(use_pallas, interpret) for the grouped sampler: TPU backend (or
    forced interpret mode), per-device-local tracing context, and one
    group's map fits the VMEM budget."""
    if not FORCE_GROUPED_INTERPRET:
        if jax.default_backend() != "tpu":
            return False, False
        if not spmd_local_ok():
            return False, False
    from .warp_pallas import GROUPED_BUDGET_BYTES, GRWIN

    _, P, K = feats_vpbc.shape
    p_res = ((P + 7) // 8) * 8 + GRWIN
    k_pad = ((K + 127) // 128) * 128
    if p_res * k_pad * feats_vpbc.dtype.itemsize > GROUPED_BUDGET_BYTES:
        return False, False
    return True, FORCE_GROUPED_INTERPRET


def _warp_pairs_shared_impl(feats_vpbc, anchors, wts, feat_hw):
    use, interp = _grouped_dispatch(feats_vpbc)
    if use:
        # windowed scatter-matmul sampler: XLA's per-index gather costs
        # ~15 ns/index on TPU (70 ms at flagship deform shapes); the
        # Pallas kernel keeps each group's map VMEM-resident and rides
        # the MXU instead
        from .warp_pallas import sample_tiles_grouped

        idx4 = _flat_taps(anchors, feat_hw[1] + 1)
        return sample_tiles_grouped(
            feats_vpbc, idx4, wts.astype(jnp.float32),
            compute_dtype=feats_vpbc.dtype, interpret=interp,
        )
    taps = _gather_taps(feats_vpbc, anchors, feat_hw)
    return jnp.einsum("vnk,vnkc->vnc", wts.astype(taps.dtype), taps)


def _warp_pairs_shared_fwd(feats_vpbc, anchors, wts, feat_hw):
    out = _warp_pairs_shared_impl(feats_vpbc, anchors, wts, feat_hw)
    return out, (feats_vpbc, anchors, wts)


def _warp_pairs_shared_bwd(feat_hw, res, g):
    # the warp output dtype equals the feats dtype, so g.dtype is the
    # right cotangent dtype for dfeats
    feats_vpbc, anchors, wts = res
    p_pad = feats_vpbc.shape[1]
    fdtype = g.dtype
    # g's dtype IS the compute dtype (feats were cast before the warp):
    # bf16 under AMP, f32 otherwise - keep the kernel matmuls at the same
    # precision instead of a silent bf16 floor (ADVICE round 1)
    kdtype = jnp.bfloat16 if fdtype == jnp.bfloat16 else jnp.float32
    Wp = feat_hw[1] + 1
    idx4 = _flat_taps(anchors, Wp)
    use, interp = _grouped_dispatch(feats_vpbc)
    dfeats = d_wts = None
    if use:
        # fused backward: one kernel pass shares the span walk, the tap
        # masks, and the cotangent DMA between the dfeats scatter and the
        # d_wts tap dots (None when the per-group blocks exceed VMEM)
        from .warp_pallas import scatter_tapdot_grouped

        fused = scatter_tapdot_grouped(
            feats_vpbc, g, idx4, wts.astype(jnp.float32),
            compute_dtype=kdtype, interpret=interp,
        )
        if fused is not None:
            dfeats, d_wts = fused
    if dfeats is None:
        if jax.default_backend() == "tpu" and spmd_local_ok():
            from .warp_pallas import scatter_taps_windowed

            dfeats = scatter_taps_windowed(
                g, idx4, wts.astype(jnp.float32), p_pad, compute_dtype=kdtype
            )
        else:
            V, N, _ = idx4.shape
            K = g.shape[-1]
            contrib = wts[..., None].astype(jnp.float32) * g[:, :, None, :].astype(jnp.float32)
            dfeats = jnp.zeros((V, p_pad, K), jnp.float32)
            vix = jnp.arange(V)[:, None, None]
            dfeats = dfeats.at[vix, idx4, :].add(contrib)
        # exact weight gradient (drives learned sampling offsets, e.g.
        # deformable attention): d_wts = <taps, g> per tap
        if use:
            from .warp_pallas import taps_dot_grouped

            d_wts = taps_dot_grouped(
                feats_vpbc, g, idx4, wts.astype(jnp.float32),
                compute_dtype=kdtype, interpret=interp,
            )
        else:
            taps = _gather_taps(feats_vpbc, anchors, feat_hw)
            d_wts = jnp.einsum(
                "vnkc,vnc->vnk", taps.astype(jnp.float32), g.astype(jnp.float32)
            )
    import numpy as _np

    d_anchors = _np.zeros(anchors.shape, dtype=jax.dtypes.float0)
    return dfeats.astype(fdtype), d_anchors, d_wts.astype(wts.dtype)


_warp_pairs_shared.defvjp(_warp_pairs_shared_fwd, _warp_pairs_shared_bwd)


def fused_warp_proj(
    feats: jax.Array,
    coords: jax.Array,
    proj_kernel: jax.Array,
    proj_bias: Optional[jax.Array] = None,
    *,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Warp + ConcatFusion + 1x1-projection, fused: out = sum_v warp(F_v) @ W_v.

    feats:       [B, V, Hf, Wf, C]
    coords:      [B, V, Hb, Wb, 2], or [V, Hb, Wb, 2] for batch-shared
                 cameras (Wildtrack's fixed rig - the dataset emits one
                 calibration for every frame, ref wildtrack_loader.py:288).
    proj_kernel: [V, C, C_out] - the ConcatFusion 1x1-conv kernel reshaped
                 per view (reference model_wrapper.py:69-73).
    proj_bias:   [C_out] or None.
    Returns [B, Hb, Wb, C_out].

    TPU design: XLA gather cost is per-index, so (a) each sample is one
    anchored patch/row-pair gather, not 4 flat taps; (b) with shared
    cameras the batch rides the gathered row (K = B*C channels per
    index); (c) since the warp is linear and commutes with the per-view
    projection, whichever side is narrower (C vs C_out) is the one
    warped - the projection einsum stays on the MXU either way.
    """
    B, V, Hf, Wf, C = feats.shape
    C_out = proj_kernel.shape[-1]
    prec = None if compute_dtype == jnp.bfloat16 else _HI
    shared = coords.ndim == 4

    if shared:
        Hb, Wb = coords.shape[1], coords.shape[2]
        N = Hb * Wb
        anchors, wts = _anchored_taps(coords.reshape(V, N, 2), (Hf, Wf))
        if C_out < C:
            # project first, warp C_out channels
            proj = jnp.einsum(
                "bvhwc,vco->vhwbo",
                feats.astype(compute_dtype),
                proj_kernel.astype(compute_dtype),
                precision=prec,
            )  # [V,Hf,Wf,B,C_out]
            fp = _pad_feat_br(proj.reshape(V, Hf, Wf, B * C_out))
            warped = _warp_pairs_shared(
                fp.reshape(V, (Hf + 1) * (Wf + 1), B * C_out), anchors, wts, (Hf, Wf)
            )  # [V, N, B*C_out]
            out = jnp.sum(warped, axis=0).reshape(N, B, C_out)
        else:
            # warp raw C channels, project after (per-view kernels summed)
            fv = jnp.transpose(feats.astype(compute_dtype), (1, 2, 3, 0, 4))
            fp = _pad_feat_br(fv.reshape(V, Hf, Wf, B * C))
            warped = _warp_pairs_shared(
                fp.reshape(V, (Hf + 1) * (Wf + 1), B * C), anchors, wts, (Hf, Wf)
            ).reshape(V, N, B, C)
            out = jnp.einsum(
                "vnbc,vco->nbo",
                warped,
                proj_kernel.astype(compute_dtype),
                precision=prec,
            )
        out = jnp.transpose(out, (1, 0, 2)).reshape(B, Hb, Wb, C_out)
    else:
        Hb, Wb = coords.shape[2], coords.shape[3]
        proj = jnp.einsum(
            "bvhwc,vco->bvhwo",
            feats.astype(compute_dtype),
            proj_kernel.astype(compute_dtype),
            precision=prec,
        )
        warped = warp_views(proj, coords)  # patch-gather path, [B,V,Hb,Wb,C_out]
        out = jnp.sum(warped, axis=1)

    if proj_bias is not None:
        out = out + proj_bias.astype(out.dtype)
    return out
