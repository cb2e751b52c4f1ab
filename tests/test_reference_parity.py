"""Model-level fp parity vs the ACTUAL torch reference (BASELINE.md gate).

Instantiates the reference BEVNet (/root/reference/project/models/
model_wrapper.py:13-103) on CPU - torch is installed; timm/kornia are
not, so the reference runs its fallback conv encoder
(cnn_encoder.py:31-37) and grid_sample warp (geometry.py:142-162), which
are exactly the paths this framework mirrors. Its randomly-initialized
weights are converted into vsta_tpu.BEVNet via
models/reference_import.py, both models run on identical synthetic
images + calibrations, and `bev_feat` / `heatmap` must agree to fp
tolerance end to end.

Known divergences already neutralized here:
  * intrinsics rescale: both models receive K already consistent with
    the working image size (the data-layer fix is tested elsewhere);
  * padding/eps: our convs use torch-exact symmetric padding and
    GroupNorm epsilon 1e-5.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE_PATH = os.environ.get("VSTA_REFERENCE", "/root/reference/project")

torch = pytest.importorskip("torch")

if not os.path.isdir(REFERENCE_PATH):  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

sys.path.insert(0, REFERENCE_PATH)

from models.model_wrapper import BEVNet as RefBEVNet  # noqa: E402

from vsta_tpu.models import BEVNet  # noqa: E402
from vsta_tpu.models.reference_import import load_reference_weights  # noqa: E402

B, V = 2, 4
H, W = 108, 192
FEAT_DIM = 24
BEV_H, BEV_W = 24, 64
BOUNDS = (-12.0, 12.0, -6.0, 6.0)
PROJ_CH = 32


def _ref_cfg():
    return {
        "MODEL": {
            "BACKBONE": "resnet18",  # timm absent -> fallback conv stack
            "PRETRAINED": False,
            "FEAT_DIM": FEAT_DIM,
            "OUT_INDEX": 2,
            "BEV_SIZE": [32, BEV_H, BEV_W],
            "BEV_BOUNDS": list(BOUNDS),
            "BEV_PROJ_CH": PROJ_CH,
        },
        "EVAL": {"CONF_THRESH": 0.4, "NMS_DIST_M": 0.5},
        "LOSS": {"DEFAULT_BOX_WH": [0.6, 0.6], "MAX_OBJECTS": 16},
    }


@pytest.fixture(scope="module")
def parity_pair(cameras_module):
    """(reference outputs, our outputs) on identical inputs + weights."""
    Ks, Rts = cameras_module
    rng = np.random.default_rng(7)
    images = rng.standard_normal((B, V, 3, H, W)).astype(np.float32)

    torch.manual_seed(0)
    ref = RefBEVNet(_ref_cfg())
    ref.eval()
    batch = {
        "images": torch.from_numpy(images),
        "calib": {
            "intrinsic": [
                [torch.tensor(Ks[v], dtype=torch.float32) for v in range(V)]
                for _ in range(B)
            ],
            "extrinsic": [
                [torch.tensor(Rts[v], dtype=torch.float32) for v in range(V)]
                for _ in range(B)
            ],
        },
    }
    with torch.no_grad():
        ref_out = ref(batch)  # also builds the lazy proj + detector
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    assert ref._modules["encoder"]._use_timm is False, (
        "test assumes the reference's fallback encoder (timm absent)"
    )

    model = BEVNet(
        backbone="simple",
        feat_dim=FEAT_DIM,
        out_index=2,
        views=V,
        bev_size=(BEV_H, BEV_W),
        bev_bounds=BOUNDS,
        bev_proj_ch=PROJ_CH,
        warp_impl="fused",
        fusion="concat",
        static_cameras=True,
        dtype=jnp.float32,
    )
    imgs_j = jnp.asarray(np.transpose(images, (0, 1, 3, 4, 2)))  # NCHW->NHWC
    K = jnp.broadcast_to(jnp.asarray(np.stack(Ks[:V]), jnp.float32)[None], (B, V, 3, 3))
    Rt = jnp.broadcast_to(jnp.asarray(np.stack(Rts[:V]), jnp.float32)[None], (B, V, 4, 4))
    variables = model.init(jax.random.PRNGKey(0), imgs_j, K, Rt, train=False)
    variables, n_loaded = load_reference_weights(variables, sd, views=V, feat_dim=FEAT_DIM)
    assert n_loaded >= 20, f"converter only mapped {n_loaded} tensors"
    out = model.apply(variables, imgs_j, K, Rt, train=False)
    return ref_out, out


@pytest.fixture(scope="module")
def cameras_module():
    from conftest import make_camera

    Ks, Rts = [], []
    for v in range(V):
        K, Rt = make_camera(v, n_views=V, img_hw=(H, W))
        Ks.append(K)
        Rts.append(Rt)
    return np.stack(Ks), np.stack(Rts)


def _nchw(a):
    return np.transpose(np.asarray(a), (0, 3, 1, 2))


def test_bev_feat_parity(parity_pair):
    """Fused BEV features match the reference to fp tolerance
    (BASELINE.md: 'fp-tolerance parity on fused BEV features')."""
    ref_out, out = parity_pair
    ref_feat = ref_out["bev_feat"].numpy()  # [B, P+2, Hb, Wb]
    got = _nchw(out["bev_feat"])
    scale = np.abs(ref_feat).max() + 1e-6
    np.testing.assert_allclose(got / scale, ref_feat / scale, atol=2e-5)


def test_heatmap_parity(parity_pair):
    """Detection heatmaps match the reference to fp tolerance."""
    ref_out, out = parity_pair
    ref_hm = ref_out["heatmap"].numpy()  # [B, 1, Hb, Wb]
    got = _nchw(out["heatmap"][..., None] if out["heatmap"].ndim == 3 else out["heatmap"])
    np.testing.assert_allclose(got, ref_hm, atol=1e-4)


def test_offset_size_parity(parity_pair):
    ref_out, out = parity_pair
    np.testing.assert_allclose(
        _nchw(out["offset"]), ref_out["offset"].numpy(), atol=1e-4
    )
    ref_size = ref_out["size"].numpy()
    scale = np.abs(ref_size).max() + 1e-6
    np.testing.assert_allclose(
        _nchw(out["size"]) / scale, ref_size / scale, atol=1e-4
    )


# ---------------------------------------------------------------------------
# trained-checkpoint migration (VERDICT r3 item 3): the converter must
# round-trip a checkpoint the reference actually TRAINED and SAVED, not
# just random init - torch.save/{'state_dict': ...}/torch.load is the
# exact surface a migrating user hands us (ref inference.py:29-31,
# train.py:338).
# ---------------------------------------------------------------------------

CONF = 0.05  # low threshold so a 20-step model still yields detections


@pytest.fixture(scope="module")
def trained_parity_pair(cameras_module, tmp_path_factory):
    """Train the torch reference ~20 real optimizer steps (its own
    focal/L1 loss, Adam), save/reload its checkpoint format, convert,
    and run both models eval-mode on held-out inputs."""
    Ks, Rts = cameras_module
    rng = np.random.default_rng(11)
    train_images = rng.standard_normal((B, V, 3, H, W)).astype(np.float32)
    eval_images = rng.standard_normal((B, V, 3, H, W)).astype(np.float32)

    cfg = _ref_cfg()
    cfg["EVAL"]["CONF_THRESH"] = CONF
    torch.manual_seed(1)
    ref = RefBEVNet(cfg)

    def make_batch(imgs):
        return {
            "images": torch.from_numpy(imgs),
            "calib": {
                "intrinsic": [
                    [torch.tensor(Ks[v], dtype=torch.float32) for v in range(V)]
                    for _ in range(B)
                ],
                "extrinsic": [
                    [torch.tensor(Rts[v], dtype=torch.float32) for v in range(V)]
                    for _ in range(B)
                ],
            },
        }

    # real training targets: two people per sample at fixed world spots
    targets = [
        {
            "boxes_world": torch.tensor(
                [[-2.0 + b, 1.0, 0.6, 0.6], [3.0, -1.5 + b, 0.6, 0.6]],
                dtype=torch.float32,
            )
        }
        for b in range(B)
    ]
    ref.train()
    batch = make_batch(train_images)
    ref(batch)  # lazy-builds proj + detector so the optimizer sees them
    opt = torch.optim.Adam(ref.parameters(), lr=1e-3)
    for _ in range(20):
        opt.zero_grad(set_to_none=True)
        preds = ref(batch)
        loss = ref.loss(preds, targets, cfg["LOSS"])["total_loss"]
        loss.backward()
        opt.step()

    # the reference's exact checkpoint surface (train.py:338)
    ckpt_path = tmp_path_factory.mktemp("refckpt") / "best.pth"
    torch.save(
        {"epoch": 20, "state_dict": ref.state_dict(), "f1": 0.0}, ckpt_path
    )
    loaded = torch.load(ckpt_path, map_location="cpu")
    ref2 = RefBEVNet(cfg)
    ref2(make_batch(eval_images))  # lazy-build before load_state_dict
    ref2.load_state_dict(loaded["state_dict"], strict=False)
    ref2.eval()
    with torch.no_grad():
        ref_out = ref2(make_batch(eval_images))
    sd = {k: v.numpy() for k, v in loaded["state_dict"].items()}

    model = BEVNet(
        backbone="simple",
        feat_dim=FEAT_DIM,
        out_index=2,
        views=V,
        bev_size=(BEV_H, BEV_W),
        bev_bounds=BOUNDS,
        bev_proj_ch=PROJ_CH,
        warp_impl="fused",
        fusion="concat",
        static_cameras=True,
        dtype=jnp.float32,
    )
    imgs_j = jnp.asarray(np.transpose(eval_images, (0, 1, 3, 4, 2)))
    K = jnp.broadcast_to(jnp.asarray(np.stack(Ks[:V]), jnp.float32)[None], (B, V, 3, 3))
    Rt = jnp.broadcast_to(jnp.asarray(np.stack(Rts[:V]), jnp.float32)[None], (B, V, 4, 4))
    variables = model.init(jax.random.PRNGKey(0), imgs_j, K, Rt, train=False)
    variables, n_loaded = load_reference_weights(
        variables, sd, views=V, feat_dim=FEAT_DIM
    )
    assert n_loaded >= 20, f"converter only mapped {n_loaded} trained tensors"
    out = model.apply(variables, imgs_j, K, Rt, train=False)
    return ref_out, out


def test_trained_heatmap_parity(trained_parity_pair):
    """20 trained steps later, converted heads still match end to end -
    a converter that mishandles ANY trained-weight key fails here."""
    ref_out, out = trained_parity_pair
    ref_hm = ref_out["heatmap"].numpy()
    got = _nchw(out["heatmap"][..., None] if out["heatmap"].ndim == 3 else out["heatmap"])
    np.testing.assert_allclose(got, ref_hm, atol=1e-4)
    # trained weights must actually differ from init: a converter that
    # silently skips every key would pass parity on two init models
    assert float(np.abs(ref_hm - 0.1).max()) > 0.05, (
        "heatmap still at CenterNet init prior - did training happen?"
    )


def test_trained_offset_size_parity(trained_parity_pair):
    ref_out, out = trained_parity_pair
    np.testing.assert_allclose(
        _nchw(out["offset"]), ref_out["offset"].numpy(), atol=1e-4
    )
    ref_size = ref_out["size"].numpy()
    scale = np.abs(ref_size).max() + 1e-6
    np.testing.assert_allclose(
        _nchw(out["size"]) / scale, ref_size / scale, atol=1e-4
    )


def test_trained_decode_match(trained_parity_pair):
    """Decoded world-space detections agree frame by frame (count,
    centers, scores) between the migrated model and the reference."""
    from vsta_tpu.ops.decode import decode_detections

    ref_out, out = trained_parity_pair
    dec = decode_detections(
        out["heatmap"][..., None] if out["heatmap"].ndim == 3 else out["heatmap"],
        out["offset"],
        out["size"],
        bounds=BOUNDS,
        conf_thresh=CONF,
        nms_dist_m=0.5,
        max_dets=64,
    )
    total = 0
    for b in range(B):
        ref_boxes = ref_out["boxes"][b].numpy()
        ref_scores = ref_out["scores"][b].numpy()
        valid = np.asarray(dec["valid"][b])
        boxes = np.asarray(dec["boxes"][b])[valid]
        scores = np.asarray(dec["scores"][b])[valid]
        assert boxes.shape[0] == ref_boxes.shape[0], (
            f"frame {b}: {boxes.shape[0]} dets vs reference {ref_boxes.shape[0]}"
        )
        # both are score-descending after the same greedy NMS
        order = np.argsort(-ref_scores, kind="stable")
        np.testing.assert_allclose(boxes, ref_boxes[order], atol=1e-3)
        np.testing.assert_allclose(scores, ref_scores[order], atol=1e-3)
        total += boxes.shape[0]
    assert total > 0, "no detections decoded - the comparison is vacuous"
