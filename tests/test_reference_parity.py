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
