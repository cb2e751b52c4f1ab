"""Native C++ image codec (vsta_tpu/native): decode + resize + normalize
parity against the PIL fallback path."""

import numpy as np
import pytest
from PIL import Image

from vsta_tpu import native
from vsta_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD, transform_pil

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native codec not built (no toolchain?)"
)


@pytest.fixture(scope="module")
def sample_images(tmp_path_factory):
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(96, 128, 3), dtype=np.uint8)
    # add smooth structure so resize filtering differences show up
    yy, xx = np.mgrid[0:96, 0:128]
    arr[..., 0] = ((xx * 2) % 256).astype(np.uint8)
    d = tmp_path_factory.mktemp("imgs")
    png = str(d / "a.png")
    jpg = str(d / "a.jpg")
    Image.fromarray(arr).save(png)
    Image.fromarray(arr).save(jpg, quality=95)
    return arr, png, jpg


def test_image_size(sample_images):
    arr, png, jpg = sample_images
    assert native.image_size(png) == (96, 128)
    assert native.image_size(jpg) == (96, 128)


def test_png_decode_exact(sample_images):
    arr, png, _ = sample_images
    out = native.decode_resize_u8(png, (96, 128))  # same size: no resampling
    np.testing.assert_array_equal(out, arr)


def test_jpeg_decode_close(sample_images):
    arr, _, jpg = sample_images
    out = native.decode_resize_u8(jpg, (96, 128))
    ref = np.asarray(Image.open(jpg).convert("RGB"))
    # same decoder family; allow tiny IDCT implementation differences
    assert np.mean(np.abs(out.astype(int) - ref.astype(int))) < 2.0


def test_resize_matches_pil(sample_images):
    arr, png, _ = sample_images
    out = native.decode_resize_u8(png, (48, 64))  # 2x downscale
    ref = np.asarray(Image.fromarray(arr).resize((64, 48), Image.BILINEAR))
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert np.mean(diff) < 0.51  # sub-level mean agreement
    assert np.max(diff) <= 2

    out_up = native.decode_resize_u8(png, (192, 256))  # 2x upscale
    ref_up = np.asarray(Image.fromarray(arr).resize((256, 192), Image.BILINEAR))
    diff_up = np.abs(out_up.astype(int) - ref_up.astype(int))
    assert np.mean(diff_up) < 0.51
    assert np.max(diff_up) <= 2


def test_fused_normalize(sample_images):
    arr, png, _ = sample_images
    out = native.decode_resize_norm(png, (48, 64), IMAGENET_MEAN, IMAGENET_STD)
    u8 = native.decode_resize_u8(png, (48, 64))
    ref = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_load_and_transform_uses_native(sample_images, tmp_path):
    """End-to-end eval path equals the PIL reference within resize tolerance."""
    from vsta_tpu.data.transforms import load_and_transform

    arr, png, _ = sample_images
    out = load_and_transform(png, (48, 64), train=False)
    ref = transform_pil(Image.fromarray(arr), (48, 64), train=False)
    assert out.shape == ref.shape == (48, 64, 3)
    # 2 uint8 levels of resize tolerance, in normalized units
    tol = 2.0 / 255.0 / float(np.min(IMAGENET_STD))
    assert float(np.max(np.abs(out - ref))) <= tol
