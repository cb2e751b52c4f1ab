import numpy as np
import jax.numpy as jnp

from vsta_tpu.ops.decode import nms2d, greedy_distance_nms, decode_detections

BOUNDS = (-24.0, 24.0, -7.2, 7.2)


def test_nms2d_keeps_local_maxima():
    hm = np.zeros((1, 8, 8), np.float32)
    hm[0, 2, 2] = 0.9
    hm[0, 2, 3] = 0.5  # adjacent, lower -> suppressed
    hm[0, 6, 6] = 0.7
    out = np.asarray(nms2d(jnp.array(hm)))
    assert out[0, 2, 2] == np.float32(0.9)
    assert out[0, 2, 3] == 0.0
    assert out[0, 6, 6] == np.float32(0.7)


def test_greedy_nms_matches_reference_loop():
    rng = np.random.default_rng(5)
    K = 32
    centers = rng.uniform(-5, 5, (K, 2)).astype(np.float32)
    scores = np.sort(rng.uniform(0, 1, K).astype(np.float32))[::-1].copy()
    valid = scores > 0.3
    thr = 1.0

    keep_ref = []
    for i in range(K):
        if not valid[i]:
            continue
        too_close = any(
            np.linalg.norm(centers[j] - centers[i]) < thr for j in keep_ref
        )
        if not too_close:
            keep_ref.append(i)
    expected = np.zeros(K, bool)
    expected[keep_ref] = True

    got = np.asarray(
        greedy_distance_nms(jnp.array(centers), jnp.array(scores), jnp.array(valid), thr)
    )
    np.testing.assert_array_equal(got, expected)


def test_decode_single_peak_position():
    H, W = 120, 360
    hm = np.zeros((1, H, W, 1), np.float32)
    hm[0, 60, 180, 0] = 0.95
    offset = np.full((1, H, W, 2), 0.5, np.float32)
    size = np.ones((1, H, W, 2), np.float32) * 4.0
    out = decode_detections(
        jnp.array(hm), jnp.array(offset), jnp.array(size),
        bounds=BOUNDS, conf_thresh=0.4, nms_dist_m=0.5, max_dets=16,
    )
    valid = np.asarray(out["valid"])[0]
    assert valid.sum() == 1
    box = np.asarray(out["boxes"])[0, 0]
    res_x, res_y = 48.0 / W, 14.4 / H
    np.testing.assert_allclose(box[0], -24.0 + 180.5 * res_x, atol=1e-5)
    np.testing.assert_allclose(box[1], -7.2 + 60.5 * res_y, atol=1e-5)
    np.testing.assert_allclose(box[2], 4.0 * res_x, atol=1e-5)
    np.testing.assert_allclose(box[3], 4.0 * res_y, atol=1e-5)
    assert np.isclose(np.asarray(out["scores"])[0, 0], 0.95)


def test_decode_suppresses_close_peaks():
    H, W = 120, 360
    hm = np.zeros((1, H, W, 1), np.float32)
    hm[0, 60, 180, 0] = 0.9
    hm[0, 60, 182, 0] = 0.8  # 2 cells = 0.266 m < 0.5 m -> suppressed
    hm[0, 60, 200, 0] = 0.7  # 20 cells = 2.6 m -> kept
    offset = np.zeros((1, H, W, 2), np.float32)
    size = np.ones((1, H, W, 2), np.float32)
    out = decode_detections(
        jnp.array(hm), jnp.array(offset), jnp.array(size),
        bounds=BOUNDS, conf_thresh=0.4, nms_dist_m=0.5, max_dets=16,
    )
    assert np.asarray(out["valid"])[0].sum() == 2
    scores = np.asarray(out["scores"])[0]
    np.testing.assert_allclose(sorted(scores[scores > 0], reverse=True), [0.9, 0.7])


def test_decode_empty_below_threshold():
    hm = np.full((1, 40, 40, 1), 0.1, np.float32)
    out = decode_detections(
        jnp.array(hm), jnp.zeros((1, 40, 40, 2)), jnp.ones((1, 40, 40, 2)),
        bounds=BOUNDS, conf_thresh=0.4, nms_dist_m=0.5, max_dets=8,
    )
    assert np.asarray(out["valid"]).sum() == 0
    np.testing.assert_allclose(np.asarray(out["boxes"]), 0.0)
