import numpy as np

from vsta_tpu.training.metrics import DetectionMetrics, greedy_match


def test_greedy_match_basic():
    preds = np.array([[0.0, 0.0], [5.0, 5.0], [0.1, 0.0]])
    gts = np.array([[0.05, 0.0], [5.2, 5.0]])
    tp, fp, fn, dists = greedy_match(preds, gts, match_dist=0.5)
    # pred0 matches gt0; pred1 matches gt1; pred2's nearest gt0 is used -> FP
    assert (tp, fp, fn) == (2, 1, 0)
    assert len(dists) == 2


def test_greedy_match_no_gt():
    tp, fp, fn, _ = greedy_match(np.array([[1.0, 1.0]]), np.zeros((0, 2)), 0.5)
    assert (tp, fp, fn) == (0, 1, 0)


def test_metrics_summary_perfect():
    m = DetectionMetrics(match_dist=0.5)
    gts = np.array([[0.0, 0.0], [3.0, 3.0]])
    m.update(gts.copy(), gts)
    s = m.summary()
    assert s["precision"] == 1.0 and s["recall"] == 1.0 and s["f1"] == 1.0
    assert s["moda"] == 1.0
    assert s["modp"] == 1.0  # zero distance
    assert s["mle"] == 0.0


def test_metrics_moda_counts_fp_and_fn():
    m = DetectionMetrics(match_dist=0.5)
    gts = np.array([[0.0, 0.0], [3.0, 3.0]])
    preds = np.array([[0.1, 0.0], [10.0, 10.0]])  # 1 TP, 1 FP, 1 FN
    m.update(preds, gts)
    s = m.summary()
    assert s["tp"] == 1 and s["fp"] == 1 and s["fn"] == 1
    assert np.isclose(s["moda"], 1.0 - 2.0 / 2.0)


def test_empty_frames_do_not_inflate_score():
    """The reference counted empty frames as P=R=F1=1 (its logged bug);
    we exclude them from frame averages and they leave totals at zero."""
    m = DetectionMetrics(match_dist=0.5)
    for _ in range(10):
        m.update(np.zeros((0, 2)), np.zeros((0, 2)))
    s = m.summary()
    assert s["f1"] == 0.0
    assert "frame_f1" not in s  # no scorable frames


def test_update_batch_uses_masks():
    m = DetectionMetrics(match_dist=0.5)
    boxes = np.zeros((2, 4, 4))
    boxes[0, 0, :2] = [1.0, 1.0]
    scores = np.zeros((2, 4))
    valid = np.zeros((2, 4), bool)
    valid[0, 0] = True
    gt = np.zeros((2, 8, 4))
    gt[0, 0, :2] = [1.0, 1.0]
    counts = np.array([1, 5])
    mask = np.array([True, False])  # second sample is batch padding
    m.update_batch(boxes, scores, valid, gt, counts, mask)
    s = m.summary()
    assert s["tp"] == 1 and s["fp"] == 0 and s["fn"] == 0


def test_summary_zero_frames_is_flagged_nan():
    """An accumulator that never saw a frame reports NaN + n_frames=0,
    not a perfect score (VERDICT round 2, weak #5)."""
    m = DetectionMetrics(match_dist=0.5)
    s = m.summary()
    assert s["n_frames"] == 0.0
    assert np.isnan(s["f1"]) and np.isnan(s["moda"])
