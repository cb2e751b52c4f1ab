import numpy as np
import pytest

from vsta_tpu.tracking import SortTracker
from vsta_tpu.tracking.sort import track_sequence


def test_tracks_constant_velocity_target():
    tracker = SortTracker(max_age=3, min_hits=2, match_dist_m=1.0)
    ids = []
    for t in range(10):
        dets = np.array([[0.3 * t, 0.1 * t]])
        out = tracker.update(dets)
        if out:
            ids.append(out[0]["id"])
    assert len(ids) >= 8  # confirmed from frame 2 on
    assert len(set(ids)) == 1  # identity is stable


def test_two_crossing_targets_keep_ids():
    tracker = SortTracker(max_age=3, min_hits=2, match_dist_m=1.0)
    id_history = {0: set(), 1: set()}
    for t in range(20):
        a = np.array([-5.0 + 0.5 * t, 0.3])
        b = np.array([5.0 - 0.5 * t, -0.3])
        out = tracker.update(np.stack([a, b]))
        for trk in out:
            # assign report to nearest ground-truth target
            k = 0 if np.linalg.norm(trk["xy"] - a) < np.linalg.norm(trk["xy"] - b) else 1
            id_history[k].add(trk["id"])
    # each target should be covered by exactly one persistent id
    assert len(id_history[0]) == 1
    assert len(id_history[1]) == 1
    assert id_history[0] != id_history[1]


def test_track_death_after_max_age():
    tracker = SortTracker(max_age=2, min_hits=1, match_dist_m=1.0)
    tracker.update(np.array([[0.0, 0.0]]))
    for _ in range(4):
        tracker.update(np.zeros((0, 2)))
    assert len(tracker.tracks) == 0


def test_missed_frame_bridged_by_kalman():
    tracker = SortTracker(max_age=3, min_hits=1, match_dist_m=1.0)
    seq = []
    for t in range(8):
        if t == 4:
            seq.append(np.zeros((0, 2)))  # one dropout frame
        else:
            seq.append(np.array([[0.4 * t, 0.0]]))
    results = track_sequence(seq, max_age=3, min_hits=1, match_dist_m=1.0)
    ids = {r["id"] for frame in results for r in frame}
    assert len(ids) == 1  # dropout did not split the identity


def test_new_detection_far_away_gets_new_id():
    tracker = SortTracker(max_age=3, min_hits=1, match_dist_m=1.0)
    out1 = tracker.update(np.array([[0.0, 0.0]]))
    out2 = tracker.update(np.array([[0.0, 0.0], [8.0, 8.0]]))
    assert len(out2) == 2
    assert {t["id"] for t in out2} > {t["id"] for t in out1}


# ---- tracking metrics (MOTA/MOTP/IDF1) ----

def test_mot_perfect_tracking():
    from vsta_tpu.tracking.metrics import evaluate_tracking

    gt, hyp = [], []
    for t in range(10):
        xy = np.array([[0.1 * t, 0.0], [5.0, 0.2 * t]])
        gt.append(([1, 2], xy))
        hyp.append(([7, 9], xy.copy()))  # different ids but consistent
    m = evaluate_tracking(gt, hyp, match_dist=0.5)
    assert m["mota"] == 1.0
    assert m["motp"] == 0.0
    assert m["idf1"] == 1.0
    assert m["id_switches"] == 0


def test_mot_id_switch_detected():
    from vsta_tpu.tracking.metrics import evaluate_tracking

    gt, hyp = [], []
    for t in range(10):
        xy = np.array([[0.0, 0.0]])
        gt.append(([1], xy))
        # hypothesis id flips halfway through
        hyp.append(([100 if t < 5 else 200], xy.copy()))
    m = evaluate_tracking(gt, hyp, match_dist=0.5)
    assert m["id_switches"] == 1
    assert m["mota"] == pytest.approx(1.0 - 1 / 10)
    assert 0.4 < m["idf1"] < 0.6  # best single assignment covers half


def test_mot_misses_and_false_positives():
    from vsta_tpu.tracking.metrics import evaluate_tracking

    gt = [([1], np.array([[0.0, 0.0]]))] * 4
    hyp = [
        ([5], np.array([[0.0, 0.0]])),   # match
        ([], np.zeros((0, 2))),          # miss
        ([5, 6], np.array([[0.0, 0.0], [9.0, 9.0]])),  # match + fp
        ([5], np.array([[0.0, 0.0]])),   # match
    ]
    m = evaluate_tracking(gt, hyp, match_dist=0.5)
    assert m["misses"] == 1
    assert m["false_positives"] == 1
    assert m["id_switches"] == 0
    assert m["mota"] == pytest.approx(1.0 - 2 / 4)


def test_sort_plus_metrics_end_to_end():
    """SORT on noisy detections of two crossing walkers scores high."""
    from vsta_tpu.tracking import SortTracker
    from vsta_tpu.tracking.metrics import MotAccumulator

    rng = np.random.default_rng(3)
    tracker = SortTracker(max_age=3, min_hits=1, match_dist_m=1.0)
    acc = MotAccumulator(match_dist=1.0)
    for t in range(30):
        p1 = np.array([-5.0 + 0.3 * t, 0.0])
        p2 = np.array([5.0 - 0.3 * t, 0.5])
        gt_xy = np.stack([p1, p2])
        dets = gt_xy + rng.normal(0, 0.05, gt_xy.shape)
        tracks = tracker.update(dets)
        hyp_ids = [trk["id"] for trk in tracks]
        hyp_xy = np.array([trk["xy"] for trk in tracks]).reshape(-1, 2)
        acc.update([1, 2], gt_xy, hyp_ids, hyp_xy)
    m = acc.summary()
    assert m["mota"] > 0.9
    assert m["idf1"] > 0.9
    assert m["motp"] < 0.2
