import numpy as np

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
