"""ByteTrack core: differential test vs an independent NumPy oracle.

The oracle below implements the official BYTETracker.update semantics
(high/low score split, joint tracked+lost first association with score
fusion, low-score second association for leftover tracked tracks,
unconfirmed third stage, det_thresh new-track gate, max_time_lost pruning,
tracked/lost duplicate suppression) in plain float32 NumPy + scipy —
sharing no code with the JAX core. Randomized multi-frame scenes with
score dips (the low-score path is the point of ByteTrack) must produce
identical track ids, lifecycle sets, and near-identical boxes per frame.
"""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from aicamera_tpu.core.bytetrack import (ByteTrackParams, ByteTrackState,
                                         LOST, TRACKED, get_outputs,
                                         init_state, make_detections, step)

P = ByteTrackParams(max_tracks=32, max_detections=16, max_time_lost=8)

WP, WV = 1.0 / 20, 1.0 / 160


# --- independent float32 NumPy Kalman filter ---------------------------------

def kf_initiate(m):
    mean = np.concatenate([m, np.zeros(4, np.float32)]).astype(np.float32)
    h = m[3]
    std = np.array([2*WP*h, 2*WP*h, 1e-2, 2*WP*h,
                    10*WV*h, 10*WV*h, 1e-5, 10*WV*h], np.float32)
    return mean, np.diag(std * std).astype(np.float32)


def _motion():
    f = np.eye(8, dtype=np.float32)
    f[np.arange(4), np.arange(4) + 4] = 1.0
    return f


def kf_predict(mean, cov):
    f = _motion()
    h = mean[3]
    std = np.array([WP*h, WP*h, 1e-2, WP*h, WV*h, WV*h, 1e-5, WV*h],
                   np.float32)
    return (f @ mean).astype(np.float32), \
        (f @ cov @ f.T + np.diag(std * std)).astype(np.float32)


def kf_update(mean, cov, meas):
    hm = np.eye(4, 8, dtype=np.float32)
    h = mean[3]
    std = np.array([WP*h, WP*h, 1e-1, WP*h], np.float32)
    s = hm @ cov @ hm.T + np.diag(std * std)
    k = cov @ hm.T @ np.linalg.inv(s)
    innov = meas - hm @ mean
    new_mean = (mean + k @ innov).astype(np.float32)
    new_cov = (cov - k @ s @ k.T).astype(np.float32)
    return new_mean, new_cov


def np_iou_cost(a_tlwh, b_tlwh):
    """1 - IoU with the 1e-7 union floor, float32 (matches costs.py)."""
    a = np.asarray(a_tlwh, np.float32).reshape(-1, 4)
    b = np.asarray(b_tlwh, np.float32).reshape(-1, 4)
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, :2] + a[:, None, 2:],
                    b[None, :, :2] + b[None, :, 2:])
    wh = np.maximum(0.0, br - tl)
    inter = wh[..., 0] * wh[..., 1]
    union = (a[:, 2] * a[:, 3])[:, None] + (b[:, 2] * b[:, 3])[None, :] \
        - inter
    return (1.0 - inter / np.maximum(union, 1e-7)).astype(np.float32)


def mean_to_tlwh(mean):
    cx, cy, a, h = mean[:4]
    w = a * h if h > 0 else 0.0
    h = max(h, 0.0)
    return np.array([cx - w / 2, cy - h / 2, w, h], np.float32)


def min_cost(cost, max_dist):
    """scipy Hungarian with the solver's clamp + post-check semantics.

    Returns (matches [(r, c)], unmatched_rows, unmatched_cols).
    """
    nr, nc = cost.shape
    if nr == 0 or nc == 0:
        return [], list(range(nr)), list(range(nc))
    sub = cost.copy()
    sub[sub > max_dist] = max_dist + 1e-5
    ri, ci = linear_sum_assignment(sub)
    matches, ur, uc = [], list(range(nr)), list(range(nc))
    for r, c in zip(ri, ci):
        if cost[r, c] <= max_dist:
            matches.append((r, c))
            ur.remove(r)
            uc.remove(c)
    return matches, ur, uc


# --- oracle ------------------------------------------------------------------

class NpByteTracker:
    def __init__(self, p: ByteTrackParams):
        self.p = p
        self.tracks = []
        self.frame_id = 0
        self.next_id = 1

    def _tlwhs(self, tracks):
        if not tracks:
            return np.zeros((0, 4), np.float32)
        return np.stack([mean_to_tlwh(t["mean"]) for t in tracks])

    def _apply(self, t, tlwh, score, cls):
        x, y, w, h = tlwh
        xyah = np.array([x + w / 2, y + h / 2,
                         (w / h if h else 0.0), h], np.float32)
        t["mean"], t["cov"] = kf_update(t["mean"], t["cov"], xyah)
        t["state"] = TRACKED
        t["is_activated"] = True
        t["tsu"] = 0
        t["score"] = score
        t["cls"] = cls

    def update(self, tlwhs, scores, clss):
        p = self.p
        self.frame_id += 1
        fid = self.frame_id

        pool = [t for t in self.tracks if t["is_activated"]]
        unconfirmed = [t for t in self.tracks if not t["is_activated"]]
        for t in pool:
            if t["state"] != TRACKED:
                t["mean"][7] = 0.0
            t["mean"], t["cov"] = kf_predict(t["mean"], t["cov"])
        for t in self.tracks:
            t["tsu"] += 1

        hi = [j for j in range(len(scores)) if scores[j] > p.track_thresh]
        lo = [j for j in range(len(scores))
              if p.low_thresh < scores[j] < p.track_thresh]

        # stage 1: pool vs high (score-fused IoU)
        cost = np_iou_cost(self._tlwhs(pool), tlwhs[hi])
        if p.fuse_score:
            cost = 1.0 - (1.0 - cost) * np.asarray(
                scores, np.float32)[hi][None, :]
        m1, ur1, uc1 = min_cost(cost, p.match_thresh)
        for r, c in m1:
            self._apply(pool[r], tlwhs[hi[c]], scores[hi[c]], clss[hi[c]])
        u_high = [hi[c] for c in uc1]

        # stage 2: leftover *tracked* tracks vs low-score detections
        r_tracked = [pool[r] for r in ur1 if pool[r]["state"] == TRACKED]
        cost = np_iou_cost(self._tlwhs(r_tracked), tlwhs[lo])
        m2, ur2, _ = min_cost(cost, p.second_match_thresh)
        for r, c in m2:
            self._apply(r_tracked[r], tlwhs[lo[c]], scores[lo[c]],
                        clss[lo[c]])
        for r in ur2:
            r_tracked[r]["state"] = LOST

        # stage 3: unconfirmed vs leftover high
        cost = np_iou_cost(self._tlwhs(unconfirmed), tlwhs[u_high])
        if p.fuse_score:
            cost = 1.0 - (1.0 - cost) * np.asarray(
                scores, np.float32)[u_high][None, :]
        m3, ur3, uc3 = min_cost(cost, p.unconfirmed_match_thresh)
        for r, c in m3:
            self._apply(unconfirmed[r], tlwhs[u_high[c]],
                        scores[u_high[c]], clss[u_high[c]])
        for r in ur3:
            unconfirmed[r]["dead"] = True

        # new tracks
        for c in uc3:
            j = u_high[c]
            if scores[j] < p.new_track_thresh:
                continue
            x, y, w, h = tlwhs[j]
            xyah = np.array([x + w / 2, y + h / 2,
                             (w / h if h else 0.0), h], np.float32)
            mean, cov = kf_initiate(xyah)
            self.tracks.append(dict(
                mean=mean, cov=cov, state=TRACKED,
                is_activated=(fid == 1), tsu=0, start_frame=fid,
                id=self.next_id, cls=clss[j], score=scores[j]))
            self.next_id += 1

        # prune stale lost + dead unconfirmed
        for t in self.tracks:
            if t["state"] == LOST and t["tsu"] > p.max_time_lost:
                t["dead"] = True
        self.tracks = [t for t in self.tracks if not t.get("dead")]

        # duplicate suppression (tracked vs lost, IoU cost < 0.15)
        a = [t for t in self.tracks if t["state"] == TRACKED]
        b = [t for t in self.tracks if t["state"] == LOST]
        d = np_iou_cost(self._tlwhs(a), self._tlwhs(b))
        dup = set()
        for i, j in zip(*np.where(d < p.dup_iou_cost)):
            life_a = (fid - a[i]["tsu"]) - a[i]["start_frame"]
            life_b = (fid - b[j]["tsu"]) - b[j]["start_frame"]
            if life_a > life_b:
                dup.add(id(b[j]))
            else:
                dup.add(id(a[i]))
        self.tracks = [t for t in self.tracks if id(t) not in dup]

    def outputs(self):
        out = []
        for t in self.tracks:
            if (t["state"] == TRACKED and t["is_activated"]
                    and t["tsu"] == 0):
                b = mean_to_tlwh(t["mean"])
                out.append((t["id"], b[0], b[1], max(b[2], 0), max(b[3], 0)))
        return sorted(out)

    def lost_ids(self):
        return sorted(t["id"] for t in self.tracks if t["state"] == LOST)


# --- scene generator ----------------------------------------------------------

def random_frames(seed, n_frames=25):
    """Objects with linear motion whose scores dip below track_thresh
    (exercising the low-score second stage) and occasionally vanish
    (exercising lost/revive)."""
    rng = np.random.RandomState(seed)
    objs = []
    frames = []
    for t in range(n_frames):
        if rng.rand() < 0.5 and len(objs) < 6:
            objs.append(dict(
                pos=rng.uniform(100, 500, 2).astype(np.float32),
                vel=rng.uniform(-5, 5, 2).astype(np.float32),
                size=rng.uniform(40, 80, 2).astype(np.float32),
                dies=t + rng.randint(5, n_frames + 5)))
        objs = [o for o in objs if o["dies"] > t]
        dets = []
        for o in objs:
            o["pos"] = o["pos"] + o["vel"]
            r = rng.rand()
            if r < 0.12:
                continue  # fully missed
            elif r < 0.35:
                score = rng.uniform(0.15, 0.45)  # low-score (occluded)
            else:
                score = rng.uniform(0.62, 0.95)
            w, h = o["size"]
            tlwh = np.array([o["pos"][0] - w / 2, o["pos"][1] - h / 2, w, h],
                            np.float32)
            dets.append((tlwh, np.float32(score), rng.randint(0, 3)))
        # occasional false positive (random placement, random score)
        if rng.rand() < 0.25:
            w, h = rng.uniform(30, 60, 2)
            x, y = rng.uniform(600, 900, 2)
            dets.append((np.array([x, y, w, h], np.float32),
                         np.float32(rng.uniform(0.2, 0.9)),
                         rng.randint(0, 3)))
        rng.shuffle(dets)
        frames.append(dets)
    return frames


def run_jax(frames, p=P, compare=None):
    s = init_state(p)
    outs = []
    for dets in frames:
        n = len(dets)
        tlwh = np.zeros((max(n, 1), 4), np.float32)
        score = np.zeros((max(n, 1),), np.float32)
        cls = np.zeros((max(n, 1),), np.int32)
        valid = np.zeros((max(n, 1),), bool)
        for j, (b, sc, c) in enumerate(dets):
            tlwh[j], score[j], cls[j], valid[j] = b, sc, c, True
        d = make_detections(tlwh, score, cls, valid=valid, params=p)
        s = step(s, d, p)
        tlbr, ids, c, sc, mask = get_outputs(s)
        m = np.asarray(mask)
        outs.append(sorted(
            (int(i), b[0], b[1], max(b[2] - b[0], 0), max(b[3] - b[1], 0))
            for i, b in zip(np.asarray(ids)[m], np.asarray(tlbr)[m])))
        if compare is not None:
            compare(s)
    return outs, s


@pytest.mark.parametrize("seed", range(20))
def test_bytetrack_matches_numpy_oracle(seed):
    frames = random_frames(seed)
    oracle = NpByteTracker(P)
    s = init_state(P)

    for fi, dets in enumerate(frames):
        n = len(dets)
        tlwh = np.zeros((max(n, 1), 4), np.float32)
        score = np.zeros((max(n, 1),), np.float32)
        cls = np.zeros((max(n, 1),), np.int32)
        valid = np.zeros((max(n, 1),), bool)
        for j, (b, sc, c) in enumerate(dets):
            tlwh[j], score[j], cls[j], valid[j] = b, sc, c, True

        oracle.update(tlwh[:n], list(score[:n]), list(cls[:n]))
        d = make_detections(tlwh, score, cls, valid=valid, params=P)
        s = step(s, d, P)

        tlbr, ids, c_, sc_, mask = get_outputs(s)
        m = np.asarray(mask)
        ours = sorted(
            (int(i), b[0], b[1], max(b[2] - b[0], 0), max(b[3] - b[1], 0))
            for i, b in zip(np.asarray(ids)[m], np.asarray(tlbr)[m]))
        ref = oracle.outputs()

        assert [o[0] for o in ours] == [r[0] for r in ref], (
            f"seed {seed} frame {fi}: ids {[o[0] for o in ours]} vs "
            f"{[r[0] for r in ref]}")
        for o, r in zip(ours, ref):
            np.testing.assert_allclose(o[1:], r[1:], rtol=1e-3, atol=0.5,
                                       err_msg=f"seed {seed} frame {fi}")

        # lifecycle: the lost-track id sets must agree too
        st = np.asarray(s.state)
        act = np.asarray(s.active)
        ours_lost = sorted(
            int(i) for i in np.asarray(s.track_id)[act & (st == LOST)])
        assert ours_lost == oracle.lost_ids(), (
            f"seed {seed} frame {fi}: lost {ours_lost} vs "
            f"{oracle.lost_ids()}")


# --- targeted lifecycle tests --------------------------------------------------

def _det(x, y, w=40, h=80, score=0.9, cls=0):
    return (np.array([x, y, w, h], np.float32), np.float32(score), cls)


def test_first_frame_tracks_activate_immediately():
    outs, _ = run_jax([[_det(100, 100)]])
    assert [o[0] for o in outs[0]] == [1]


def test_later_tracks_need_second_match():
    # empty frame 1 so frame 2's new track is unconfirmed
    frames = [[], [_det(100, 100)], [_det(102, 101)], [_det(104, 102)]]
    outs, _ = run_jax(frames)
    assert outs[0] == [] and outs[1] == []       # unconfirmed: no output
    assert [o[0] for o in outs[2]] == [1]        # activated on re-match
    assert [o[0] for o in outs[3]] == [1]


def test_unconfirmed_dies_without_rematch():
    frames = [[], [_det(100, 100)], [], [_det(100, 100)], [_det(101, 100)]]
    outs, s = run_jax(frames)
    assert outs[2] == [] and outs[3] == []
    # the frame-3 re-detection is a NEW track (id 2), activated at frame 5
    assert [o[0] for o in outs[4]] == [2]


def test_low_score_detection_keeps_track_alive():
    """The signature ByteTrack behavior: a score dip below track_thresh
    keeps the identity via the second association stage."""
    frames = [[_det(100, 100)], [_det(103, 101)],
              [_det(106, 102, score=0.3)],       # low-score frame
              [_det(109, 103)]]
    outs, _ = run_jax(frames)
    assert [o[0] for o in outs[2]] == [1]        # still tracked, same id
    assert [o[0] for o in outs[3]] == [1]


def test_low_score_never_starts_a_track():
    frames = [[_det(100, 100, score=0.45)], [_det(100, 100, score=0.45)]]
    outs, s = run_jax(frames)
    assert outs == [[], []]
    assert not np.asarray(s.active).any()


def test_lost_track_revives_with_same_id():
    frames = [[_det(100, 100)],
              [_det(105, 100)],
              [], [], [],                        # lost for 3 frames
              [_det(130, 100)]]                  # reappears ahead
    outs, _ = run_jax(frames)
    assert [o[0] for o in outs[5]] == [1]


def test_lost_track_pruned_after_max_time_lost():
    p = ByteTrackParams(max_tracks=32, max_detections=16, max_time_lost=2)
    frames = [[_det(100, 100)], [_det(101, 100)],
              [], [], [],                        # tsu exceeds 2
              [_det(103, 100)]]
    outs, s = run_jax(frames, p=p)
    # reappearance is a brand-new track (id 2), unconfirmed at first
    assert outs[5] == []
    assert np.asarray(s.track_id)[np.asarray(s.active)].tolist() == [2]


def test_det_thresh_gates_new_tracks():
    # score above track_thresh but below new_track_thresh (0.6): matched
    # against existing tracks in stage 1, but never starts a track
    frames = [[_det(100, 100, score=0.55)], [_det(100, 100, score=0.55)]]
    outs, s = run_jax(frames)
    assert not np.asarray(s.active).any()


def test_score_equal_track_thresh_in_neither_band():
    # official split: high is s > thresh, low is s < thresh (strict)
    frames = [[_det(100, 100)], [_det(102, 100, score=0.5)],
              [_det(104, 100)]]
    outs, s = run_jax(frames)
    assert outs[1] == []                         # not matched by either pass
    assert [o[0] for o in outs[2]] == [1]        # revived from lost


def test_duplicate_tracked_lost_suppression():
    p = ByteTrackParams(max_tracks=32, max_detections=16, max_time_lost=10)
    oracle = NpByteTracker(p)
    # an old track goes lost, then a new detection appears on top of its
    # predicted position and becomes tracked -> duplicate pair
    frames = [[_det(100, 100)], [_det(100, 100)], [_det(100, 100)],
              [], [],
              [_det(100, 100, score=0.95)], [_det(100, 100, score=0.95)]]
    for dets in frames:
        tlwh = np.stack([d[0] for d in dets]) if dets else \
            np.zeros((0, 4), np.float32)
        sc = [d[1] for d in dets]
        cl = [d[2] for d in dets]
        oracle.update(tlwh, sc, cl)
    outs, s = run_jax(frames, p=p)
    act = np.asarray(s.active)
    ours_ids = sorted(np.asarray(s.track_id)[act].tolist())
    ref_ids = sorted(t["id"] for t in oracle.tracks)
    assert ours_ids == ref_ids


def test_capacity_overflow_counts_dropped():
    p = ByteTrackParams(max_tracks=4, max_detections=16)
    frames = [[_det(100 + 120 * i, 100) for i in range(8)]]
    outs, s = run_jax(frames, p=p)
    assert int(np.asarray(s.dropped)) == 4
    assert np.asarray(s.active).sum() == 4


def _dedup_state(start_a, start_b, tsu_b=2):
    """Hand-built state: slot0 TRACKED at x=100, slot1 LOST at x=101
    (overlapping, IoU cost ~0.05)."""
    import jax.numpy as jnp
    p = P
    s = init_state(p)
    mean = np.zeros((p.max_tracks, 8), np.float32)
    mean[0, :4] = [100.0, 100.0, 0.5, 80.0]
    mean[1, :4] = [101.0, 100.0, 0.5, 80.0]
    cov = np.tile((np.eye(8) * 0.01).astype(np.float32),
                  (p.max_tracks, 1, 1))
    active = np.zeros(p.max_tracks, bool)
    active[:2] = True
    st = np.zeros(p.max_tracks, np.int32)
    st[0], st[1] = TRACKED, LOST
    is_act = np.zeros(p.max_tracks, bool)
    is_act[:2] = True
    tsu = np.zeros(p.max_tracks, np.int32)
    tsu[1] = tsu_b
    start = np.zeros(p.max_tracks, np.int32)
    start[0], start[1] = start_a, start_b
    tid = np.zeros(p.max_tracks, np.int32)
    tid[0], tid[1] = 1, 2
    return s.replace(
        active=jnp.asarray(active), state=jnp.asarray(st),
        is_activated=jnp.asarray(is_act), mean=jnp.asarray(mean),
        cov=jnp.asarray(cov), tsu=jnp.asarray(tsu),
        start_frame=jnp.asarray(start), track_id=jnp.asarray(tid),
        frame_id=jnp.asarray(10, jnp.int32), next_id=jnp.asarray(3, jnp.int32))


def test_dedup_drops_shorter_lived_lost_twin():
    # A (tracked, long-lived since frame 1) matches the one high det;
    # B (lost, born frame 8) overlaps A's box -> duplicate, B dropped.
    s = _dedup_state(start_a=1, start_b=8)
    d = make_detections(np.array([[80.0, 60.0, 40.0, 80.0]], np.float32),
                        np.array([0.9], np.float32), np.array([0]), params=P)
    s2 = step(s, d, P)
    act = np.asarray(s2.active)
    assert np.asarray(s2.track_id)[act].tolist() == [1]


def test_dedup_tie_drops_the_tracked_twin():
    # equal lifetimes: official `timep > timeq` is False on ties, so the
    # TRACKED twin is the one removed (quirky but faithful).
    # life_a = (11 - 0) - 7 = 4; life_b = (11 - 3) - 4 = 4.
    s = _dedup_state(start_a=7, start_b=4, tsu_b=2)
    d = make_detections(np.array([[80.0, 60.0, 40.0, 80.0]], np.float32),
                        np.array([0.9], np.float32), np.array([0]), params=P)
    s2 = step(s, d, P)
    act = np.asarray(s2.active)
    assert np.asarray(s2.track_id)[act].tolist() == [2]
