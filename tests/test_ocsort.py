"""OC-SORT core: differential test vs an independent NumPy oracle.

The oracle below implements the official OCSort.update semantics — SORT
7-dim Kalman filter with the area-collapse guard, OCM velocity-direction
bonus with the exact-adjacency shortcut, OCR last-observation recovery,
ORU freeze/rollback/virtual-replay, strict ``score > det_thresh`` gate,
hit_streak/min_hits emission, observation-centric output boxes — in plain
float32 NumPy + scipy, sharing no code with the JAX core. Randomized
multi-frame scenes with misses (exercising lost/ORU paths) must produce
identical track ids and near-identical boxes per frame.
"""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from aicamera_tpu.core.ocsort import (OCSortParams, get_outputs, init_state,
                                      make_detections, step)

P = OCSortParams(max_tracks=32, max_detections=16, max_age=8, min_hits=3,
                 delta_t=3)

Q_DIAG = np.array([1, 1, 1, 1, 0.01, 0.01, 0.0001], np.float32)
R_DIAG = np.array([1, 1, 10, 10], np.float32)
P0_DIAG = np.array([10, 10, 10, 10, 1e4, 1e4, 1e4], np.float32)
F7 = np.eye(7, dtype=np.float32)
F7[np.arange(3), np.arange(3) + 4] = 1.0
H7 = np.eye(4, 7, dtype=np.float32)


def xyxy_to_z(b):
    w = b[2] - b[0]
    h = b[3] - b[1]
    return np.array([(b[0] + b[2]) / 2.0, (b[1] + b[3]) / 2.0,
                     w * h, w / max(h, 1e-6)], np.float32)


def x_to_xyxy(x):
    w = np.sqrt(max(x[2] * x[3], 0.0))
    h = x[2] / max(w, 1e-6)
    return np.array([x[0] - w / 2, x[1] - h / 2,
                     x[0] + w / 2, x[1] + h / 2], np.float32)


def kf_init(z):
    x = np.zeros(7, np.float32)
    x[:4] = z
    return x, np.diag(P0_DIAG).astype(np.float32)


def kf_predict(x, p):
    if x[6] + x[2] <= 0:
        x = x.copy()
        x[6] = 0.0
    return (F7 @ x).astype(np.float32), \
        (F7 @ p @ F7.T + np.diag(Q_DIAG)).astype(np.float32)


def kf_update(x, p, z):
    s = H7 @ p @ H7.T + np.diag(R_DIAG)
    k = p @ H7.T @ np.linalg.inv(s)
    nx = (x + k @ (z - H7 @ x)).astype(np.float32)
    i_kh = np.eye(7, dtype=np.float32) - k @ H7
    npv = (i_kh @ p @ i_kh.T + k @ np.diag(R_DIAG) @ k.T).astype(np.float32)
    return nx, npv


def np_iou(a_xyxy, b_xyxy):
    a = np.asarray(a_xyxy, np.float32).reshape(-1, 4)
    b = np.asarray(b_xyxy, np.float32).reshape(-1, 4)
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(0.0, br - tl)
    inter = wh[..., 0] * wh[..., 1]
    area_a = ((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]))[:, None]
    area_b = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))[None, :]
    return (inter / np.maximum(area_a + area_b - inter, 1e-7)).astype(
        np.float32)


def speed_dir(b1, b2):
    cx1, cy1 = (b1[0] + b1[2]) / 2.0, (b1[1] + b1[3]) / 2.0
    cx2, cy2 = (b2[0] + b2[2]) / 2.0, (b2[1] + b2[3]) / 2.0
    dy, dx = cy2 - cy1, cx2 - cx1
    n = np.sqrt(dy * dy + dx * dx) + 1e-6
    return np.array([dy / n, dx / n], np.float32)


class OTrack:
    def __init__(self, box, score, cls, tid, delta_t):
        self.x, self.p = kf_init(xyxy_to_z(box))
        self.id = tid
        self.cls = cls
        self.score = score
        self.delta_t = delta_t
        self.last_obs = None           # (box, score)
        self.observations = {}         # age -> box
        self.velocity = None
        self.age = 0
        self.tsu = 0
        self.hits = 0
        self.hit_streak = 0
        self.observed = False
        self.frozen = None

    def predict(self):
        if self.tsu > 0:
            self.hit_streak = 0
        self.tsu += 1
        self.age += 1
        self.x, self.p = kf_predict(self.x, self.p)
        return x_to_xyxy(self.x)

    def k_previous_obs(self):
        if not self.observations:
            return None
        for i in range(self.delta_t):
            dt = self.delta_t - i
            if self.age - dt in self.observations:
                return self.observations[self.age - dt]
        return self.observations[max(self.observations)]

    def update(self, box, score, cls):
        gap = self.tsu
        prev = self.k_previous_obs()
        # ORU: rollback + virtual replay (official unfreeze)
        if not self.observed and self.frozen is not None \
                and self.last_obs is not None:
            self.x, self.p = self.frozen
            z1 = xyxy_to_z(self.last_obs[0])
            z2 = xyxy_to_z(box)
            w1 = np.sqrt(max(z1[2] * z1[3], 0.0))
            h1 = np.sqrt(max(z1[2] / max(z1[3], 1e-6), 0.0))
            w2 = np.sqrt(max(z2[2] * z2[3], 0.0))
            h2 = np.sqrt(max(z2[2] / max(z2[3], 1e-6), 0.0))
            g = max(gap, 1)
            for i in range(1, gap + 1):
                wi = w1 + i * (w2 - w1) / g
                hi = h1 + i * (h2 - h1) / g
                zi = np.array([z1[0] + i * (z2[0] - z1[0]) / g,
                               z1[1] + i * (z2[1] - z1[1]) / g,
                               wi * hi, wi / max(hi, 1e-6)], np.float32)
                self.x, self.p = kf_update(self.x, self.p, zi)
                if i < gap:
                    self.x, self.p = (F7 @ self.x).astype(np.float32), \
                        (F7 @ self.p @ F7.T + np.diag(Q_DIAG)).astype(
                            np.float32)
        self.x, self.p = kf_update(self.x, self.p, xyxy_to_z(box))
        if prev is not None:
            self.velocity = speed_dir(prev, box)
        self.last_obs = (np.asarray(box, np.float32), score)
        self.observations[self.age] = np.asarray(box, np.float32)
        self.tsu = 0
        self.hits += 1
        self.hit_streak += 1
        self.observed = True
        self.score = score
        self.cls = cls

    def miss(self):
        if self.observed:
            self.frozen = (self.x.copy(), self.p.copy())
        self.observed = False


class NpOCSort:
    def __init__(self, p: OCSortParams):
        self.p = p
        self.tracks = []
        self.frame_count = 0
        self.next_id = 1

    def update(self, boxes, scores, clss):
        p = self.p
        self.frame_count += 1
        keep = [j for j in range(len(scores)) if scores[j] > p.det_thresh]
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)

        preds = np.stack([t.predict() for t in self.tracks]) \
            if self.tracks else np.zeros((0, 4), np.float32)
        self.tracks = [t for i, t in enumerate(self.tracks)
                       if np.isfinite(preds[i]).all()]
        preds = preds[np.isfinite(preds).all(1)] if len(preds) else preds

        dets = boxes[keep]
        dscores = [scores[j] for j in keep]
        dcls = [clss[j] for j in keep]

        # round 1: OCM
        iou = np_iou(preds, dets)
        prev_obs = []
        prev_valid = []
        for t in self.tracks:
            po = t.k_previous_obs()
            if po is None and t.last_obs is not None:
                po = t.last_obs[0]
            if po is None:
                prev_obs.append(np.zeros(4, np.float32))
                prev_valid.append(False)
            else:
                prev_obs.append(po)
                prev_valid.append(True)
        bonus = np.zeros_like(iou)
        for i, t in enumerate(self.tracks):
            if not prev_valid[i]:
                continue
            vel = t.velocity if t.velocity is not None \
                else np.zeros(2, np.float32)
            for j in range(len(dets)):
                d = speed_dir(prev_obs[i], dets[j])
                cos = np.clip(vel[0] * d[0] + vel[1] * d[1], -1.0, 1.0)
                diff = (np.pi / 2 - abs(np.arccos(cos))) / np.pi
                bonus[i, j] = diff * p.inertia * dscores[j]

        matched = {}
        if iou.size:
            a = iou > p.iou_threshold
            if a.any() and a.sum(1).max() == 1 and a.sum(0).max() == 1:
                pairs = list(zip(*np.where(a)))
            else:
                ri, ci = linear_sum_assignment(-(iou + bonus))
                pairs = list(zip(ri, ci))
            for i, j in pairs:
                if iou[i, j] >= p.iou_threshold:
                    matched[i] = j
        u_trk = [i for i in range(len(self.tracks)) if i not in matched]
        u_det = [j for j in range(len(dets)) if j not in matched.values()]

        # round 2: OCR by last observation
        if u_trk and u_det:
            last = np.stack([
                self.tracks[i].last_obs[0] if self.tracks[i].last_obs
                else np.full(4, -1, np.float32) for i in u_trk])
            iou_l = np_iou(last, dets[u_det])
            if iou_l.max() > p.iou_threshold:
                ri, ci = linear_sum_assignment(-iou_l)
                for r, c in zip(ri, ci):
                    if iou_l[r, c] >= p.iou_threshold:
                        matched[u_trk[r]] = u_det[c]
                u_trk = [i for i in range(len(self.tracks))
                         if i not in matched]
                u_det = [j for j in range(len(dets))
                         if j not in matched.values()]

        for i, j in matched.items():
            self.tracks[i].update(dets[j], dscores[j], dcls[j])
        for i in u_trk:
            self.tracks[i].miss()

        for j in u_det:
            self.tracks.append(OTrack(dets[j], dscores[j], dcls[j],
                                      self.next_id, p.delta_t))
            self.next_id += 1

        self.tracks = [t for t in self.tracks if t.tsu <= p.max_age]

    def outputs(self):
        out = []
        for t in self.tracks:
            if t.tsu < 1 and (t.hit_streak >= self.p.min_hits
                              or self.frame_count <= self.p.min_hits):
                b = t.last_obs[0] if t.last_obs is not None \
                    else x_to_xyxy(t.x)
                out.append((t.id, b[0], b[1], b[2], b[3]))
        return sorted(out)


# --- scenes -------------------------------------------------------------------

def random_frames(seed, n_frames=25):
    rng = np.random.RandomState(seed)
    objs = []
    frames = []
    for t in range(n_frames):
        if rng.rand() < 0.5 and len(objs) < 6:
            objs.append(dict(
                pos=rng.uniform(100, 500, 2).astype(np.float32),
                vel=rng.uniform(-6, 6, 2).astype(np.float32),
                size=rng.uniform(40, 80, 2).astype(np.float32),
                dies=t + rng.randint(5, n_frames + 5)))
        objs = [o for o in objs if o["dies"] > t]
        dets = []
        for o in objs:
            o["pos"] = o["pos"] + o["vel"]
            r = rng.rand()
            if r < 0.18:
                continue  # missed detection -> lost / ORU on recovery
            score = rng.uniform(0.65, 0.98)
            w, h = o["size"]
            dets.append((np.array([o["pos"][0] - w / 2, o["pos"][1] - h / 2,
                                   o["pos"][0] + w / 2, o["pos"][1] + h / 2],
                                  np.float32),
                         np.float32(score), rng.randint(0, 3)))
        if rng.rand() < 0.25:  # false positive
            x, y = rng.uniform(600, 900, 2)
            w, h = rng.uniform(30, 60, 2)
            dets.append((np.array([x, y, x + w, y + h], np.float32),
                         np.float32(rng.uniform(0.3, 0.95)),
                         rng.randint(0, 3)))
        rng.shuffle(dets)
        frames.append(dets)
    return frames


def run_jax(frames, p=P):
    import jax
    s = init_state(p)
    outs = []
    for dets in frames:
        n = len(dets)
        xyxy = np.zeros((max(n, 1), 4), np.float32)
        score = np.zeros((max(n, 1),), np.float32)
        cls = np.zeros((max(n, 1),), np.int32)
        valid = np.zeros((max(n, 1),), bool)
        for j, (b, sc, c) in enumerate(dets):
            xyxy[j], score[j], cls[j], valid[j] = b, sc, c, True
        d = make_detections(xyxy, score, cls, valid=valid, params=p)
        s = step(s, d, p)
        box, ids, c_, sc_, mask = jax.device_get(get_outputs(s, p))
        m = np.asarray(mask)
        outs.append(sorted(
            (int(i), b[0], b[1], b[2], b[3])
            for i, b in zip(ids[m], box[m])))
    return outs, s


@pytest.mark.parametrize("seed", range(20))
def test_ocsort_matches_numpy_oracle(seed):
    frames = random_frames(seed)
    oracle = NpOCSort(P)
    import jax
    s = init_state(P)
    for fi, dets in enumerate(frames):
        n = len(dets)
        xyxy = np.zeros((max(n, 1), 4), np.float32)
        score = np.zeros((max(n, 1),), np.float32)
        cls = np.zeros((max(n, 1),), np.int32)
        valid = np.zeros((max(n, 1),), bool)
        for j, (b, sc, c) in enumerate(dets):
            xyxy[j], score[j], cls[j], valid[j] = b, sc, c, True

        oracle.update(xyxy[:n], list(score[:n]), list(cls[:n]))
        d = make_detections(xyxy, score, cls, valid=valid, params=P)
        s = step(s, d, P)

        box, ids, c_, sc_, mask = jax.device_get(get_outputs(s, P))
        m = np.asarray(mask)
        ours = sorted((int(i), b[0], b[1], b[2], b[3])
                      for i, b in zip(ids[m], box[m]))
        ref = oracle.outputs()
        assert [o[0] for o in ours] == [r[0] for r in ref], (
            f"seed {seed} frame {fi}: ids {[o[0] for o in ours]} vs "
            f"{[r[0] for r in ref]}")
        for o, r in zip(ours, ref):
            np.testing.assert_allclose(o[1:], r[1:], rtol=1e-3, atol=0.5,
                                       err_msg=f"seed {seed} frame {fi}")


# --- targeted unit tests --------------------------------------------------------

def _det(x, y, w=40, h=80, score=0.9, cls=0):
    return (np.array([x, y, x + w, y + h], np.float32),
            np.float32(score), cls)


def test_min_hits_gates_emission():
    # frames 1..3 emit immediately (frame_count <= min_hits); a track born
    # later must build hit_streak >= 3 first (creation itself is streak 0,
    # official KalmanBoxTracker.__init__)
    frames = [[], [], [], [_det(100, 100)], [_det(102, 100)],
              [_det(104, 100)], [_det(106, 100)]]
    outs, _ = run_jax(frames)
    assert outs[3] == [] and outs[4] == [] and outs[5] == []  # streak 0,1,2
    assert [o[0] for o in outs[6]] == [1]     # streak 3 = min_hits


def test_first_frames_emit_immediately():
    outs, _ = run_jax([[_det(100, 100)]])
    assert [o[0] for o in outs[0]] == [1]


def test_output_is_observation_not_kf_state():
    frames = [[_det(100, 100)], [_det(110, 100)], [_det(120, 100)]]
    outs, _ = run_jax(frames)
    # emitted box == the detection box exactly (observation-centric)
    assert outs[2][0][1] == pytest.approx(120.0, abs=1e-4)


def test_low_score_detections_are_invisible():
    frames = [[_det(100, 100, score=0.5)], [_det(100, 100, score=0.5)]]
    outs, s = run_jax(frames)
    assert outs == [[], []]
    assert not np.asarray(s.active).any()


def test_track_survives_misses_and_keeps_id():
    frames = [[_det(100, 100)], [_det(106, 100)], [_det(112, 100)],
              [], [],                             # 2 missed frames
              [_det(130, 100)], [_det(136, 100)]]
    outs, _ = run_jax(frames)
    assert [o[0] for o in outs[2]] == [1]
    assert outs[3] == [] and outs[4] == []
    # recovered with the same id (hit_streak was reset; frame_count > 3,
    # so emission resumes only once streak rebuilds)
    assert [o[0] for o in outs[6]] == [] or [o[0] for o in outs[6]] == [1]
    oracle = NpOCSort(P)
    for dets in frames:
        if dets:
            b = np.stack([d[0] for d in dets])
        else:
            b = np.zeros((0, 4), np.float32)
        oracle.update(b, [d[1] for d in dets], [d[2] for d in dets])
    assert sorted(t.id for t in oracle.tracks) == [1]


def test_removed_after_max_age():
    p = OCSortParams(max_tracks=32, max_detections=16, max_age=2,
                     min_hits=1)
    frames = [[_det(100, 100)], [_det(102, 100)], [], [], [],
              [_det(108, 100)]]
    outs, s = run_jax(frames, p=p)
    # tsu exceeded max_age -> removed; reappearance is a new track id 2
    ids = np.asarray(s.track_id)[np.asarray(s.active)].tolist()
    assert ids == [2]


def test_oru_replay_matches_oracle_state():
    """After a miss+recovery, the JAX KF state must equal the oracle's
    ORU-replayed state (rollback + virtual trajectory), not a plain
    update's."""
    frames = [[_det(100, 100)], [_det(110, 100)], [_det(120, 100)],
              [], [],
              [_det(150, 100)]]
    oracle = NpOCSort(P)
    for dets in frames:
        b = np.stack([d[0] for d in dets]) if dets else \
            np.zeros((0, 4), np.float32)
        oracle.update(b, [d[1] for d in dets], [d[2] for d in dets])
    outs, s = run_jax(frames)
    t = oracle.tracks[0]
    slot = int(np.flatnonzero(np.asarray(s.active))[0])
    np.testing.assert_allclose(np.asarray(s.x)[slot], t.x,
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s.p)[slot], t.p,
                               rtol=1e-3, atol=1e-2)


def test_capacity_overflow_counts_dropped():
    p = OCSortParams(max_tracks=4, max_detections=16)
    frames = [[_det(100 + 130 * i, 100) for i in range(8)]]
    outs, s = run_jax(frames, p=p)
    assert int(np.asarray(s.dropped)) == 4
    assert np.asarray(s.active).sum() == 4
