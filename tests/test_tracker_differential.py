"""Multi-frame differential test: the JAX tracker vs an independent NumPy
DeepSORT reimplementation.

The NumPy tracker below implements the reference's full semantics
(predict → two-stage match → KF update → gallery append → lifecycle →
initiate, with sequential ids in detection order) using float32 numpy and
scipy — sharing no code with the JAX core. Randomized multi-frame scenes
must produce identical track ids, lifecycle states and (near-identical)
boxes frame by frame.
"""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from aicamera_tpu.core import (TrackerParams, init_state, make_detections,
                               predict, update)
from aicamera_tpu.core.state import CONFIRMED, TENTATIVE
from aicamera_tpu.core.tracker import get_outputs

P = TrackerParams(max_tracks=32, max_detections=12, nn_budget=4,
                  feature_dim=8, n_init=3, max_age=6)

CHI2_4 = 9.487729036781154
WP, WV = 1.0 / 20, 1.0 / 160
INFTY = 1e5


# --- float32 NumPy Kalman filter (independent implementation) ---------------


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


def kf_project(mean, cov):
    hm = np.eye(4, 8, dtype=np.float32)
    h = mean[3]
    std = np.array([WP*h, WP*h, 1e-1, WP*h], np.float32)
    return hm @ mean, hm @ cov @ hm.T + np.diag(std * std)


def kf_update(mean, cov, meas):
    pm, s = kf_project(mean, cov)
    gain = np.linalg.solve(s.astype(np.float64),
                           (cov[:, :4]).astype(np.float64).T).T
    new_mean = mean + (gain @ (meas - pm)).astype(np.float32)
    new_cov = cov - (gain @ s.astype(np.float64) @ gain.T).astype(np.float32)
    return new_mean.astype(np.float32), new_cov


def kf_gate(mean, cov, meas_batch):
    pm, pc = kf_project(mean, cov)
    d = meas_batch - pm
    l = np.linalg.cholesky(pc.astype(np.float64))
    z = np.linalg.solve(l, d.T.astype(np.float64))
    return np.sum(z * z, axis=0)


# --- NumPy tracker -----------------------------------------------------------


class NpTracker:
    def __init__(self, p: TrackerParams):
        self.p = p
        self.tracks = []
        self.next_id = 1

    def predict(self):
        for t in self.tracks:
            t["mean"], t["cov"] = kf_predict(t["mean"], t["cov"])
            t["age"] += 1
            t["tsu"] += 1

    def _to_tlwh(self, mean):
        cx, cy, a, h = mean[:4]
        w = a * h if h > 0 else 0.0
        h = max(h, 0.0)
        return np.array([cx - w / 2, cy - h / 2, w, h], np.float32)

    def _min_cost(self, cost, rows, cols, max_dist):
        if not rows or not cols:
            return [], list(rows), list(cols)
        sub = cost[np.ix_(rows, cols)].copy()
        sub[sub > max_dist] = max_dist + 1e-5
        ri, ci = linear_sum_assignment(sub)
        matches, ur, uc = [], list(rows), list(cols)
        for r, c in zip(ri, ci):
            if sub[r, c] <= max_dist:
                matches.append((rows[r], cols[c]))
                ur.remove(rows[r])
                uc.remove(cols[c])
        return matches, ur, uc

    def _match(self, dets):
        nt, nd = len(self.tracks), len(dets)
        meas = np.stack([d["xyah"] for d in dets]) if nd else \
            np.zeros((0, 4), np.float32)

        app = np.full((nt, nd), INFTY, np.float32)
        for i, t in enumerate(self.tracks):
            if not t["gallery"]:
                continue
            g = np.stack(t["gallery"])
            g = g / np.maximum(np.linalg.norm(g, axis=1, keepdims=True),
                               1e-7)
            for j, d in enumerate(dets):
                if d["feat"] is None:
                    continue
                f = d["feat"] / max(np.linalg.norm(d["feat"]), 1e-7)
                app[i, j] = max(0.0, float(np.min(1.0 - g @ f)))
            if nd:
                gd = kf_gate(t["mean"], t["cov"], meas)
                app[i, gd > CHI2_4] = INFTY

        confirmed = [i for i, t in enumerate(self.tracks)
                     if t["state"] == CONFIRMED]
        matches, unmatched = [], list(range(nd))
        for level in range(self.p.max_age):
            if not unmatched:
                break
            rows = [i for i in confirmed
                    if self.tracks[i]["tsu"] == level + 1]
            if not rows:
                continue
            m, _, unmatched = self._min_cost(
                app, rows, unmatched, self.p.max_cosine_distance)
            matches += m

        matched_rows = {i for i, _ in matches}
        iou_rows = [i for i, t in enumerate(self.tracks)
                    if t["state"] == TENTATIVE or (
                        t["state"] == CONFIRMED and i not in matched_rows
                        and t["tsu"] == 1)]
        iou = np.full((nt, nd), INFTY, np.float32)
        for i, t in enumerate(self.tracks):
            b = self._to_tlwh(t["mean"])
            for j, d in enumerate(dets):
                x = d["tlwh"]
                ix1, iy1 = max(b[0], x[0]), max(b[1], x[1])
                ix2 = min(b[0] + b[2], x[0] + x[2])
                iy2 = min(b[1] + b[3], x[1] + x[3])
                inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
                union = b[2] * b[3] + x[2] * x[3] - inter
                iou[i, j] = 1.0 - inter / max(union, 1e-7)
        m, _, unmatched = self._min_cost(
            iou, iou_rows, unmatched, self.p.max_iou_distance)
        matches += m
        all_matched = {i for i, _ in matches}
        unmatched_tracks = [i for i in range(nt) if i not in all_matched]
        return matches, unmatched_tracks, unmatched

    def update(self, dets):
        matches, um_tracks, um_dets = self._match(dets)
        for i, j in matches:
            t = self.tracks[i]
            d = dets[j]
            t["mean"], t["cov"] = kf_update(t["mean"], t["cov"], d["xyah"])
            if d["feat"] is not None:
                t["gallery"].append(d["feat"])
                if len(t["gallery"]) > self.p.nn_budget:
                    t["gallery"].pop(0)
            t["hits"] += 1
            t["tsu"] = 0
            t["conf"] = d["conf"]
            if t["state"] == TENTATIVE and t["hits"] >= self.p.n_init:
                t["state"] = CONFIRMED
        for i in um_tracks:
            t = self.tracks[i]
            if t["state"] == TENTATIVE or t["tsu"] > self.p.max_age:
                t["dead"] = True
        for j in um_dets:
            d = dets[j]
            mean, cov = kf_initiate(d["xyah"])
            self.tracks.append(dict(
                id=self.next_id, mean=mean, cov=cov, hits=1, age=1, tsu=0,
                state=TENTATIVE, conf=d["conf"],
                gallery=[d["feat"]] if d["feat"] is not None else [],
                dead=False))
            self.next_id += 1
        self.tracks = [t for t in self.tracks if not t.get("dead")]

    def outputs(self):
        out = []
        for t in self.tracks:
            if t["state"] == CONFIRMED and t["tsu"] == 0:
                b = self._to_tlwh(t["mean"])
                out.append((t["id"], b[0], b[1], max(b[2], 0), max(b[3], 0)))
        return sorted(out)


def random_frames(seed, n_frames=15):
    rng = np.random.RandomState(seed)
    # persistent objects with linear motion + random birth/death
    objs = []
    frames = []
    for t in range(n_frames):
        if rng.rand() < 0.5 and len(objs) < 6:
            f = rng.rand(P.feature_dim).astype(np.float32)
            objs.append(dict(
                pos=rng.uniform(80, 400, 2).astype(np.float32),
                vel=rng.uniform(-4, 4, 2).astype(np.float32),
                size=rng.uniform(35, 70, 2).astype(np.float32),
                feat=(f / np.linalg.norm(f)),
                dies=t + rng.randint(4, n_frames + 5)))
        objs = [o for o in objs if o["dies"] > t]
        dets = []
        for o in objs:
            o["pos"] = o["pos"] + o["vel"]
            if rng.rand() < 0.1:
                continue  # missed detection
            w, h = o["size"]
            tlwh = np.array([o["pos"][0] - w / 2, o["pos"][1] - h / 2, w, h],
                            np.float32)
            feat = o["feat"] if rng.rand() < 0.9 else None
            dets.append((tlwh, feat))
        rng.shuffle(dets)
        frames.append(dets)
    return frames


@pytest.mark.parametrize("seed", range(20))
def test_full_tracker_matches_numpy_reference(seed):
    frames = random_frames(seed)
    np_tracker = NpTracker(P)
    s = init_state(P)

    for fi, dets in enumerate(frames):
        # numpy side
        np_dets = []
        for tlwh, feat in dets:
            x, y, w, h = tlwh
            xyah = np.array([x + w / 2, y + h / 2,
                             (w / h if h else 0.0), h], np.float32)
            np_dets.append(dict(tlwh=tlwh, xyah=xyah, feat=feat, conf=0.9))
        np_tracker.predict()
        np_tracker.update(np_dets)

        # jax side
        n = len(dets)
        tlwh_arr = np.zeros((max(n, 1), 4), np.float32)
        feats = np.zeros((max(n, 1), P.feature_dim), np.float32)
        hasf = np.zeros((max(n, 1),), bool)
        for j, (tlwh, feat) in enumerate(dets):
            tlwh_arr[j] = tlwh
            if feat is not None:
                feats[j] = feat
                hasf[j] = True
        valid = np.zeros((max(n, 1),), bool)
        valid[:n] = True
        s = predict(s, P)
        d = make_detections(tlwh_arr, np.full(max(n, 1), 0.9, np.float32),
                            np.zeros(max(n, 1), np.int32), feats,
                            has_feature=hasf, valid=valid, params=P)
        s = update(s, d, P)

        tlbr, ids, cls, conf, mask = get_outputs(s)
        m = np.asarray(mask)
        ours = sorted(
            (int(i), b[0], b[1], max(b[2] - b[0], 0), max(b[3] - b[1], 0))
            for i, b in zip(np.asarray(ids)[m], np.asarray(tlbr)[m]))
        ref = np_tracker.outputs()

        assert [o[0] for o in ours] == [r[0] for r in ref], (
            f"seed {seed} frame {fi}: ids {[o[0] for o in ours]} vs "
            f"{[r[0] for r in ref]}")
        for o, r in zip(ours, ref):
            np.testing.assert_allclose(o[1:], r[1:], rtol=1e-3, atol=0.5,
                                       err_msg=f"seed {seed} frame {fi}")
