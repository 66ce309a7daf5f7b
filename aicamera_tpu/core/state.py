"""Fixed-capacity tracker state and detection containers (pytrees).

The reference keeps a growing/shrinking Python ``List[Track]`` of objects
(``src/tracker/core/track.py``, ``tracker_core.py:41``). For XLA we need
static shapes, so all track attributes live in padded arrays of length
``max_tracks`` with an ``active`` mask; the feature gallery is a per-track
FIFO ring buffer instead of a Python list (track.py:70-74). Detections are
likewise padded to ``max_detections`` with a ``valid`` mask (the analog of
``List[Detection]``, detection.py:15-26).

Track lifecycle states mirror reference ``TrackState`` (track.py:10-14):
Tentative=1, Confirmed=2. Deleted tracks are pruned immediately (the
reference removes them at the end of every update, tracker_core.py:75), so
deletion is simply ``active=False``.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import struct

TENTATIVE = 1
CONFIRMED = 2


@dataclasses.dataclass(frozen=True)
class TrackerParams:
    """Static tracker hyper-parameters (hashable; safe as a jit static arg).

    Defaults mirror reference ``src/config.py:23-29`` / ``TrackerCore``
    defaults (tracker_core.py:18-38).

    ``nsa`` enables StrongSORT's noise-scale-adaptive Kalman update: the
    measurement noise of each matched correction is scaled by
    ``(1 - detection_confidence)`` (see :func:`kalman.project`). Off by
    default — the reference's fixed noise model.

    ``ema_alpha`` selects the appearance-gallery strategy. 0.0 (default)
    is the reference's FIFO ring of up to ``nn_budget`` raw features per
    track (track.py:70-74). A value in (0, 1) enables a StrongSORT-style
    exponential-moving-average appearance bank instead: each track keeps
    ONE L2-normalized embedding, updated as
    ``e = normalize(alpha * e + (1 - alpha) * normalize(f))`` on every
    matched feature — the "smarter gallery management" item on the
    reference's future-enhancements list (README.md). With EMA enabled,
    set ``nn_budget=1`` to shrink the gallery tensor (the bank only ever
    occupies slot 0; the min-over-gallery cost then reduces to plain
    cosine distance against the bank).
    """
    max_cosine_distance: float = 0.2
    nn_budget: int = 100
    max_iou_distance: float = 0.7
    max_age: int = 70
    n_init: int = 3
    max_tracks: int = 128
    max_detections: int = 64
    feature_dim: int = 512
    ema_alpha: float = 0.0
    nsa: bool = False

    def __post_init__(self):
        if not (0.0 <= self.ema_alpha < 1.0):
            raise ValueError(
                f"ema_alpha must be in [0, 1) (got {self.ema_alpha}); "
                "0 disables the EMA bank (FIFO ring)")


@struct.dataclass
class TrackerState:
    """All track slots as padded arrays. Shapes use T=max_tracks, G=budget."""
    active: jnp.ndarray        # (T,) bool — slot holds a live track
    state: jnp.ndarray         # (T,) int32 — TENTATIVE / CONFIRMED
    mean: jnp.ndarray          # (T, 8) f32 — KF state mean
    cov: jnp.ndarray           # (T, 8, 8) f32 — KF state covariance
    hits: jnp.ndarray          # (T,) int32
    age: jnp.ndarray           # (T,) int32
    tsu: jnp.ndarray           # (T,) int32 — time_since_update
    track_id: jnp.ndarray      # (T,) int32
    class_id: jnp.ndarray      # (T,) int32
    conf: jnp.ndarray          # (T,) f32 — last matched detection confidence
    gallery: jnp.ndarray       # (T, G, D) f32 — ReID feature ring buffer
    gallery_count: jnp.ndarray  # (T,) int32 — valid entries (<= G)
    gallery_next: jnp.ndarray  # (T,) int32 — next write slot in the ring
    next_id: jnp.ndarray       # () int32 — next track id to assign
    dropped: jnp.ndarray       # () int32 — detections dropped to capacity


@struct.dataclass
class Detections:
    """Padded per-frame detections (already class/confidence filtered)."""
    tlwh: jnp.ndarray          # (N, 4) f32
    conf: jnp.ndarray          # (N,) f32
    class_id: jnp.ndarray      # (N,) int32
    feature: jnp.ndarray       # (N, D) f32 — zeros when has_feature is False
    has_feature: jnp.ndarray   # (N,) bool
    valid: jnp.ndarray         # (N,) bool


def init_state(params: TrackerParams) -> TrackerState:
    """Fresh tracker state; track ids restart at 1 (track.py:160-163)."""
    t, g, d = params.max_tracks, params.nn_budget, params.feature_dim
    return TrackerState(
        active=jnp.zeros((t,), jnp.bool_),
        state=jnp.zeros((t,), jnp.int32),
        mean=jnp.zeros((t, 8), jnp.float32),
        cov=jnp.zeros((t, 8, 8), jnp.float32),
        hits=jnp.zeros((t,), jnp.int32),
        age=jnp.zeros((t,), jnp.int32),
        tsu=jnp.zeros((t,), jnp.int32),
        track_id=jnp.zeros((t,), jnp.int32),
        class_id=jnp.zeros((t,), jnp.int32),
        conf=jnp.zeros((t,), jnp.float32),
        gallery=jnp.zeros((t, g, d), jnp.float32),
        gallery_count=jnp.zeros((t,), jnp.int32),
        gallery_next=jnp.zeros((t,), jnp.int32),
        next_id=jnp.int32(1),
        dropped=jnp.int32(0),
    )


def make_detections(tlwh, conf, class_id, feature=None, has_feature=None,
                    valid=None, *, params: TrackerParams) -> Detections:
    """Pad raw detection arrays to the static capacity.

    Accepts numpy or jax arrays with leading dim n <= max_detections.
    """
    n = params.max_detections
    d = params.feature_dim
    tlwh = jnp.asarray(tlwh, jnp.float32).reshape(-1, 4)
    k = tlwh.shape[0]
    if k > n:
        raise ValueError(f"{k} detections exceed capacity {n}")
    conf = jnp.asarray(conf, jnp.float32).reshape(-1)
    class_id = jnp.asarray(class_id, jnp.int32).reshape(-1)
    if feature is None:
        feature = jnp.zeros((k, d), jnp.float32)
        has_feature = jnp.zeros((k,), jnp.bool_)
    else:
        feature = jnp.asarray(feature, jnp.float32).reshape(k, d)
        if has_feature is None:
            has_feature = jnp.ones((k,), jnp.bool_)
        else:
            has_feature = jnp.asarray(has_feature, jnp.bool_).reshape(-1)
    if valid is None:
        valid = jnp.ones((k,), jnp.bool_)
    else:
        valid = jnp.asarray(valid, jnp.bool_).reshape(-1)
    # A non-finite box would propagate NaN through the cost matrices and can
    # corrupt the assignment for *healthy* tracks; drop it at the boundary.
    valid = valid & jnp.isfinite(tlwh).all(-1)

    pad = n - k
    return Detections(
        tlwh=jnp.pad(tlwh, ((0, pad), (0, 0))),
        conf=jnp.pad(conf, (0, pad)),
        class_id=jnp.pad(class_id, (0, pad)),
        feature=jnp.pad(feature, ((0, pad), (0, 0))),
        has_feature=jnp.pad(has_feature, (0, pad)),
        valid=jnp.pad(valid, (0, pad)),
    )


# Per-track array fields (leading dim T = max_tracks). `next_id` and
# `dropped` are per-tracker scalars and travel with whichever state is
# "live". Derived from the dataclass so a new field can never silently
# miss the slice/splice below.
TRACK_AXIS_FIELDS = tuple(
    f.name for f in dataclasses.fields(TrackerState)
    if f.name not in ("next_id", "dropped"))


def slice_tracks(state: TrackerState, t_small: int) -> TrackerState:
    """View of the first ``t_small`` track slots as a smaller TrackerState.

    Semantics-preserving whenever no active track lives at slot >=
    t_small: the core derives everything per-slot, new tracks always take
    the LOWEST free slots (tracker.py slot_of_rank), and padded inactive
    rows are masked out of every cost/assignment stage — so the sliced
    state evolves exactly like the full one until it runs out of slots
    (visible as a ``dropped`` increment; see the pipeline's bucketed-scan
    fallback).
    """
    return state.replace(
        **{f: getattr(state, f)[:t_small] for f in TRACK_AXIS_FIELDS})


def splice_tracks(master: TrackerState, small: TrackerState) -> TrackerState:
    """Write a sliced state's slots back into the full-capacity master.

    Slots beyond the slice are untouched (they were inactive and ignored
    by the small run); the scalar counters come from the small state."""
    t_small = small.active.shape[0]
    out = master.replace(
        **{f: getattr(master, f).at[:t_small].set(getattr(small, f))
           for f in TRACK_AXIS_FIELDS})
    return out.replace(next_id=small.next_id, dropped=small.dropped)


# --- generic slice/splice over any tracker-state family ----------------------
# The three cores (DeepSORT TrackerState, ByteTrackState, OCSortState) share
# the invariants the capacity-bucketed scan needs: every non-scalar field
# carries the track axis leading, new tracks take the LOWEST free slots,
# overflow shows up as a `dropped` increment, and get_outputs emits
# canonical zeros on masked lanes. The scalar counters travel with
# whichever state is "live".

_SCALAR_STATE_FIELDS = frozenset(
    {"next_id", "dropped", "frame_count", "frame_id"})


def track_axis_field_names(state) -> tuple:
    """Names of the per-track array fields of any tracker-state dataclass.

    Optional fields holding ``None`` (e.g. the ByteTrack state's appearance
    bank in motion-only mode) are skipped — there is nothing to slice."""
    return tuple(f.name for f in dataclasses.fields(state)
                 if f.name not in _SCALAR_STATE_FIELDS
                 and getattr(state, f.name) is not None)


def slice_any_tracks(state, t_small: int):
    """First ``t_small`` track slots of any core's state (see slice_tracks)."""
    return state.replace(
        **{f: getattr(state, f)[:t_small]
           for f in track_axis_field_names(state)})


def splice_any_tracks(master, small):
    """Write a sliced state back into its full-capacity master (any core)."""
    t_small = small.active.shape[0]
    upd = {f: getattr(master, f).at[:t_small].set(getattr(small, f))
           for f in track_axis_field_names(master)}
    for f in _SCALAR_STATE_FIELDS:
        if hasattr(master, f):
            upd[f] = getattr(small, f)
    return master.replace(**upd)


def slice_stream_tracks(states, t_small: int):
    """slice_any_tracks for stacked per-stream states: fields are
    (S, T, ...) with the track axis second (parallel/multistream.py)."""
    return states.replace(
        **{f: getattr(states, f)[:, :t_small]
           for f in track_axis_field_names(states)})


def splice_stream_tracks(master, small):
    """splice_any_tracks for stacked per-stream states (scalar counters
    are (S,) under the stream vmap and travel with the live state)."""
    t_small = small.active.shape[1]
    upd = {f: getattr(master, f).at[:, :t_small].set(getattr(small, f))
           for f in track_axis_field_names(master)}
    for f in _SCALAR_STATE_FIELDS:
        if hasattr(master, f):
            upd[f] = getattr(small, f)
    return master.replace(**upd)
