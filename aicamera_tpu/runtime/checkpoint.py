"""Tracker-state checkpoint/resume (capability the reference lacks).

The reference has no persistence at all — tracker state is in-memory and
reset per run (SURVEY.md §5: checkpoint/resume "None"). Here the whole
:class:`TrackerState` pytree (Kalman bank, galleries, lifecycle counters,
id counter) serializes to a single msgpack file, so long-running streams
survive process restarts with track identities intact, and multi-stream
stacked states snapshot the same way.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np
from flax import serialization

from ..core import bytetrack as _bt
from ..core import ocsort as _oc
from ..core.state import TrackerParams, TrackerState, init_state


def save_state(path: str | Path, state) -> None:
    """Serialize a tracker state pytree (DeepSORT :class:`TrackerState` or
    ByteTrack :class:`~aicamera_tpu.core.bytetrack.ByteTrackState`,
    single- or multi-stream) to msgpack.

    The write is atomic (temp file + rename) so periodic streaming
    snapshots (cli --checkpoint) can never leave a torn file behind if the
    process dies mid-write.
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    host_state = jax.device_get(state)
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(host_state))
    tmp.replace(path)


def load_state(path: str | Path, params,
               n_streams: int | None = None):
    """Load a tracker state; shapes must match the given params.

    ``params`` selects the state family: a :class:`TrackerParams` loads a
    DeepSORT :class:`TrackerState`, a :class:`_bt.ByteTrackParams` loads a
    :class:`_bt.ByteTrackState`, an :class:`_oc.OCSortParams` loads an
    :class:`_oc.OCSortState`.
    """
    if isinstance(params, _bt.ByteTrackParams):
        template = _bt.init_state(params)
    elif isinstance(params, _oc.OCSortParams):
        template = _oc.init_state(params)
    else:
        template = init_state(params)
    if n_streams is not None:
        template = jax.tree.map(
            lambda x: np.broadcast_to(
                np.asarray(x)[None], (n_streams,) + np.asarray(x).shape).copy(),
            template)
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
