"""StrongSORT preset: the named facade/pipeline configuration.

Every StrongSORT component has its own functional tests (EMA bank in
test_ema_gallery, NSA in test_nsa, GMC in test_gmc*, GSI in
test_postprocess); these tests pin the *preset*
— that ``StrongSORT`` / ``TrackingPipeline(tracker="strongsort")`` wire
exactly the documented configuration and stay overridable.
"""

from aicamera_tpu import config
from aicamera_tpu.core.state import TrackerParams
from aicamera_tpu.runtime.pipeline import TrackingPipeline


def test_pipeline_strongsort_preset_params():
    pipe = TrackingPipeline(chunk_size=4, tracker="strongsort")
    # resolves to the DeepSORT core...
    assert pipe.tracker_kind == "deepsort"
    p = pipe.tracker_params
    # ...with StrongSORT's upgrades: EMA bank (one gallery slot), NSA
    # Kalman, camera-motion compensation on by default.
    assert p.nsa is True
    assert p.ema_alpha == 0.9
    assert p.nn_budget == 1
    assert pipe.gmc_method == "affine"
    # reference-parity knobs unchanged
    assert p.max_cosine_distance == config.DEEPSORT_MAX_DIST
    assert p.max_age == config.DEEPSORT_MAX_AGE
    assert p.n_init == config.DEEPSORT_N_INIT


def test_pipeline_strongsort_gmc_override():
    pipe = TrackingPipeline(chunk_size=4, tracker="strongsort", gmc="off")
    assert pipe.gmc_method is None            # explicit off wins
    pipe = TrackingPipeline(chunk_size=4, tracker="strongsort",
                            gmc="translation")
    assert pipe.gmc_method == "translation"


def test_pipeline_strongsort_explicit_params_win():
    custom = TrackerParams(
        max_tracks=32, max_detections=16, nn_budget=4,
        feature_dim=config.REID_FEATURE_DIM)
    pipe = TrackingPipeline(chunk_size=4, tracker="strongsort",
                            tracker_params=custom)
    assert pipe.tracker_params is custom      # expert mode: no preset


def test_multistream_strongsort_preset():
    from aicamera_tpu.parallel import MultiStreamPipeline
    pipe = MultiStreamPipeline(n_streams=2, frame_hw=(64, 64),
                               tracker="strongsort")
    assert pipe.tracker_kind == "deepsort"
    assert pipe.tracker_params.nsa is True
    assert pipe.tracker_params.ema_alpha == 0.9
    assert pipe.tracker_params.nn_budget == 1
    assert pipe.gmc_method == "affine"
    # explicit off still wins
    pipe = MultiStreamPipeline(n_streams=2, frame_hw=(64, 64),
                               tracker="strongsort", gmc="off")
    assert pipe.gmc_method is None


def test_strongsort_facade_preset():
    from aicamera_tpu.strongsort_api import StrongSORT
    t = StrongSORT()
    assert t.params.nsa is True
    assert t.params.ema_alpha == 0.9
    assert t.params.nn_budget == 1            # EMA bank = slot 0 only
    assert t._gmc is not None                 # affine GMC wired
    # the preset is just DeepSORT configuration — same update contract
    from aicamera_tpu.tracker_api import DeepSORT
    assert isinstance(t, DeepSORT)


def test_strongsort_facade_overridable():
    from aicamera_tpu.strongsort_api import StrongSORT
    t = StrongSORT(gallery_strategy="fifo", nn_budget=7, gmc=False,
                   nsa=False)
    assert t.params.nsa is False
    assert t.params.ema_alpha == 0.0
    assert t.params.nn_budget == 7
    assert t._gmc is None


def test_cli_accepts_strongsort():
    from aicamera_tpu.cli import parse_arguments
    args = parse_arguments(["--input", "x.mp4", "--tracker", "strongsort"])
    assert args.tracker == "strongsort"


def test_package_export():
    import aicamera_tpu
    assert aicamera_tpu.StrongSORT is not None
    assert "StrongSORT" in aicamera_tpu.__all__
