"""Packaging consistency."""

import tomllib
from pathlib import Path

import aicamera_tpu


def test_version_matches_pyproject():
    pyproject = Path(__file__).resolve().parent.parent / "pyproject.toml"
    with open(pyproject, "rb") as f:
        meta = tomllib.load(f)
    assert aicamera_tpu.__version__ == meta["project"]["version"]


def test_lazy_top_level_exports():
    import pytest

    for name in aicamera_tpu._LAZY_EXPORTS:
        assert name in aicamera_tpu.__all__
        assert name in dir(aicamera_tpu)
        obj = getattr(aicamera_tpu, name)
        assert obj is not None
    # the reference-surface facades resolve to the right classes
    from aicamera_tpu.detector import YOLODetector
    assert aicamera_tpu.YOLODetector is YOLODetector
    with pytest.raises(AttributeError):
        aicamera_tpu.not_a_real_export
