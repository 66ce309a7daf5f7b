"""Packaging consistency."""

import tomllib
from pathlib import Path

import aicamera_tpu


def test_version_matches_pyproject():
    pyproject = Path(__file__).resolve().parent.parent / "pyproject.toml"
    with open(pyproject, "rb") as f:
        meta = tomllib.load(f)
    assert aicamera_tpu.__version__ == meta["project"]["version"]
