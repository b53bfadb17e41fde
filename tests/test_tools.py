"""Unit tests for the measurement tooling that the round artifacts
depend on — pure-python, no Spark session."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from compare_bench import _series, compare  # noqa: E402


def test_series_flat_and_rich_shapes():
    flat = {"queries": {"q1": 1.5, "q2": -1.0, "q3": 2}}
    rich = {"queries": {"q1": {"spark": 1.5, "oracle": 0.5}, "q2": {"spark": None}}}
    assert _series(flat, "spark") == {"q1": 1.5, "q3": 2.0}
    assert _series(flat, "oracle") == {}
    assert _series(rich, "spark") == {"q1": 1.5}
    assert _series(rich, "oracle") == {"q1": 0.5}


def test_compare_flags_only_rel_and_abs(capsys):
    a = {"queries": {"q_big": 10.0, "q_small": 0.10, "q_same": 3.0}}
    b = {"queries": {"q_big": 20.0, "q_small": 0.20, "q_same": 3.1}}
    # q_big: 100% rel AND 10s abs -> flagged; q_small: 100% rel but
    # 0.1s abs -> NOT flagged (sub-noise absolute); q_same: within band
    n = compare(a, b, band=0.35, abs_floor=0.3)
    out = capsys.readouterr().out
    assert n == 1
    assert "DRIFT q_big" in out
    assert "q_small" not in out


def test_compare_agree(capsys):
    a = {"queries": {"q1": 1.0, "q2": 2.0}}
    n = compare(a, a, band=0.35, abs_floor=0.3)
    assert n == 0
    assert "all rows within band" in capsys.readouterr().out
