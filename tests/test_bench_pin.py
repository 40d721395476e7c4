"""Unit tests for bench.py's pin discipline helpers (no Spark).

The per-query spike guard is the r15 verdict order #4: a pin whose
SUITE passed the 15% quiet gate can still carry a one-query contention
burst (r15 pin2 shipped q1_pricing_summary at 29x pin1); the guard
keeps the stored per-query time whenever that query's two steady
in-suite passes disagree by more than 2x.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def benchmod():
    # bench.py builds a SparkSession at main() time only; importing the
    # module is side-effect-free apart from reading env vars
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def _current(queries, in_suite):
    return {
        "value": round(sum(in_suite.values()), 3),
        "value_isolated": round(sum(queries.values()), 3),
        "queries": dict(queries),
        "queries_in_suite": dict(in_suite),
    }


def test_spike_replaced_by_stored_time(benchmod):
    # q_spike's two steady passes disagree 5x -> stored pin time ships
    runs = [
        {"q_ok": 1.0, "q_spike": 1.0},
        {"q_ok": 1.0, "q_spike": 1.0},
        {"q_ok": 1.1, "q_spike": 5.0},
    ]
    current = _current({"q_ok": 1.0, "q_spike": 5.0}, {"q_ok": 1.0, "q_spike": 1.0})
    pin = {
        "queries": {"q_ok": 1.05, "q_spike": 0.9},
        "queries_in_suite": {"q_ok": 1.0, "q_spike": 0.95},
    }
    guarded = benchmod.apply_spike_guard(current, pin, runs)
    assert guarded == ["q_spike"]
    assert current["queries"]["q_spike"] == 0.9
    assert current["queries_in_suite"]["q_spike"] == 0.95
    # the unguarded query keeps its CURRENT measurement
    assert current["queries"]["q_ok"] == 1.0
    # totals recomputed from the shipped maps
    assert current["value_isolated"] == round(1.0 + 0.9, 3)
    assert current["value"] == round(1.0 + 0.95, 3)
    assert current["spike_guarded"] == ["q_spike"]


def test_agreeing_passes_ship_current(benchmod):
    runs = [
        {"q": 9.9},
        {"q": 1.0},
        {"q": 1.8},  # 1.8x < 2x: agreement, current ships
    ]
    current = _current({"q": 1.0}, {"q": 1.0})
    pin = {"queries": {"q": 0.5}, "queries_in_suite": {"q": 0.5}}
    assert benchmod.apply_spike_guard(current, pin, runs) == []
    assert current["queries"]["q"] == 1.0
    assert "spike_guarded" not in current


def test_no_pin_or_changed_set_is_noop(benchmod):
    runs = [{"q": 1.0}, {"q": 1.0}, {"q": 9.0}]
    current = _current({"q": 9.0}, {"q": 1.0})
    assert benchmod.apply_spike_guard(current, None, runs) == []
    pin = {"queries": {"other": 1.0}, "queries_in_suite": {"other": 1.0}}
    assert benchmod.apply_spike_guard(current, pin, runs) == []
    assert current["queries"]["q"] == 9.0


def test_old_format_pin_without_in_suite_map(benchmod):
    # pins written before round 16 lack queries_in_suite: the isolated
    # column is still guarded, the in-suite map keeps the current value
    runs = [{"q": 1.0}, {"q": 1.0}, {"q": 9.0}]
    current = _current({"q": 9.0}, {"q": 7.0})
    pin = {"queries": {"q": 0.8}}
    assert benchmod.apply_spike_guard(current, pin, runs) == ["q"]
    assert current["queries"]["q"] == 0.8
    assert current["queries_in_suite"]["q"] == 7.0


def test_isolated_burst_vs_own_suite_guarded(benchmod):
    # rule 2: steady passes AGREE (rule 1 passes) but the isolated
    # phase caught a sustained burst — 13.7s isolated vs 1.4s in-suite
    # on an identical plan (the first r16 pin's actual failure).  The
    # smaller stored value ships.
    runs = [
        {"q": 1.5},
        {"q": 1.4},
        {"q": 1.5},
    ]
    current = _current({"q": 13.7}, {"q": 1.4})
    pin = {"queries": {"q": 1.1}, "queries_in_suite": {"q": 1.3}}
    assert benchmod.apply_spike_guard(current, pin, runs) == ["q"]
    assert current["queries"]["q"] == 1.1
    # in-suite passed agreement, so the in-suite column keeps the
    # current measurement
    assert current["queries_in_suite"]["q"] == 1.4
    assert current["value_isolated"] == 1.1


def test_contaminated_stored_isolated_cannot_outlive_clean_run(benchmod):
    # the stored pin carries a burst value (13.7s); the current run is
    # clean — min() means the clean measurement ships and the
    # contamination is gone
    runs = [{"q": 1.5}, {"q": 1.4}, {"q": 1.5}]
    current = _current({"q": 1.2}, {"q": 1.4})
    pin = {"queries": {"q": 13.7}, "queries_in_suite": {"q": 1.3}}
    assert benchmod.apply_spike_guard(current, pin, runs) == []
    assert current["queries"]["q"] == 1.2


def test_cheap_query_jitter_not_guarded(benchmod):
    # 2x on a 0.05s query is jitter, not a burst: the absolute >0.5s
    # floor keeps the current measurement
    runs = [{"q": 0.05}, {"q": 0.05}, {"q": 0.06}]
    current = _current({"q": 0.12}, {"q": 0.05})
    pin = {"queries": {"q": 0.04}, "queries_in_suite": {"q": 0.05}}
    assert benchmod.apply_spike_guard(current, pin, runs) == []
    assert current["queries"]["q"] == 0.12
