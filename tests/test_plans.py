"""Physical-plan regression tests (no execution — plan inspection only).

Asserts the scale-critical plan properties documented in docs/SCALE.md
via tools/explain_audit.py: pushed filters, broadcast joins, partial
aggregation, TakeOrderedAndProject top-k, and the absence of
cartesian products.
"""

from __future__ import annotations

import os
import re
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.explain_audit import AUDITS, formatted_plan  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entrymod(spark):
    import __spark_entry__ as m

    return m


@pytest.mark.parametrize("name", sorted(AUDITS))
def test_plan_properties(spark, entrymod, name):
    must, must_not = AUDITS[name]
    plan = formatted_plan(entrymod.queries()[name](spark, SF))
    for pat in must:
        assert re.search(pat, plan), f"{name}: missing /{pat}/\n{plan}"
    for pat in must_not:
        assert not re.search(pat, plan), f"{name}: forbidden /{pat}/\n{plan}"
