"""Repo-wide plan lint as a test: every registry query's physical plan
is free of scale antipatterns (no cartesians, no row-at-a-time Python,
Arrow/BNLJ/SinglePartition only where reviewed — tools/plan_lint.py
documents each exception). Adding a query with a bad plan fails here,
not on the next 100 TB run."""

from __future__ import annotations

import sys


def test_all_query_plans_clean(spark):
    sys.path.insert(0, "tools")
    from plan_lint import lint

    problems = lint(spark, "/root/testdata/sf0.001")
    assert problems == {}, f"plan antipatterns: {problems}"
