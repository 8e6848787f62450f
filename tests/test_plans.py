"""Physical-plan regression gate: the structural properties we rely on at
scale (pushdown, pruning, broadcast, top-k, no cartesian/Python eval)
must survive refactors. Thin wrapper over tools/plan_audit.py."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_plan_expectations(spark):
    import plan_audit

    assert plan_audit.main() == 0
