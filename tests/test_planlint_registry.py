"""Registry-wide plan-shape gate: every query's physical plan is
either lint-clean or carries a written boundedness argument in
minispark_spark/planaudit.py. A new query that plans a cartesian, a
real single-partition exchange, a display global sort, or row-Python
turns this red until the plan is fixed or the argument written."""

from __future__ import annotations

from minispark_spark.planaudit import audit


def test_registry_has_no_undocumented_plan_shapes(spark, sf_dir):
    rows = audit(spark, sf_dir)
    bad = [(n, [str(f) for f in fs]) for n, fs, _, ok in rows if not ok]
    assert not bad, "\n".join(f"{n}: {fs}" for n, fs in bad)
    # Full coverage: every registry entry is audited — batch entries
    # directly, streaming/sink-backed ones via their inner plans
    # (VERDICT r6 item #6).
    from minispark_spark.registry import REGISTRY

    assert len(rows) == len(REGISTRY)
