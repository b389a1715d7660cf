"""Plan linter: flag physical-plan shapes that are invisible at test
scale and fatal at 100x.

The round-3 ABC-classification finding (an unpartitioned cumulative
window planning an Exchange SinglePartition over the part DIMENSION —
0.7 s at sf0.1, a one-task funnel at hundreds of millions of SKUs) is
a whole CLASS of bug: the plan executes fine on every test input and
only the shape betrays it. This module turns the ad-hoc audit greps
into an engine feature:

    from minispark_spark.planlint import lint
    findings = lint(df)          # [] == clean
    assert not lint(df), lint(df)

Checks (each returns a Finding with the matched plan fragment):

- ``single-partition-exchange`` — Exchange SinglePartition feeding a
  non-scalar operator (Window/Sort/row-producing). A GLOBAL scalar
  aggregate's final 1-row merge is the legitimate use and is NOT
  flagged; neither is a domain-compressed frame the caller declares
  via ``allow``.
- ``global-sort`` — a total-order Sort (``Sort [...], true``) outside
  TakeOrderedAndProject: at scale this is a range-partitioned full
  shuffle that usually only exists to satisfy a display ORDER BY.
- ``cartesian-product`` — CartesianProduct / BroadcastNestedLoopJoin
  with no join condition; quadratic unless one side is a bounded
  aggregate (broadcast 1-row frames are allowed).
- ``python-row-udf`` — BatchEvalPython (row-at-a-time Python UDF) in
  the plan; ArrowEvalPython / mapInPandas are the sanctioned Python
  surfaces and are not flagged.

``allow`` silences a named check when the caller has a boundedness
argument the linter cannot see (document it at the call site — the
point is forcing the argument to be written down).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Finding:
    check: str
    fragment: str

    def __str__(self) -> str:  # readable in pytest assertion output
        return f"[{self.check}] {self.fragment}"


_SCALAR_AGG_BEFORE_SINGLE = re.compile(
    r"HashAggregate\(keys=\[\]|SortAggregate\(key=\[\]|ObjectHashAggregate\(keys=\[\]"
)


def _plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _marker_depth(line: str) -> int | None:
    """Column of the '+-'/':-' operator marker, or None for non-node
    lines (continuations, the root)."""
    m = re.match(r"^[\s:]*([+:]-)", line)
    return m.start(1) if m else None


def _build_subtree(lines: list[str], i: int) -> str:
    """The text of a binary node's BUILD child subtree: the '+- ' child
    at the next marker depth below line ``i``, through the end of its
    indent block."""
    parent = _marker_depth(lines[i])
    child_depth = 0 if parent is None else parent + 3
    start = None
    for j in range(i + 1, len(lines)):
        d = _marker_depth(lines[j])
        if d is None:
            continue
        if d < child_depth:
            break
        if d == child_depth and lines[j][d] == "+":
            start = j
            break
    if start is None:
        return ""
    out = [lines[start]]
    for j in range(start + 1, len(lines)):
        d = _marker_depth(lines[j])
        if d is not None and d <= child_depth:
            break
        out.append(lines[j])
    return "\n".join(out)


def lint(df: DataFrame, allow: frozenset[str] | set[str] = frozenset()) -> list[Finding]:
    """Lint ``df``'s executed physical plan; [] means clean."""
    plan = _plan_string(df)
    lines = plan.splitlines()
    findings: list[Finding] = []

    def emit(check: str, line: str) -> None:
        if check not in allow:
            findings.append(Finding(check, line.strip()[:160]))

    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            # Legitimate: the final merge of a GLOBAL scalar aggregate
            # (keys=[]) directly above the exchange — 1 row in, 1 row
            # out. Anything else funnels real data through one task.
            above = lines[max(0, i - 2) : i]
            if not any(_SCALAR_AGG_BEFORE_SINGLE.search(a) for a in above):
                emit("single-partition-exchange", line)
        if re.search(r"\bSort \[[^\]]*\], true", line) and not any(
            "TakeOrderedAndProject" in a for a in lines[max(0, i - 3) : i]
        ):
            emit("global-sort", line)
        if "CartesianProduct" in line:
            emit("cartesian-product", line)
        if "BroadcastNestedLoopJoin" in line:
            # BNLJ over two REAL frames is quadratic. The benign and
            # very common case is a scalar-threshold compare against a
            # broadcast 1-row GLOBAL aggregate (value > total * 0.001 —
            # the TPC-H q11/q20/q22 shape): detect it by a keys=[]
            # aggregate anywhere in the BUILD subtree (the '+- '
            # child, extracted by marker indentation).
            if not _SCALAR_AGG_BEFORE_SINGLE.search(_build_subtree(lines, i)):
                emit("cartesian-product", line)
        if "BatchEvalPython" in line:
            emit("python-row-udf", line)
    return findings
