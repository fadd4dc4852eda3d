"""Plan-inspection helpers: turn `.explain()` eyeballing into assertions.

The scale story of every operator rests on plan properties — filters
reaching the parquet scan, dimension tables broadcast, top-k compiled to
TakeOrderedAndProject, no stray Exchanges. These helpers extract the
formatted plan so tests can assert those properties and CI catches plan
regressions (e.g. a future change silently turning a broadcast join into a
sort-merge shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def _nodes(plan: str) -> list[str]:
    """Node names from the detail section ('(N) NodeName' headers) — the
    tree section repeats every node, so counting raw lines double-counts."""
    import re

    out = []
    for line in plan.splitlines():
        m = re.match(r"^\((\d+)\)\s+(\S+)", line.strip())
        if m:
            out.append(m.group(2))
    return out


def detail_blocks(plan: str) -> list[str]:
    """The DETAIL section of a formatted plan as one text block per
    node header line ``(N) NodeName`` — arguments, join keys/conditions,
    input/output columns. Node IDS are deliberately not used as keys:
    cached artifacts and materialized AQE stages re-print their own
    plans with RESTARTED numbering, so ids collide across sections;
    assertions over detail blocks must be attribution-free (hold for
    every block of a given node kind, wherever it came from)."""
    import re

    blocks: list[str] = []
    cur: list[str] | None = None
    for line in plan.splitlines():
        if re.match(r"^\(\d+\)\s+\S+", line):
            if cur:
                blocks.append("\n".join(cur))
            cur = [line]
        elif cur is not None:
            cur.append(line)
    if cur:
        blocks.append("\n".join(cur))
    return blocks


def count_exchanges(plan: str) -> int:
    """Shuffle exchanges only (broadcast exchanges counted separately)."""
    return sum(1 for n in _nodes(plan) if n == "Exchange")


def count_broadcast_joins(plan: str) -> int:
    return sum(1 for n in _nodes(plan) if n == "BroadcastHashJoin")


def has_take_ordered(plan: str) -> bool:
    return "TakeOrderedAndProject" in plan


def pushed_filters(plan: str) -> list[str]:
    return [
        line.split("PushedFilters:", 1)[1].strip()
        for line in plan.splitlines()
        if "PushedFilters:" in line
    ]


def read_schemas(plan: str) -> list[str]:
    return [
        line.split("ReadSchema:", 1)[1].strip()
        for line in plan.splitlines()
        if "ReadSchema:" in line
    ]
