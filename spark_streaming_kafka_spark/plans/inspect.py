"""Inspect executed/planned physical plans.

The reference has no planner to inspect (straight-line RDD lineage,
SURVEY.md §4). In the rebuild the physical plan IS the performance story,
so tests assert on it: small-dim joins must be BroadcastHashJoin, scans
must show pushed filters and pruned schemas, hot paths must sit inside
WholeStageCodegen. A query that is correct but plans a sort-merge join
against a 5-row dims table would pass a value check and still be wrong
at 100 TB — these helpers make that a test failure instead.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """`df.explain(mode)` as a string instead of stdout."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every scan node in the plan."""
    text = explain_str(df, "formatted")
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        inner = m.group(1).strip()
        if inner:
            out.extend(p.strip() for p in inner.split(","))
    return out


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names read by scan nodes (union over scans) — verifies
    column pruning reached the file format."""
    text = explain_str(df, "formatted")
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        for field in m.group(1).split(","):
            field = field.strip()
            if field:
                cols.append(field.split(":")[0])
    return cols


def wholestage_codegen_ids(df: DataFrame) -> list[int]:
    """Distinct WholeStageCodegen span ids — wider/fewer spans == more of
    the plan fused into generated JVM code."""
    text = explain_str(df, "simple")
    return sorted({int(m) for m in re.findall(r"WholeStageCodegen \((\d+)\)", text)})
