"""Data-contract expectation checks — the validation gate a pipeline
runs before publishing a table (the dbt-test / Great-Expectations
surface, engine-native).

One operator, five rule kinds:

- ``not_null(col)`` — NULL count.
- ``in_range(col, lo, hi)`` — values outside [lo, hi] (NULLs are the
  not_null rule's job, not double-counted here).
- ``accepted_values(col, values)`` — values outside the enum.
- ``unique(cols)`` — excess rows beyond one per distinct key
  (``count(*) − count(distinct key)``).
- ``foreign_key(col, dim, dim_col)`` — fact keys absent from the
  dimension.

Shape at scale: every row-level rule (not_null / in_range /
accepted_values / unique) evaluates inside ONE aggregation over a
single scan — conditional counts and a distinct count are just more
aggregate expressions, so adding rules adds zero passes. Each
foreign-key rule is one broadcast-anti-join count against the (small)
dimension's key set. Output is |rules| rows; deterministic, so the
whole report has a value-exact DuckDB oracle in queries.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "Rule",
    "not_null",
    "in_range",
    "accepted_values",
    "unique",
    "foreign_key",
    "expectation_report",
]


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str
    col: str = ""
    lo: float | None = None
    hi: float | None = None
    values: tuple = ()
    cols: tuple = ()
    dim: DataFrame | None = field(default=None, compare=False)
    dim_col: str = ""


def not_null(col: str) -> Rule:
    return Rule(name=f"not_null:{col}", kind="not_null", col=col)


def in_range(col: str, lo: float, hi: float) -> Rule:
    return Rule(
        name=f"in_range:{col}[{lo},{hi}]", kind="in_range",
        col=col, lo=lo, hi=hi,
    )


def accepted_values(col: str, values: list) -> Rule:
    return Rule(
        name=f"accepted_values:{col}", kind="accepted_values",
        col=col, values=tuple(values),
    )


def unique(cols: list[str]) -> Rule:
    return Rule(
        name=f"unique:{','.join(cols)}", kind="unique", cols=tuple(cols)
    )


def foreign_key(col: str, dim: DataFrame, dim_col: str) -> Rule:
    return Rule(
        name=f"foreign_key:{col}", kind="foreign_key",
        col=col, dim=dim, dim_col=dim_col,
    )


def _agg_expr(rule: Rule) -> Column:
    c = F.col(rule.col) if rule.col else None
    if rule.kind == "not_null":
        return F.count(F.when(c.isNull(), 1))
    if rule.kind == "in_range":
        bad = c.isNotNull() & ~c.between(F.lit(rule.lo), F.lit(rule.hi))
        return F.count(F.when(bad, 1))
    if rule.kind == "accepted_values":
        bad = c.isNotNull() & ~c.isin(*rule.values)
        return F.count(F.when(bad, 1))
    if rule.kind == "unique":
        key = F.struct(*[F.col(k) for k in rule.cols])
        return F.count(F.lit(1)) - F.count_distinct(key)
    raise ValueError(f"not an aggregate rule: {rule.kind}")


def expectation_report(
    spark: SparkSession, df: DataFrame, rules: list[Rule]
) -> DataFrame:
    """Evaluate ``rules`` against ``df``; returns (rule, violations,
    passed) — one row per rule, in the given rule order is NOT
    guaranteed (sort on read). All aggregate rules share ONE scan; each
    foreign-key rule adds one broadcast-anti-join count.
    """
    if not rules:
        raise ValueError("no rules")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")
    agg_rules = [r for r in rules if r.kind != "foreign_key"]
    fk_rules = [r for r in rules if r.kind == "foreign_key"]
    counts: dict[str, int] = {}
    if agg_rules:
        row = df.agg(
            *[
                _agg_expr(r).alias(f"__r{i}")
                for i, r in enumerate(agg_rules)
            ]
        ).first()
        for i, r in enumerate(agg_rules):
            counts[r.name] = int(row[f"__r{i}"])
    for r in fk_rules:
        keys = r.dim.select(
            F.col(r.dim_col).alias(r.col)
        ).distinct()
        counts[r.name] = (
            df.filter(F.col(r.col).isNotNull())
            .join(F.broadcast(keys), r.col, "left_anti")
            .count()
        )
    return spark.createDataFrame(
        [(r.name, counts[r.name], counts[r.name] == 0) for r in rules],
        "rule string, violations long, passed boolean",
    )
