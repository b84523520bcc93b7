"""Data-contract validation: declarative row-level expectations
evaluated in one pass.

The observability layer a pipeline runs before publishing a table:
each rule is a boolean Column ("violation when false"), and the report
counts rows, violations per rule, and rows failing ANY rule. All rules
evaluate inside a single map-side-combinable aggregation — one scan,
one 1-row-ish shuffle, no Python — so at 100 TB the contract check
costs one pass over the data regardless of rule count.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def violations_report(
    df: DataFrame,
    rules: Mapping[str, Column],
    group_by: tuple[str, ...] = (),
) -> DataFrame:
    """Per-group contract report: ``n_rows``, one ``v_<rule>`` violation
    count per rule, and ``n_bad`` (rows violating at least one rule).

    A NULL rule result counts as a violation — contracts are
    three-valued-logic-hostile on purpose (an unexpected NULL in a
    checked expression is itself a data problem).
    """
    if not rules:
        raise ValueError("violations_report: rules must be non-empty")
    ok = {name: F.coalesce(cond, F.lit(False)) for name, cond in rules.items()}
    any_bad = None
    for cond in ok.values():
        bad = ~cond
        any_bad = bad if any_bad is None else (any_bad | bad)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    aggs += [
        F.sum((~cond).cast("long")).alias(f"v_{name}") for name, cond in ok.items()
    ]
    aggs.append(F.sum(any_bad.cast("long")).alias("n_bad"))
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)
