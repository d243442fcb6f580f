"""Skew-aware aggregation: salted two-phase groupBy.

At 100 TB a handful of hot keys (a viral log_type, a bot user_id) can
pin a single reducer. The standard fix when AQE's skew handling isn't
enough (e.g. for stateful aggs): salt the key into N subkeys, partial-
aggregate per (key, salt), then merge partials per key. Both shuffles
move partial rows only — the hot key's work spreads across N tasks.

The transform preserves exact semantics for any algebraic aggregate
expressed as (partial, merge) pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partials: list[tuple[Column, str]],
    merges: list[tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-resistant aggregation.

    ``partials``: (aggregate_column_expr, alias) computed per
    (keys, salt). ``merges``: (merge_fn_name, alias) applied over the
    partial columns per keys — e.g. ``("sum", "cnt")`` re-sums partial
    counts. Deterministic salt (hash of a uniform random column would
    also do; monotonically_increasing_id keeps it reproducible).
    """
    salted = df.withColumn(
        "__salt", (F.monotonically_increasing_id() % salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(alias) for expr, alias in partials]
    )
    merged = partial.groupBy(*keys).agg(
        *[getattr(F, fn)(alias).alias(alias) for fn, alias in merges]
    )
    return merged
