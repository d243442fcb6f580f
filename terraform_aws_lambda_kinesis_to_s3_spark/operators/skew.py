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
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase skew-resistant aggregation.

    ``partials``: (aggregate_column_expr, alias) computed per
    (keys, salt). ``merges``: (merge_fn_name, alias) applied over the
    partial columns per keys — e.g. ``("sum", "cnt")`` re-sums partial
    counts.

    The salt is ``pmod(hash(salt_cols), salt_buckets)`` over the full
    row by default — deterministic for a given row *content* (stable
    across runs, partitionings and engines), and it spreads a hot key's
    rows across buckets as long as any non-key attribute varies.
    Semantics are exact either way: the merge phase re-combines
    partials regardless of how rows landed in buckets.
    """
    cols = salt_cols if salt_cols is not None else df.columns
    salted = df.withColumn(
        "__salt",
        F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(salt_buckets)).cast("int"),
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(alias) for expr, alias in partials]
    )
    merged = partial.groupBy(*keys).agg(
        *[getattr(F, fn)(alias).alias(alias) for fn, alias in merges]
    )
    return merged


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_buckets: int = 16,
    salt_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant fact-dim equi join: salt the fact side, replicate
    the dim side.

    When one join key owns a disproportionate share of the fact rows, a
    plain shuffle join pins that key's entire volume on one task. The
    classic manual fix (for when the dim side is too big to broadcast
    but AQE skew splitting doesn't apply — e.g. under a stateful
    operator): the fact side gets a deterministic content salt in
    [0, N), the dim side is exploded N-fold, and the join key becomes
    (key, salt) — every hot key now spreads over N tasks. Exact same
    rows as the unsalted join; the cost is an N-fold dim replication,
    so pick N ~ (hot-key volume / target-task volume) and keep the dim
    side the small one.
    """
    cols = salt_cols if salt_cols is not None else fact.columns
    salted_fact = fact.withColumn(
        "__salt",
        F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(salt_buckets)).cast("int"),
    )
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    joined = salted_fact.join(
        replicated_dim,
        (salted_fact[fact_key] == replicated_dim[dim_key])
        & (salted_fact["__salt"] == replicated_dim["__salt"]),
        how,
    )
    return joined.drop("__salt")
