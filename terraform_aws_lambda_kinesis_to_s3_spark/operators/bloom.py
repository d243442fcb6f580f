"""Deterministic Bloom-filter semi-join (Tier B, scale path).

The 100 TB problem this solves: a fact table needs a semi-join against
a key set that is too large to broadcast as rows and too small to
justify shuffling the fact table (the reference's whitelist filter,
`lambda/main.py:32-36`, is the 5-entry degenerate case of the same
idea). A Bloom filter compresses the key set to a few KB of bit
positions that CAN be broadcast, turning the semi-join into a map-only
filter over the fact scan — no fact shuffle at all. False positives
let through a bounded fraction (~(1-e^{-kn/m})^k); false negatives are
impossible, so a cheap exact join on the pre-filtered survivors (now a
tiny table) finishes the job when exactness matters.

Spark's own runtime Bloom pruning (`spark.sql.optimizer.runtime.
bloomFilter.enabled`) does this engine-internally and
non-reproducibly; this operator builds the filter from md5-derived
positions so the surviving multiset (false positives included) is a
pure function of the data — DuckDB computes the identical result and
the oracle hash-checks an *approximate* operator exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: filter geometry (mirrored in the oracle SQL): m bits, k hash rows.
BLOOM_M = 4096
BLOOM_K = 3


def bloom_positions(col: F.Column, k: int = BLOOM_K, m: int = BLOOM_M) -> list[F.Column]:
    """The k bit positions of a value: md5 of the row-tagged value,
    first 8 hex chars (32 bits) mod m. Same construction as
    `sketches.cms_bucket`; any engine computes identical positions."""
    return [
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"b{j}|"), col.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % m
        for j in range(k)
    ]


def bloom_build(
    keys: DataFrame, key_col: str, k: int = BLOOM_K, m: int = BLOOM_M
) -> DataFrame:
    """Build the filter: 1-row DataFrame holding the sorted array of
    set bit positions (bounded by m, i.e. a few KB — broadcastable no
    matter how many keys went in). Distinct positions are reduced with
    map-side combine before the single tiny agg."""
    pos = keys.select(
        F.explode(F.array(*bloom_positions(F.col(key_col), k, m))).alias("p")
    ).distinct()
    return pos.agg(F.array_sort(F.collect_set("p")).alias("__bloom"))


def bloom_semi_filter(
    fact: DataFrame,
    key_col: str,
    bloom: DataFrame,
    k: int = BLOOM_K,
    m: int = BLOOM_M,
) -> DataFrame:
    """Keep fact rows whose key tests positive in the filter: all k
    positions present. Plan: broadcast the 1-row filter, then a
    map-only `array_contains` conjunction fused into the fact scan's
    codegen stage — zero shuffle of the fact table."""
    conds = [
        F.array_contains(F.col("__bloom"), p)
        for p in bloom_positions(F.col(key_col), k, m)
    ]
    out = fact.crossJoin(F.broadcast(bloom))
    for c in conds:
        out = out.filter(c)
    return out.drop("__bloom")
