"""Deterministic cardinality / sampling sketches (Tier B).

Training-data pipelines need distinct-count estimates and weighted
samples over corpora far too large for exact ``COUNT(DISTINCT)`` or a
driver-side sample. Spark's builtins (``approx_count_distinct`` /
HyperLogLog++, ``sample()``) are engine-private and non-reproducible
across engines and partitionings, so their results can't be
oracle-checked and won't survive a rerun bit-for-bit. These operators
instead build the sketch from an md5-derived uniform hash:

- the estimate is a pure function of the DATA (stable across runs,
  partition counts and engines — DuckDB computes the identical value),
- everything stays JVM-side Catalyst (md5 / conv / window / agg),
- each stage is bounded: no per-group state larger than O(k).

KMV (k-minimum-values) estimator: hash every value to uniform (0,1);
the k-th smallest hash h_(k) over a group's distinct values estimates
the distinct count as (k-1)/h_(k) (Bar-Yossef et al. 2002, standard
relative error ~1/sqrt(k-2)). Groups with fewer than k distinct values
report the exact count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 16^15 — the md5 prefix domain; 15 hex chars fit a signed long.
_HASH_DOMAIN = float(16**15)


def uniform_hash(col: F.Column) -> F.Column:
    """Map a value to a deterministic uniform double in [0, 1):
    first 15 hex chars of md5 (60 bits — fits a long), divided by
    16^15. Both sides of the division are exact in IEEE double up to
    the final rounding, so any engine computes the identical double.
    """
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")
        / F.lit(_HASH_DOMAIN)
    )


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 128,
    prune_salts: int = 32,
) -> DataFrame:
    """Per-group distinct-count estimate via a k-minimum-values sketch.

    Plan (all bounded, no O(group) state anywhere):
      1. distinct (group, hash) — one hash-shuffle, map-side combine;
      2. keep the k smallest hashes within each (group, salt) sub-bucket
         (``row_number`` window over group x ``prune_salts`` salts) — the
         per-task sort covers only a 1/salts slice of each group;
      3. keep the k smallest of the surviving <= k*salts rows per group
         (tiny second window);
      4. estimate (k-1)/h_(k), or the exact count when the group has
         fewer than k distinct values.

    Returns ``group_cols + [n_distinct_est]`` with the estimate rounded
    to 2 decimals (stable for oracle hashing).
    """
    h = uniform_hash(F.col(value_col)).alias("__h")
    distinct = df.select(*group_cols, h).dropDuplicates([*group_cols, "__h"])
    salted = distinct.withColumn(
        "__salt", F.pmod(F.hash("__h"), F.lit(prune_salts))
    )
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy("__h")
    pruned = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .drop("__salt", "__rn")
    )
    w2 = Window.partitionBy(*group_cols).orderBy("__h")
    topk = pruned.withColumn("__rn", F.row_number().over(w2)).filter(
        F.col("__rn") <= k
    )
    return topk.groupBy(*group_cols).agg(
        F.round(
            F.when(F.count("*") < k, F.count("*").cast("double")).otherwise(
                F.lit(float(k - 1)) / F.max("__h")
            ),
            2,
        ).alias("n_distinct_est")
    )


#: HyperLogLog geometry: b register-index bits -> m = 2^b registers.
HLL_B = 8
HLL_M = 1 << HLL_B
#: alpha_m bias constant for m >= 128 (Flajolet et al. 2007). Written as
#: the same literal formula the oracle SQL uses so both engines compute
#: the identical double.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_register_rank(col: F.Column) -> tuple[F.Column, F.Column]:
    """(register, rank) of a value in a deterministic HyperLogLog:
    md5 hex chars 1-2 (8 bits) pick one of 256 registers; chars 3-15
    (52 bits) feed the rank = leading-zero-bits + 1 (1..53).

    Leading zeros are counted on the HEX STRING (whole leading '0'
    digits x 4, plus a CASE on the first non-zero digit) instead of
    floor(log2(...)) — string counting is exact on every engine, while
    log2 can round across an integer boundary at the bit edges.
    """
    h = F.md5(col.cast("string"))
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    stripped = F.regexp_replace(F.substring(h, 3, 13), "^0+", "")
    first = F.substring(stripped, 1, 1)
    in_digit = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rank = F.when(F.length(stripped) == 0, F.lit(53)).otherwise(
        (F.lit(13) - F.length(stripped)) * 4 + in_digit + 1
    )
    return reg, rank


def hll_distinct(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Per-group distinct-count estimate via a deterministic
    HyperLogLog (Flajolet-Fuss-Gandouet-Meunier 2007) with the
    small-range linear-counting correction.

    Scale shape — this is THE cardinality sketch for 100 TB:
      1. map-side: (register, rank) per row — no shuffle yet;
      2. one hash-shuffle to groupBy(group, register) -> max(rank),
         with map-side partial max, so at most |groups| x 256 rows
         cross the wire regardless of input size;
      3. |groups|-row final agg.
    (Contrast KMV in this module: same guarantee but its top-k pruning
    needs two window stages; HLL is a pure two-level agg.)

    Cross-engine determinism: the harmonic-mean denominator
    sum(2^-rank) is summed as an INTEGER numerator over denominator
    2^53 (each term 2^(53-rank) is an exact long; 256 terms fit in 62
    bits), so the estimate is a pure function of the data with no
    float-summation-order dependence. DuckDB computes the identical
    value; `SQL_HLL_DISTINCT_USERS` mirrors this construction.

    Returns ``group_cols + [hll_est]`` (rounded to 2 decimals).
    """
    reg, rank = hll_register_rank(F.col(value_col))
    per_reg = (
        df.select(*group_cols, reg.alias("__reg"), rank.alias("__rank"))
        .groupBy(*group_cols, "__reg")
        .agg(F.max("__rank").alias("__mrank"))
    )
    return hll_estimate_from_registers(per_reg, group_cols)


def hll_estimate_from_registers(
    per_reg: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Estimate from a (group_cols..., __reg, __mrank) max-rank register
    table — the combine step of ``hll_distinct``, exposed so STORED
    registers can be re-estimated: the streaming monitor
    (streaming/sketches.py) persists per-batch partial registers and
    max-merges them here, which is exactly how a 1000-executor cluster
    merges per-partition sketches.  Same exact-integer harmonic sum and
    both correction branches as ``hll_distinct`` (this IS that code,
    factored out)."""
    group_cols = group_cols or []
    m = HLL_M
    two53 = F.lit(1 << 53).cast("long")
    # max-merge first: partials may carry the same register several
    # times (one row per micro-batch / per partition); max is
    # idempotent, so already-merged input passes through unchanged
    merged = per_reg.groupBy(*group_cols, "__reg").agg(
        F.max("__mrank").alias("__mrank")
    )
    agg = merged.groupBy(*group_cols).agg(
        F.sum(
            # 2^(53 - rank) as an exact long (pow is exact for e <= 53)
            F.pow(F.lit(2.0), F.lit(53) - F.col("__mrank")).cast("long")
        ).alias("__numer_present"),
        F.count("*").alias("__present"),
    )
    v = F.lit(m) - F.col("__present")  # zero registers
    numer = F.col("__numer_present") + v.cast("long") * two53
    raw = F.lit(HLL_ALPHA * m * m) * two53.cast("double") / numer.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 2).alias("hll_est"))


#: count-min sketch geometry (mirrored in oracle SQL)
CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_bucket(col: F.Column, row: int, width: int = CMS_WIDTH) -> F.Column:
    """Deterministic bucket of ``col`` in hash row ``row``: md5 of the
    row-tagged value, first 8 hex chars mod width. Any engine computes
    the identical bucket, so the sketch itself is oracle-checkable."""
    tagged = F.concat(F.lit(f"r{row}|"), col.cast("string"))
    return (
        F.conv(F.substring(F.md5(tagged), 1, 8), 16, 10).cast("long") % width
    )


def cms_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-min sketch of a value stream (Cormode & Muthukrishnan 2005):
    ``depth`` independent hash rows x ``width`` buckets; each cell holds
    the count of values hashing into it.

    The sketch is ONE aggregation of at most ``depth * width`` cells —
    constant output size no matter the input scale; the per-row
    explode(depth) is map-side. Point estimate for a value = min over
    rows of its cell counts (biased high, never low).

    Returns (row, bucket, cnt).
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("row"),
                cms_bucket(F.col(value_col), r, width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate counts for a (small) candidate set against a CMS
    sketch: equi-join each candidate's ``depth`` cells, take the min.
    The sketch and candidates are both tiny — Catalyst broadcasts."""
    probes = candidates.select(
        value_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row"),
                        cms_bucket(F.col(value_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c"),
    ).select(value_col, "c.row", "c.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(value_col)
        .agg(F.min("cnt").alias("cms_estimate"))
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    rate: float,
) -> DataFrame:
    """Deterministic weighted Bernoulli sample: row i is kept iff
    ``uniform_hash(key_i) < rate * w_i / max(w)`` — inclusion
    probability proportional to weight (the max-weight row is kept with
    probability ``rate``), reproducible across runs and engines.

    Map-only except a 1-row global-max broadcast; this is how you
    importance-sample a 100 TB corpus by quality score without a
    shuffle of the corpus itself.
    """
    maxw = df.agg(F.max(F.col(weight_col).cast("double")).alias("__maxw"))
    u = uniform_hash(F.col(key_col))
    return (
        df.crossJoin(F.broadcast(maxw))
        .filter(
            u < F.lit(rate) * F.col(weight_col).cast("double") / F.col("__maxw")
        )
        .drop("__maxw")
    )
