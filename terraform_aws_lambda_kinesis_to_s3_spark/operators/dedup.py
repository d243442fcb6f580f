"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Tier B (SURVEY.md §2.2) — training-data-pipeline dedup at 100 TB scale:

- **exact**: hash-groupBy on a normalized fingerprint. One shuffle on
  the fingerprint; AQE handles skew (a viral duplicate is exactly a
  skewed key).
- **MinHash + banded LSH**: shingle -> K minhashes -> B bands; only
  docs sharing a band bucket become candidate pairs, then candidates
  are verified with exact Jaccard. The candidate join is an equi-join
  on (band_index, band_hash) — shuffle-partitionable, never a cross
  join, which is the whole point at scale.
- **SimHash**: 32-bit signature from per-token hash bits; identical
  signatures bucket together (hamming-0 variant — hamming-k would probe
  rotated tables the same way).
- **n-gram Jaccard**: exact pairwise similarity via an equi-join on
  shingles (inverted-index style), feasible when shingle frequency is
  bounded; the LSH path is the scale fallback.

Hashes are md5-based (not Spark's ``hash()``/``xxhash64``) so the
DuckDB oracle can reproduce them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_s3_spark import cachereg as CR

from terraform_aws_lambda_kinesis_to_s3_spark.operators.textops import (
    fingerprint,
    shingles,
)

MINHASH_K = 16  # signature length
MINHASH_BANDS = 4  # bands of K/BANDS rows each
SIMHASH_BITS = 32

#: affine minhash family h_s(x) = (A[s]*x + B[s]) mod MINHASH_P over a
#: 32-bit base hash — one md5 per shingle instead of K. Constants are
#: md5-derived so the DuckDB oracle embeds the same literals.
MINHASH_P = 4294967291  # largest 32-bit prime
_md5int = lambda s, n: int(__import__("hashlib").md5(s.encode()).hexdigest()[:n], 16)  # noqa: E731
MINHASH_A = tuple(_md5int(f"a{s}", 7) | 1 for s in range(MINHASH_K))
MINHASH_B = tuple(_md5int(f"b{s}", 7) for s in range(MINHASH_K))


def exact_dedup(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Exact dedup: ``dropDuplicates`` on the given columns (one hash
    shuffle; map-side partial aggregation built in)."""
    return df.dropDuplicates(cols) if cols else df.dropDuplicates()


def dup_groups(df: DataFrame, key: Column, id_col: str = "doc_id") -> DataFrame:
    """Duplicate-group summary for a normalized key column: one row per
    key with >1 members (group size + member ids)."""
    return (
        df.select(key.alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_dups"),
            F.sort_array(F.collect_list(id_col)).alias("members"),
        )
        .filter(F.col("n_dups") > 1)
    )


def doc_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, shingle) exploded pairs — the inverted index both the exact
    Jaccard and MinHash paths build on.

    Tokens are materialized into a column *before* the shingle
    transform: passing the raw ``split()`` expression into the lambda
    would inline (and re-evaluate) the tokenizer once per shingle
    element.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), r"\s+").alias("toks"),
    )
    t = F.col("toks")
    count = F.size(t) - (n - 1)
    arr = F.when(count < 1, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            )
        )
    )
    return toks.select("doc_id", F.explode(arr).alias("sh"))


def shingle_arrays(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc_id, sh_arr, n_sh): the per-doc DISTINCT shingle set as an
    in-row array — built map-only, feeding the in-row minhash
    signatures and the array-intersect Jaccard verify. Same shingle
    space as ``doc_shingles`` (which explodes this array)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), r"\s+").alias("toks"),
    )
    t = F.col("toks")
    count = F.size(t) - (n - 1)
    arr = F.when(count < 1, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            )
        )
    )
    return toks.select("doc_id", arr.alias("sh_arr")).select(
        "doc_id", "sh_arr", F.size("sh_arr").alias("n_sh")
    )


def minhash_signatures_inrow(arr_df: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """doc_id -> mh_0..mh_{k-1}, computed entirely IN-ROW: one md5 per
    shingle into a base-hash array, then the K affine mins via
    ``array_min`` over cheap integer transforms.

    ZERO shuffles — at 100 TB the signature stage is map-only, where
    the exploded ``groupBy(doc_id)`` formulation shuffles the whole
    |shingles| index to compute the same minima. Identical values to
    ``minhash_signatures`` (same base hash, same affine family, same
    min semantics); docs with no shingles drop out in both.
    """
    based = arr_df.withColumn(
        "hb",
        F.transform(
            "sh_arr",
            lambda x: F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long"),
        ),
    )
    # one-arg closure per hash fn: PySpark introspects lambda arity and
    # binds a Column per parameter, so a `s=s` default arg would be
    # misread as a second lambda variable
    def _affine(s: int):
        a, b = MINHASH_A[s], MINHASH_B[s]
        return lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_P

    sig_cols = [
        F.array_min(F.transform("hb", _affine(s))).alias(f"mh_{s}")
        for s in range(k)
    ]
    return based.filter(F.col("n_sh") >= 1).select("doc_id", *sig_cols, "n_sh")


def jaccard_on_pairs_arrays(
    pairs: DataFrame, arr_df: DataFrame, threshold: float = 0.0
) -> DataFrame:
    """Exact Jaccard for candidate pairs via in-row ``array_intersect``
    of the per-doc shingle arrays. The (small) pair list broadcasts
    into two joins against the array table, so the corpus side streams
    map-only and only matching docs' arrays survive — the verify cost
    scales with the candidate set, and no exploded index is ever
    shuffled (contrast ``jaccard_on_pairs``, which self-joins the
    shingle index).  Zero-overlap candidates (jaccard = 0.0) are
    dropped even at threshold=0 so the output domain matches
    ``jaccard_on_pairs``, whose inner equi-join on shingles can never
    emit a pair with no common shingle."""
    a = arr_df.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh_arr").alias("__sa"),
        F.col("n_sh").alias("n_a"),
    )
    b = arr_df.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh_arr").alias("__sb"),
        F.col("n_sh").alias("n_b"),
    )
    j = F.broadcast(pairs).join(a, "doc_a").join(b, "doc_b")
    out = (
        j.withColumn("n_common", F.size(F.array_intersect("__sa", "__sb")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .drop("__sa", "__sb")
    )
    out = out.filter(F.col("n_common") >= 1)
    return out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out


def minhash_signatures(sh_df: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """doc_id -> mh_0..mh_{k-1} minhash signature.

    One md5 per shingle yields a 32-bit base hash; the K hash functions
    are the affine family (A[s]*base + B[s]) mod P — products stay
    under 2^60, exact in int64 in any engine. One shuffle (groupBy
    doc_id) computes all K mins as parallel aggregates.
    """
    base = F.conv(F.substring(F.md5(F.col("sh")), 1, 8), 16, 10).cast("long")
    aggs = [
        F.min((F.lit(MINHASH_A[s]) * base + F.lit(MINHASH_B[s])) % MINHASH_P).alias(
            f"mh_{s}"
        )
        for s in range(k)
    ]
    # n_sh rides along so downstream Jaccard verification reuses this
    # shuffle instead of re-aggregating the shingle index
    return sh_df.groupBy("doc_id").agg(*aggs, F.count("*").alias("n_sh"))


def lsh_bands(
    sig_df: DataFrame, k: int = MINHASH_K, bands: int = MINHASH_BANDS
) -> DataFrame:
    """(doc_id, band, band_hash): hash of each band's minhash slice.

    Single-pass: one explode over an inline array of band structs — a
    union of per-band selects would re-execute the signature pipeline
    once per band.
    """
    rows_per = k // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "|", *[F.col(f"mh_{b * rows_per + r}") for r in range(rows_per)]
                )
            ).alias("band_hash"),
        )
        for b in range(bands)
    ]
    return sig_df.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bh")
    ).select("doc_id", F.col("bh.band").alias("band"), F.col("bh.band_hash").alias("band_hash"))


def lsh_candidate_pairs(band_df: DataFrame) -> DataFrame:
    """Distinct candidate (doc_a < doc_b) pairs sharing any band bucket.

    Equi-join on (band, band_hash): shuffle-partitioned by bucket, so
    work scales with bucket sizes, not with |docs|^2.
    """
    a = band_df.alias("a")
    b = band_df.alias("b")
    return (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def jaccard_on_pairs(
    pairs: DataFrame, sh_df: DataFrame, threshold: float = 0.0, sizes: DataFrame | None = None
) -> DataFrame:
    """Exact Jaccard for given candidate pairs from the shingle index.

    The shingle index is semi-filtered to docs appearing in any
    candidate pair *before* the equi-join — the verify cost scales
    with the candidate set, not the corpus. Pass ``sizes`` (doc_id,
    n_sh) to reuse an existing aggregation (minhash signatures carry
    it) instead of re-counting the index.
    """
    if sizes is None:
        sizes = sh_df.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sizes = sizes.select("doc_id", "n_sh")
    cand_docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh_c = sh_df.join(F.broadcast(cand_docs), "doc_id", "left_semi")
    a = sh_c.alias("sa")
    b = sh_c.alias("sb")
    common = (
        a.join(b, F.col("sa.sh") == F.col("sb.sh"))
        .filter(F.col("sa.doc_id") < F.col("sb.doc_id"))
        .select(
            F.col("sa.doc_id").alias("doc_a"), F.col("sb.doc_id").alias("doc_b")
        )
        .join(pairs, ["doc_a", "doc_b"], "left_semi")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n_sh", "n_a")
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "n_sh", "n_b"
            ),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
    )
    return out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out


def _shingle_common_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    max_df: int | None,
) -> tuple[DataFrame, DataFrame]:
    """Shared candidate machinery for the set-overlap dedup metrics:
    (pairwise common-shingle counts, per-doc shingle sizes) over the
    optionally DF-capped shingle space. ngram_jaccard_pairs and
    containment_pairs differ ONLY in how they score these two tables —
    keeping the DF-cap semi-join, the sizes, and the doc_id< ordering
    in one place so the metrics cannot silently diverge."""
    sh = doc_shingles(df, id_col, text_col, n)
    if max_df is not None:
        keep = (
            sh.groupBy("sh")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_df)
            .select("sh")
        )
        sh = sh.join(keep, "sh", "left_semi")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("sa")
    b = sh.alias("sb")
    common = (
        a.join(b, F.col("sa.sh") == F.col("sb.sh"))
        .filter(F.col("sa.doc_id") < F.col("sb.doc_id"))
        .groupBy(
            F.col("sa.doc_id").alias("doc_a"), F.col("sb.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    return common, sizes


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (inverted-index equi-join).

    The self-join's cost is sum(df^2) over shingle document
    frequencies: one boilerplate shingle appearing in 1M docs creates
    10^12 candidate rows. ``max_df`` is the standard fix — shingles in
    more than ``max_df`` docs are dropped from the shingle space
    (CountVectorizer-maxDF-style), and the Jaccard is computed over the
    surviving shingles (both the intersection AND the set sizes), so
    the result remains a well-defined, deterministic similarity on the
    DF-filtered space. Hot shingles carry almost no pair information
    (every doc shares them); their removal bounds the worst case at
    sum(min(df, max_df)^2) while moving near-dup scores only slightly.
    ``max_df=None`` keeps the exact unfiltered semantics.

    Derived from ``ngram_pair_stats`` (the single construction of the
    sizes-join and 6-dp jaccard) so the scorers cannot drift; the
    filter/select collapse into the same physical plan (joins,
    exchanges and aggregates identical — only attribute aliases
    differ)."""
    return (
        ngram_pair_stats(df, id_col, text_col, n, max_df)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Asymmetric containment near-dup pairs (Broder's C(A,B) =
    |A∩B| / |A| over n-gram shingle sets): the metric that catches a
    SHORT doc quoted inside a LONG one, which symmetric Jaccard dilutes
    (|A∩B|/|A∪B| → 0 as the long side grows). Same inverted-index
    equi-join and ``max_df`` DF-cap as ngram_jaccard_pairs — the
    candidate plan is shared shape, only the scoring differs — and a
    pair survives when EITHER direction's containment clears the
    threshold. Emits both directions so the caller can tell container
    from contained.

    Derived from ``ngram_pair_stats`` (the single construction of the
    pair statistics): the threshold filter runs on the UNROUNDED
    n_common/n_a and n_common/n_b ratios, rounding only for output —
    the same contract as the original inline form, over the same
    integer divisions."""
    stats = ngram_pair_stats(df, id_col, text_col, n, max_df)
    ca = F.col("n_common") / F.col("n_a")
    cb = F.col("n_common") / F.col("n_b")
    return (
        stats.filter(F.greatest(ca, cb) >= threshold)
        .select(
            "doc_a",
            "doc_b",
            F.round(ca, 6).alias("containment_a"),
            F.round(cb, 6).alias("containment_b"),
        )
    )


def ngram_pair_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """The FULL per-pair statistics table over the (optionally
    DF-capped) shingle space: (doc_a, doc_b, n_common, n_a, n_b,
    jaccard) for every shingle-sharing pair — the common superset
    every set-overlap scorer derives from.  jaccard is 6-dp-rounded
    exactly as in ngram_jaccard_pairs; containment_a/b are
    n_common/n_a and n_common/n_b, divisions of the SAME integers
    containment_pairs computes, so a consumer deriving either metric
    from this table is bit-identical to calling the dedicated
    operator (pinned in test_ngram_pair_stats_equivalence).  Exists
    so a session-shared persisted stage can serve Jaccard,
    threshold-sweep AND containment consumers from one build."""
    common, sizes = _shingle_common_counts(df, id_col, text_col, n, max_df)
    return (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n_sh", "n_a")
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "n_sh", "n_b"
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            "n_a",
            "n_b",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """32-bit SimHash per doc from per-token md5 bits.

    Exploded tokens -> one groupBy computing all 32 bit-majorities as
    parallel aggregates (single shuffle).
    """
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"),
    )
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    tok = tok.withColumn("h", h)
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"b{b}")
        for b in range(SIMHASH_BITS)
    ]
    sums = tok.groupBy("doc_id").agg(*bit_aggs)
    sig = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{b}") > 0, F.lit(2**b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig + term
    return sums.select("doc_id", sig.alias("simhash"))


def simhash_hamming_pairs(
    df: DataFrame,
    k: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Near-dup pairs at hamming distance <= ``k`` between SimHash
    signatures (the hamming-k probe the hamming-0 bucketing lacks).

    Pigeonhole band probing: the ``bits``-bit signature splits into
    ``k+1`` disjoint bit-bands; two signatures within hamming ``k``
    must agree *exactly* on at least one band (k flipped bits can dirty
    at most k bands). Candidates are therefore an equi-join on
    (band, band_bits) — shuffle-partitioned by band bucket, never
    all-pairs — then verified exactly with ``bit_count(xor) <= k``.
    The same shape as MinHash-LSH banding: candidate cost scales with
    band-bucket sizes, verify cost with the candidate set.
    """
    return simhash_hamming_pairs_on_sig(simhash(df, id_col, text_col), k, bits)


def simhash_hamming_pairs_on_sig(
    sig: DataFrame, k: int = 2, bits: int = SIMHASH_BITS
) -> DataFrame:
    """`simhash_hamming_pairs` banding+verify over a PRECOMPUTED
    ``(doc_id, simhash)`` table — the seam that lets several consumers
    share one persisted signature stage (the tokenize-and-bit-majority
    groupBy is the expensive part; banding is O(docs × (k+1)))."""
    nb = k + 1
    widths = [bits // nb + (1 if b < bits % nb else 0) for b in range(nb)]
    starts = [sum(widths[:b]) for b in range(nb)]
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), starts[b])
            .bitwiseAND(F.lit((1 << widths[b]) - 1))
            .alias("bv"),
        )
        for b in range(nb)
    ]
    banded = sig.select(
        "doc_id", "simhash", F.explode(F.array(*band_structs)).alias("bh")
    ).select("doc_id", "simhash", F.col("bh.band").alias("band"), F.col("bh.bv").alias("bv"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, ["band", "bv"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= k)
        .select("doc_a", "doc_b", "hamming")
    )


def cluster_pairs(
    pairs: DataFrame, max_iter: int = 20, driver_side_limit: int = 5_000_000
) -> DataFrame:
    """Connected components over near-dup pairs -> (doc_id, cluster_id).

    Two regimes:

    - **small edge sets** (< ``driver_side_limit`` pairs — the common
      case after LSH pruning): union-find on the driver. Iterative
      Spark rounds cost seconds of scheduling each; for a few million
      edges a single collect is strictly faster and exact.
    - **large**: iterative min-label propagation — every node adopts
      the smallest cluster id among itself and its neighbors, one
      join + one aggregate per round, converging in O(diameter)
      rounds. Edges are persisted once; lineage is truncated per
      round with ``localCheckpoint`` so plans don't grow.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
        .persist()
    )
    CR.track(edges)
    # size probe stays distributed: limit+count moves one number to the
    # driver (a take() here would collect up to limit+1 rows — the OOM
    # the large regime exists to avoid)
    n_edges = edges.limit(driver_side_limit + 1).count()
    if n_edges <= driver_side_limit:
        rows = edges.collect()  # reads the cache the probe warmed
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in rows:
            parent.setdefault(r.src, r.src)
            parent.setdefault(r.dst, r.dst)
            ra, rb = find(r.src), find(r.dst)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        out = [(node, find(node)) for node in parent]
        edges.unpersist()
        # schema follows the input id type so both regimes agree (string
        # doc ids work the same as longs)
        from pyspark.sql import types as T

        id_type = pairs.schema["doc_a"].dataType
        schema = T.StructType(
            [
                T.StructField("doc_id", id_type),
                T.StructField("cluster_id", id_type),
            ]
        )
        return pairs.sparkSession.createDataFrame(out, schema)
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("n_min"))
        )
        # Checkpoint FIRST, probe convergence after (r11 optimization
        # round): probing `changed` on the un-checkpointed plan ran the
        # whole propagation round once for the probe and AGAIN for the
        # eager checkpoint — two full passes per round.  Materialize
        # once, then the probe is a cheap join of two checkpointed
        # label tables.
        new_labels = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("n_min"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
        ).localCheckpoint(eager=True)  # truncate lineage per round
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
