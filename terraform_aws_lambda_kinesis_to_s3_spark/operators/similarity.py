"""Embedding similarity search (Tier B, SURVEY.md §2.2).

- **brute-force cosine top-k** — the correctness baseline: broadcast
  the (small) query set against all vectors; cosine is a JVM-side
  ``zip_with``/``aggregate`` fold over the array column (no Python in
  the hot path); top-k via window ``row_number``. At 100 TB the
  broadcast side stays small (queries), the big side streams — one
  shuffle for the per-query top-k.
- **IVF-style centroid assignment** — partition the vector space by
  nearest centroid; ANN probes only matching cells.
- **random-hyperplane LSH buckets** — deterministic md5-derived
  hyperplanes (reproducible in the DuckDB oracle); bucket = sign-bit
  concatenation. Candidate generation becomes an equi-join on bucket.

All math is done in float64 after an explicit cast from the stored
float32 so results are engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from terraform_aws_lambda_kinesis_to_s3_spark import cachereg as CR

LSH_PLANES = 12  # 4096 buckets


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Ordered left-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    ad, bd = _as_double(a), _as_double(b)
    return dot(ad, bd) / (l2_norm(ad) * l2_norm(bd))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: for each query vector the k nearest
    other vectors. Queries are broadcast; ties break on candidate id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    v = vectors.select(F.col(id_col).alias("nn_id"), F.col(vec_col).alias("vv"))
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("nn_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("vv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("nn_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "nn_id",
            F.round("cos", 4).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def label_centroids(
    vectors: DataFrame, label_col: str = "label", vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """Per-label mean vector via posexplode + groupBy (two narrow
    shuffles; at scale this is the standard mean-aggregation plan)."""
    exploded = vectors.select(
        F.col(label_col).alias("centroid_label"),
        F.posexplode(_as_double(F.col(vec_col))).alias("i", "x"),
    )
    means = exploded.groupBy("centroid_label", "i").agg(F.avg("x").alias("m"))
    return (
        means.groupBy("centroid_label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("pairs"))
        .select(
            "centroid_label",
            F.transform("pairs", lambda p: p["m"]).alias("centroid"),
        )
    )


def assign_nearest_centroid(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF cell assignment: nearest centroid by cosine, computed as an
    IN-ROW argmax — the centroid table collapses to a one-row array,
    broadcast into a cross join, and ``array_max`` over per-centroid
    (cos, -label) structs picks the winner (cos desc, label asc on
    ties, matching a row_number window) without ever shuffling the
    vector side.  Truly map-only: one narrow projection per vector,
    zero exchanges on the big side (a ``Window.partitionBy(id)``
    argmax would hash-shuffle the full vector table first)."""
    cents = centroids.agg(
        F.collect_list(
            F.struct(
                F.col("centroid_label").alias("label"),
                F.col("centroid").alias("centroid"),
            )
        ).alias("__cents")
    )
    vec = F.col(vec_col)
    best = F.array_max(
        F.transform(
            "__cents",
            lambda c: F.struct(
                cosine(vec, c["centroid"]).alias("cos"),
                (-c["label"]).alias("neg_label"),
            ),
        )
    )
    return (
        vectors.crossJoin(F.broadcast(cents))
        .withColumn("assigned_label", (-best["neg_label"]))
        .drop("__cents")
    )


def plane_weights(dim: int = 64, planes: int = LSH_PLANES) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: w[p][i] derived from
    md5(f"{p}_{i}") — reproducible in any engine with md5 (the DuckDB
    oracle recomputes the identical doubles from the same formula)."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{p}_{i}".encode()).hexdigest()[:8], 16) / float(2**32)
            - 0.5
            for i in range(dim)
        ]
        for p in range(planes)
    ]


def lsh_bucket_expr(
    vec_col: str = "embedding", dim: int = 64, planes: int = LSH_PLANES
) -> Column:
    """Random-hyperplane LSH bucket id as a pure column expression.

    The hyperplane weights are md5-derived *literals* folded JVM-side
    (``zip_with`` + ``aggregate`` per plane) — zero joins, zero row
    inflation, one narrow projection per vector. At 100 TB this is a
    map-only stage; a posexplode+join formulation inflates rows 64x
    and shuffles twice for the same arithmetic.
    """
    W = plane_weights(dim, planes)
    vd = _as_double(F.col(vec_col))
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        s = dot(vd, F.array(*[F.lit(w) for w in W[p]]))
        bucket = bucket + F.when(s > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def lsh_bucket_assign(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    planes: int = LSH_PLANES,
) -> DataFrame:
    """(id, bucket): random-hyperplane LSH bucket per vector."""
    return vectors.select(
        F.col(id_col).alias("vid"),
        lsh_bucket_expr(vec_col, dim, planes).alias("bucket"),
    )


def lsh_bucket_counts(
    vectors: DataFrame,
    spark: SparkSession | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = LSH_PLANES,
) -> DataFrame:
    """(bucket, n_vectors) histogram of random-hyperplane LSH buckets —
    one map-only bucket assignment plus a single small-key groupBy."""
    assigned = lsh_bucket_assign(vectors, id_col, vec_col, planes=planes)
    return assigned.groupBy("bucket").agg(F.count("*").alias("n_vectors"))


LSH_BANDS = 4  # bands of LSH_ND_PLANES/LSH_BANDS planes each
LSH_ND_PLANES = 16  # near-dup banding: 4 bands x 4 bits


def lsh_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = LSH_ND_PLANES,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """Sub-quadratic embedding near-dup: banded-LSH candidates + exact
    cosine verify — the 100 TB path (``cosine_near_dup_pairs`` is the
    exact all-pairs baseline).

    The ``planes`` sign bits split into ``bands`` bands (same
    amplification as MinHash banding: candidates agree on *all* planes
    of *any* band — recall ``1-(1-p^r)^b`` with p the per-plane
    agreement probability; r = planes/bands trades recall against
    candidate volume ~ b*N^2/2^r). Candidates are an equi-join on
    (band, band_bits) — shuffle-partitioned by bucket, work scales
    with bucket sizes, never |N|^2 — deduped, then verified with an
    Arrow-batched NumPy cosine (BLAS beats a per-pair interpreted fold
    ~10x on the verify stage). Recall < 1 by LSH nature, but the
    method is fully deterministic (md5-derived hyperplanes), so an
    oracle engine reproduces the identical pair set: the approximate
    operator is exactly testable.
    """
    import numpy as np

    r = planes // bands
    id_type = vectors.schema[id_col].dataType.simpleString()
    tagged = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        lsh_bucket_expr(vec_col, planes=planes).alias("bucket"),
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("bucket"), b * r)
            .bitwiseAND(F.lit((1 << r) - 1))
            .alias("bv"),
        )
        for b in range(bands)
    ]
    banded = tagged.select(
        "vid", "vec", F.explode(F.array(*band_structs)).alias("bh")
    ).select("vid", "vec", F.col("bh.band").alias("band"), F.col("bh.bv").alias("bv"))

    # one task per (band, bucket): stack the bucket's vectors once and
    # take the whole upper triangle from a single BLAS matmul.
    # Candidate pairs never materialize as shuffled rows — the only
    # shuffle is the N*bands banded rows into their buckets. (A
    # join-then-verify formulation shuffles |candidates| rows with
    # vector payloads and re-converts both vectors per pair; the
    # conversion alone dominates its runtime.)
    def bucket_verify(key, pdf):
        import pandas as pd  # noqa: PLC0415

        if len(pdf) < 2:
            return pd.DataFrame({"va": [], "vb": [], "cosine": []})
        ids = pdf["vid"].to_numpy()
        M = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["vec"]])
        S_ = (M @ M.T) / np.outer(
            np.linalg.norm(M, axis=1), np.linalg.norm(M, axis=1)
        )
        i, j = np.where(np.triu(S_ >= threshold, k=1))
        va, vb = ids[i], ids[j]
        return pd.DataFrame(
            {
                "va": np.minimum(va, vb),
                "vb": np.maximum(va, vb),
                "cosine": np.round(S_[i, j], 4),
            }
        )

    verified = banded.groupBy("band", "bv").applyInPandas(
        bucket_verify, f"va {id_type}, vb {id_type}, cosine double"
    )
    # a pair agreeing on multiple bands verifies once per band — exact
    # duplicate rows, deduped on the (tiny) verified set
    return verified.distinct()


def semdedup_flags(
    vectors: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication = cluster the embedding space, then drop items that
    are near-duplicates of another item *within the same cluster* —
    the cross-cluster pairs LSH/all-pairs dedup would also score are
    deliberately never computed, which is the whole scale trick:
    pairwise work is O(sum over clusters of |c|^2), not O(N^2).

    Keep policy: deterministic min-id — a vector is ``removed`` iff
    some same-cluster vector with a smaller id has cosine >= threshold
    to it (the paper keeps a random representative; min-id makes the
    operator engine-reproducible and hence oracle-checkable).

    Shape: one broadcast-argmax cluster assignment (no shuffle on the
    big side), one shuffle into clusters, one BLAS gram matrix per
    cluster inside ``applyInPandas``. Cluster size is the per-task
    memory knob — at 100 TB you raise k until the largest cluster's
    |c| x dim f64 block fits an executor (the paper runs k=50k over
    LAION embeddings for exactly this reason).

    Returns (id, cluster, removed: boolean).
    """
    import numpy as np

    id_type = vectors.schema[id_col].dataType.simpleString()
    assigned = assign_nearest_centroid(vectors, centroids, id_col, vec_col).select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        F.col("assigned_label").alias("__cluster"),
    )

    def cluster_flags(key, pdf):
        import pandas as pd  # noqa: PLC0415

        ids = pdf["__id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        M = np.stack(
            [np.asarray(x, dtype=np.float64) for x in pdf["__vec"].iloc[order]]
        )
        S_ = (M @ M.T) / np.outer(
            np.linalg.norm(M, axis=1), np.linalg.norm(M, axis=1)
        )
        # removed[j] = any i<j (strictly smaller id) with cos >= t
        removed = (np.tril(S_ >= threshold, k=-1)).any(axis=1)
        return pd.DataFrame(
            {"id": ids, "cluster": key[0], "removed": removed}
        )

    return assigned.groupBy("__cluster").applyInPandas(
        cluster_flags, f"id {id_type}, cluster int, removed boolean"
    )


def cosine_topk_blas(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k with per-batch BLAS scoring — the scale
    path for the exact ANN baseline.

    ``cosine_topk`` scores through Catalyst array lambdas (interpreted
    per element: ~64 closure evals per candidate); this variant ships
    the tiny query matrix to every task and scores each Arrow batch
    with ONE normalized matmul, then prunes to the per-(batch, query)
    top-(k+1) under the same (-cos, id) total order the final window
    uses. Any global top-k candidate has at most k predecessors inside
    its own batch, so per-batch top-(k+1) provably preserves the exact
    result (the +1 absorbs the query's self-match, excluded after).
    Shuffle volume is O(batches * |queries| * k) rows, independent of
    corpus size.

    Queries are the broadcast side by contract (they are collected to
    the driver to form the matrix) — same smallness assumption the
    Catalyst version's ``F.broadcast(q)`` makes.
    """
    import numpy as np

    qrows = queries.select(id_col, vec_col).collect()
    if not qrows:
        raise ValueError("cosine_topk_blas: empty query set")
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in qrows])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    bq = vectors.sparkSession.sparkContext.broadcast((qids, Qn))

    def score(batches):
        import pandas as pd  # noqa: PLC0415

        q_ids, q_mat = bq.value
        kk = k + 1
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            M = np.stack([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            S_ = Mn @ q_mat.T  # candidates x queries
            take = min(kk, len(ids))
            out_q, out_id, out_cos = [], [], []
            for j in range(len(q_ids)):
                # exact per-batch order: cos desc, candidate id asc
                order = np.lexsort((ids, -S_[:, j]))[:take]
                out_q.append(np.full(take, q_ids[j]))
                out_id.append(ids[order])
                out_cos.append(S_[order, j])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "nn_id": np.concatenate(out_id),
                    "cos": np.concatenate(out_cos),
                }
            )

    cand = vectors.select(id_col, vec_col).mapInPandas(
        score, "query_id long, nn_id long, cos double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("nn_id").asc()
    )
    return (
        cand.filter(F.col("nn_id") != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "nn_id",
            F.round("cos", 4).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: probe only the ``nprobe`` cells
    nearest to each query instead of scanning all vectors.

    Both sides are assigned to centroid cells (broadcast of the tiny
    centroid table); the candidate join is an equi-join on cell id, so
    scan cost drops by ~|cells|/nprobe. Recall < 1 by design — the
    exact baseline is ``cosine_topk``.
    """
    cells = assign_nearest_centroid(vectors, centroids, id_col, vec_col).select(
        F.col(id_col).alias("nn_id"),
        F.col(vec_col).alias("vv"),
        F.col("assigned_label").alias("cell"),
    )
    # query -> its nprobe nearest cells
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    q_cells = q.crossJoin(F.broadcast(centroids)).withColumn(
        "qcos", cosine(F.col("qv"), F.col("centroid"))
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), F.col("centroid_label").asc()
    )
    probes = (
        q_cells.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", F.col("centroid_label").alias("cell"))
    )
    scored = (
        probes.join(cells, "cell")
        .filter(F.col("nn_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("vv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("nn_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "nn_id",
            F.round("cos", 4).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def gram_matrix(
    vectors: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """Distributed Gram matrix G = X^T X (dim x dim) — the one-pass
    reduction feeding PCA / power iteration / covariance analysis.

    Each Arrow batch contributes a dim x dim partial product computed
    with a single BLAS matmul inside ``mapInPandas``; partials reduce
    through a (i, j)-keyed sum. Shuffle volume is
    O(partitions * dim^2) rows — independent of N — so the plan is a
    single corpus scan plus a tiny fixed-size aggregation regardless
    of scale. (The posexplode x posexplode formulation inflates the
    corpus dim^2-fold before the shuffle; never do that.)
    """
    import numpy as np

    def partials(batches):
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            if M.shape[1] != dim:
                raise ValueError(
                    f"gram_matrix: dim={dim} but {vec_col!r} vectors "
                    f"have width {M.shape[1]}"
                )
            G = M.T @ M
            ii, jj = np.meshgrid(np.arange(dim), np.arange(dim), indexing="ij")
            yield pd.DataFrame(
                {"i": ii.ravel(), "j": jj.ravel(), "partial": G.ravel()}
            )

    parts = vectors.select(vec_col).mapInPandas(partials, "i int, j int, partial double")
    return parts.groupBy("i", "j").agg(F.sum("partial").alias("g"))


def power_iteration_top_eigvec(
    gram: DataFrame, dim: int = 64, iters: int = 8, max_local_dim: int = 4096
) -> DataFrame:
    """Top eigenvector of a (i, j, g) Gram relation by power iteration:
    v <- normalize(G v), starting from all-ones.

    Dual regime. The Gram is O(dim^2) REGARDLESS of corpus size — the
    N-dependent work already happened in ``gram_matrix``'s one-pass
    reduction — so for any realistic embedding width (dim <= 4096 is
    128 MB of doubles) the whole iteration is ``iters`` BLAS matvecs
    inside ONE single-partition ``mapInPandas`` task over the gram:
    lazy (nothing runs at plan-construction/explain time), one
    dim^2-row exchange, zero driver collect. Scheduling 3*iters
    distributed stages to avoid a 32 KB matrix buys nothing and costs
    seconds of pure stage latency. Past ``max_local_dim`` the
    relational formulation takes over: per step, one equi-join of the
    Gram against the O(dim) vector (broadcast), a groupBy-i sum, and
    a window normalization — the same loop shape, distributed.
    Out-of-range (i, j) entries are ignored in the local regime (the
    distributed joins drop them); an empty gram yields an empty
    result in both.

    Two engines running the SAME fixed iteration agree step-for-step
    whether or not the iteration has converged, which is what makes an
    iterative algorithm exactly oracle-checkable (both regimes pass
    the same 6-dp oracle).

    Returns (i, v) — the unit-norm iterate after ``iters`` steps.
    """
    spark = gram.sparkSession
    if dim <= max_local_dim:
        import numpy as np

        def iterate(batches):
            import pandas as pd  # noqa: PLC0415

            G = np.zeros((dim, dim))
            seen = False
            for pdf in batches:
                if pdf.empty:
                    continue
                seen = True
                ii = pdf["i"].to_numpy()
                jj = pdf["j"].to_numpy()
                ok = (ii >= 0) & (ii < dim) & (jj >= 0) & (jj < dim)
                G[ii[ok], jj[ok]] = pdf["g"].to_numpy()[ok]
            if not seen:
                return
            v = np.ones(dim)
            for _ in range(iters):
                v = G @ v
                v = v / np.linalg.norm(v)
            yield pd.DataFrame({"i": np.arange(dim, dtype="int32"), "v": v})

        return gram.repartition(1).mapInPandas(iterate, "i int, v double")
    gram = CR.track(gram.persist())
    v = spark.range(dim).select(
        F.col("id").cast("int").alias("j"), F.lit(1.0).alias("v")
    )
    # normalization via a single-partition window over the dim-row
    # iterate (tiny by construction), NOT a 1-row-aggregate cross
    # join: the cross join would reference the gv subtree twice and
    # double the logical plan per step — O(2^iters) analysis cost —
    # while the window keeps lineage growth linear in iters.
    w_all = Window.partitionBy(F.lit(1))
    for _ in range(iters):
        gv = (
            gram.join(F.broadcast(v), "j")
            .groupBy("i")
            .agg(F.sum(F.col("g") * F.col("v")).alias("gv"))
        )
        v = gv.select(
            F.col("i").alias("j"),
            (
                F.col("gv")
                / F.sqrt(F.sum(F.col("gv") * F.col("gv")).over(w_all))
            ).alias("v"),
        )
    return v.select(F.col("j").alias("i"), "v")


def cosine_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    blocks: int = 8,
) -> DataFrame:
    """Exact all-pairs cosine near-dup via block-partitioned matrix
    products — fully distributed, nothing ever collects to the driver.

    Vectors are hashed into ``blocks`` blocks; every unordered block
    pair (bi <= bj) becomes one cogroup task that multiplies its two
    sub-matrices with a single BLAS ``@`` (float64, ~100x a per-pair
    expression fold). Each vector is replicated ``blocks+1`` times, but
    per-task memory is O(2N/blocks * dim): size ``blocks`` so a block
    fits an executor (10M x 64 f64 = ~5 GB corpus -> blocks=64 gives
    ~160 MB per task). Work is O(N^2/2) pair evaluations spread over
    blocks*(blocks+1)/2 independent tasks — the exact-baseline cost;
    the sub-quadratic scale path stays LSH/IVF candidate generation
    (``lsh_bucket_counts`` / ``ivf_topk``) + this verify on candidates.

    Cosine is dot/(|a||b|) in float64, rounded to 4, mirroring the
    oracle formula. Output pairs are (va < vb), each exactly once:
    an unordered vector pair lands in exactly one block pair.
    """
    import numpy as np

    id_type = vectors.schema[id_col].dataType.simpleString()

    v = vectors.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        F.pmod(F.hash(F.col(id_col)), F.lit(blocks)).alias("__blk"),
    )
    # left side owns block bi and meets every bj >= bi; right side owns
    # bj and meets every bi <= bj — so group (bi, bj) holds exactly the
    # vectors of those two blocks (same set twice when bi == bj).
    left = v.select(
        "__id",
        "__vec",
        F.col("__blk").alias("bi"),
        F.explode(F.sequence(F.col("__blk"), F.lit(blocks - 1))).alias("bj"),
    )
    # the right side re-aliases its columns: if both cogroup children
    # carry the *same* attribute ids, Catalyst deduplicates them and
    # prunes the right side's data columns out of the plan (observed
    # under count(): rdf arrives with only the grouping keys)
    right = v.select(
        F.col("__id").alias("__rid"),
        F.col("__vec").alias("__rvec"),
        F.explode(F.sequence(F.lit(0), F.col("__blk"))).alias("bi"),
        F.col("__blk").alias("bj"),
    )

    def block_pair(key, ldf, rdf):
        import pandas as pd  # noqa: PLC0415

        if not len(ldf) or not len(rdf):
            return pd.DataFrame({"va": [], "vb": [], "cosine": []})
        ids_l = ldf["__id"].to_numpy()
        ids_r = rdf["__rid"].to_numpy()
        L = np.stack([np.asarray(x, dtype=np.float64) for x in ldf["__vec"]])
        R = np.stack([np.asarray(x, dtype=np.float64) for x in rdf["__rvec"]])
        S = (L @ R.T) / np.outer(np.linalg.norm(L, axis=1), np.linalg.norm(R, axis=1))
        li, ri = np.where(S >= threshold)
        va, vb = ids_l[li], ids_r[ri]
        if key[0] == key[1]:
            # same block twice: each unordered pair shows up in both
            # orientations — keep one and drop self-pairs
            keep = va < vb
            va, vb, cos = va[keep], vb[keep], S[li, ri][keep]
        else:
            # distinct blocks: each unordered pair shows up exactly once
            # (possibly with the larger id on the left) — orient, keep all
            cos = S[li, ri]
            va, vb = np.minimum(va, vb), np.maximum(va, vb)
        return pd.DataFrame({"va": va, "vb": vb, "cosine": np.round(cos, 4)})

    return (
        left.groupBy("bi", "bj")
        .cogroup(right.groupBy("bi", "bj"))
        .applyInPandas(block_pair, f"va {id_type}, vb {id_type}, cosine double")
    )
