"""Graph analytics over relational edge lists (Tier B).

Training-data pipelines carry graph-shaped work — link graphs for
page quality (PageRank), co-occurrence graphs for dedup clustering and
community structure (triangle counting). Both are expressed here as
pure DataFrame joins/aggregations so Catalyst picks the physical
strategy; the representative single step of each iterative algorithm
is oracle-checkable (same pattern as `kmeans_lloyd_step`:
the fixpoint loop is a driver-side `for` over an exactly-verifiable
step function).

Related in-repo: `operators/dedup.py::cluster_pairs` (connected
components, the other classic iterative graph op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_step(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    rank: DataFrame | None = None,
) -> DataFrame:
    """One synchronous PageRank power iteration (Page et al. 1999,
    unnormalized 0.15 + 0.85 * sum form) from uniform rank 1.0, or
    from a supplied ``rank(node, rank)`` DataFrame for chained
    iterations.

    Plan shape (the canonical distributed PageRank step):
      1. out-degree: one groupBy(src) agg — map-side combine;
      2. contributions: edges join out-degrees (and ranks, if chained)
         on src — equi-join, AQE-broadcast when the degree table is
         small;
      3. new rank: groupBy(dst) sum — the only unavoidable shuffle is
         these two hash-exchanges on src/dst; partial aggregation
         combines contributions map-side, so skewed in-degree (the
         real-world hub-page hazard) is absorbed before the wire.

    Nodes with no in-edges do not appear (their rank is the constant
    1 - damping); callers wanting them materialized can union the node
    list. Returns (node, rank).
    """
    degrees = edges.groupBy(src).agg(F.count("*").alias("__outdeg"))
    if rank is not None:
        degrees = degrees.join(rank.withColumnRenamed("node", src), src)
        r_col = F.col("rank")
    else:
        r_col = F.lit(1.0)
    contrib = edges.join(degrees, src).select(
        F.col(dst).alias("node"),
        (r_col / F.col("__outdeg")).alias("__c"),
    )
    return contrib.groupBy("node").agg(
        (F.lit(1.0 - damping) + F.lit(damping) * F.sum("__c")).alias("rank")
    )


def cooccurrence_edges(
    items: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """Undirected co-occurrence edges: (a, b) with a < b iff both items
    appear in the same group (e.g. parts ordered together). The
    per-group self-join is quadratic in basket size — bounded in
    practice by the basket (TPC-H: ~7 lines/order), which is what makes
    this build scale: the join key is the group id, so each task's
    work is sum(basket^2) over its groups, never |items|^2.
    Returns distinct (src, dst)."""
    base = items.select(
        F.col(group_col).alias("__g"), F.col(item_col).alias("src")
    ).dropDuplicates()
    other = base.select(F.col("__g"), F.col("src").alias("dst"))
    return (
        base.join(other, "__g")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .dropDuplicates()
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Total triangle count of an undirected graph given as distinct
    (src < dst) edges — the compact-forward algorithm: wedges
    (a<b<c from edges (a,b),(b,c)) hash-joined against the edge list
    to test the closing edge (a,c).

    At scale the wedge join is the cost center and is dominated by
    high-degree nodes; ``triangle_count_degree_ordered`` below is the
    Schank-Wagner degree-ordered variant that provably minimizes wedge
    count and is the one to use on skewed graphs. Id-ordering is kept
    here as the simplest oracle-reproducible formulation. Returns 1 row
    (n_edges, n_wedges, n_triangles) so the closure rate is visible.
    """
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = edges.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    wedges = e1.join(e2, "b")
    closed = wedges.join(
        edges.select(F.col("src").alias("a"), F.col("dst").alias("c")),
        ["a", "c"],
        "left_semi",
    )
    return (
        edges.agg(F.count("*").alias("n_edges"))
        .crossJoin(wedges.agg(F.count("*").alias("n_wedges")))
        .crossJoin(closed.agg(F.count("*").alias("n_triangles")))
    )


def triangle_count_degree_ordered(edges: DataFrame) -> DataFrame:
    """Triangle count with Schank-Wagner (2005) degree ordering — the
    production formulation of compact-forward: rank nodes by (degree,
    id) and orient every edge from lower to higher rank, so wedges form
    only at each triangle's LOWEST-ranked corner.  This provably
    minimizes total wedge count: a degree-d hub contributes O(d^2)
    wedges under id-ordering but ~0 under degree-ordering (all its
    edges point INTO it), which is exactly the skew that kills the
    wedge join on power-law graphs.  The (degree, id) ranking is
    deterministic, so an oracle engine reproduces the identical wedge
    set — same reason ``triangle_count`` uses id-ordering, without its
    skew hazard.

    Same output shape as ``triangle_count`` (n_edges, n_wedges,
    n_triangles); n_triangles is identical, n_wedges is <= the
    id-ordered count.
    """
    deg = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    e = edges.join(
        deg.select(F.col("node").alias("src"), F.col("deg").alias("ds")), "src"
    ).join(
        deg.select(F.col("node").alias("dst"), F.col("deg").alias("dd")), "dst"
    )
    # lexicographic (degree, id) rank comparison, in-row via struct order
    src_first = F.struct(F.col("ds"), F.col("src")) < F.struct(
        F.col("dd"), F.col("dst")
    )
    oriented = e.select(
        F.when(src_first, F.col("src")).otherwise(F.col("dst")).alias("lo"),
        F.when(src_first, F.col("dst")).otherwise(F.col("src")).alias("hi"),
        F.when(src_first, F.col("dd")).otherwise(F.col("ds")).alias("hi_deg"),
    )
    o1 = oriented.select(
        "lo", F.col("hi").alias("a"), F.col("hi_deg").alias("da")
    )
    o2 = oriented.select(
        "lo", F.col("hi").alias("b"), F.col("hi_deg").alias("db")
    )
    wedges = o1.join(o2, "lo").filter(
        F.struct(F.col("da"), F.col("a")) < F.struct(F.col("db"), F.col("b"))
    )
    closed = wedges.join(
        oriented.select(F.col("lo").alias("a"), F.col("hi").alias("b")),
        ["a", "b"],
        "left_semi",
    )
    return (
        edges.agg(F.count("*").alias("n_edges"))
        .crossJoin(wedges.agg(F.count("*").alias("n_wedges")))
        .crossJoin(closed.agg(F.count("*").alias("n_triangles")))
    )
