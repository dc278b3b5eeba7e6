"""Stage 7 — connected components: iterative large-star/small-star.

The reference's grouping is greedy seed-absorption in a single loop
(dedup.py:204-240); at cluster scale the equivalent (coarsening —
every greedy group lands inside one component, SURVEY §5.2 note) is
connected components over the verified-pair graph.  Implemented as the
alternating large-star / small-star DataFrame self-joins of Kiveris et
al., "Connected Components in MapReduce and Beyond" (SOCC'14) — a
public algorithm, O(log n) rounds, no GraphFrames jar needed.

Each round is two shuffles; ``localCheckpoint(eager=True)`` after each
round cuts lineage so the plan does not grow exponentially (SURVEY
§4.2.4).  Convergence = (edge count, xxhash64 checksum) fixpoint.

Stable ids: the final root of every component IS min(file_id) of the
component, so cluster ids are deterministic across reruns, partition
counts and cluster sizes (north_rule; W5 — the reference's
incrementing group_id counter, classifier.py:448, is NOT stable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codedup.config import DedupConfig


def _large_star(e: DataFrame) -> DataFrame:
    """Symmetrize; for each node u attach strictly-larger neighbors to
    min(N(u) ∪ {u}).  Emits (child > parent) rows."""
    nbrs = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = nbrs.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        nbrs.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Input rows (u > v); for each u attach all smaller neighbors and u
    itself to the minimum neighbor."""
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    moved = (
        e.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    selfe = mins.select(F.col("u"), F.col("m").alias("v"))
    return moved.unionByName(selfe)


def connected_components(edges: DataFrame, cfg: DedupConfig) -> DataFrame:
    """edges(u,v) undirected -> membership(file_id, cluster_id).

    Every node that appears in an edge is assigned cluster_id =
    min(file_id) of its component.  Singletons (no edges) are absent —
    they are not duplicates of anything."""
    e = (
        edges.filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
    )
    prev = None
    for _ in range(cfg.cc_max_iters):
        e = _small_star(_large_star(e).distinct()).distinct()
        e = e.localCheckpoint(eager=True)
        # decimal(38,0) sum: exact and overflow-proof under ANSI mode
        sig = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        cur = (sig["n"], sig["h"])
        if cur == prev:
            break
        prev = cur
    roots = e.select(F.col("v").alias("u"), F.col("v")).distinct()
    return (
        e.unionByName(roots)
        .distinct()
        .select(F.col("u").alias("file_id"), F.col("v").alias("cluster_id"))
    )
