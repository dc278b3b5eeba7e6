"""IVF (inverted-file) approximate nearest neighbor over embedding
columns — the coarse-quantizer scale path, complementing the
sign-random-projection LSH variant in queries.py (J6 family).

Index:  pyspark.ml KMeans (fixed seed) partitions the corpus into
        n_cells Voronoi cells; every vector stores its cell id.
Search: each probe ranks the n_cells centroids (centroid matrix is
        genuinely broadcast-small: n_cells x dim), keeps its ``nprobe``
        nearest cells, EQUI-joins the cell assignments on cell id —
        a hash join that prunes to ~ n * nprobe / n_cells candidates
        per probe — then scores exact cosine inside the candidates and
        window-ranks the global top-k.

Like every IVF, recall is probabilistic (a true neighbor can sit just
across a cell boundary), so this is verified by a recall@k test against
the exact brute-force block matmul (tests/test_ann_ivf.py), not by a
value-exact SQL oracle.  At 10^12 rows: n_cells ~ sqrt(n), the
assignments table is bucketed by cell, and the probe-side explode is
nprobe rows per query — the same join-pruning story the bucketed-LSH
plan test asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_ivf(emb: DataFrame, n_cells: int = 16, seed: int = 42,
              id_col: str = "vec_id", emb_col: str = "embedding"):
    """-> (assigned DataFrame with a `cell` column, centroids list).

    KMeans training scans the table a bounded number of iterations;
    at scale, train on a sample (KMeans is robust to it) and assign
    the full table with one transform pass."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vec = emb.withColumn("_v", array_to_vector(F.col(emb_col).cast("array<double>")))
    model = KMeans(k=n_cells, seed=seed, featuresCol="_v", predictionCol="cell").fit(vec)
    assigned = model.transform(vec).drop("_v")
    centroids = [c.tolist() for c in model.clusterCenters()]
    return assigned, centroids


def probe_cells(probes: DataFrame, centroids: list[list[float]], nprobe: int,
                id_col: str = "vec_id", emb_col: str = "embedding") -> DataFrame:
    """(id, embedding) -> nprobe rows (id, embedding, cell): the query's
    nearest cells by Euclidean distance to the centroid matrix.  One
    tiny Arrow stage; the centroid matrix (n_cells x dim) is the only
    closure-captured data — broadcast-sized by construction."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    cmat = np.asarray(centroids, dtype=np.float64)

    def gen(it):
        for pdf in it:
            if not len(pdf):
                continue
            q = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
            # squared Euclidean: ||q||^2 - 2 q.c + ||c||^2 (argsort-safe)
            d = (-2.0 * (q @ cmat.T)) + (cmat * cmat).sum(axis=1)[None, :]
            near = np.argsort(d, axis=1, kind="stable")[:, :nprobe]
            n = len(pdf)
            yield pd.DataFrame({
                id_col: np.repeat(pdf[id_col].to_numpy(), nprobe),
                emb_col: [e for e in pdf[emb_col] for _ in range(nprobe)],
                "cell": near.reshape(-1).astype("int32"),
            })

    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField(emb_col, probes.schema[emb_col].dataType),
        T.StructField("cell", T.IntegerType()),
    ])
    return probes.select(id_col, emb_col).mapInPandas(gen, schema=schema)


def ivf_topk(assigned: DataFrame, centroids: list[list[float]],
             probes: DataFrame, k: int = 5, nprobe: int = 4,
             id_col: str = "vec_id", emb_col: str = "embedding") -> DataFrame:
    """Top-k cosine neighbors per probe, searching only nprobe cells.
    Returns (query_id, neighbor_id, rank) ranked by (cosine rounded to
    6, neighbor_id) like the exact variants."""
    px = probe_cells(probes, centroids, nprobe, id_col, emb_col) \
        .select(F.col(id_col).alias("query_id"), F.col(emb_col).alias("qa"), "cell")
    cand_side = assigned.select(
        F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("eb"), "cell"
    )
    dot = "aggregate(zip_with(qa, eb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"
    norm = ("sqrt(aggregate(transform({0}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
            " 0D, (acc, v) -> acc + v))")
    cand = (
        px.join(cand_side, "cell")     # EQUI join on the cell id
        .filter(F.col("query_id") != F.col("neighbor_id"))
        # a (query, neighbor) pair can match through at most one cell
        # (the neighbor has ONE cell), so no dedup is needed
        .withColumn("sim6", F.round(
            F.expr(dot) / (F.expr(norm.format("qa")) * F.expr(norm.format("eb"))), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim6"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )
