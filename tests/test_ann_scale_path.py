"""The full-scale ANN forms (cell-cogrouped IVF search, cell-local
SemDeDup gram, argmin assignment) must agree with the oracle-gated
relational forms on the sf tables — the scale path and the correctness
path are the same algorithm, different physical plan."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def assigned(spark, emb):
    from codedup.ann import golden_centroids, probe_cells

    return probe_cells(emb, golden_centroids(), 1).localCheckpoint(eager=True)


def test_argmin_assignment_matches_ranked_cells(spark, emb, assigned):
    """probe_cells(nprobe=1) (the one-pass argmin job) and _ranked_cells
    rank-1 (the windowed relational twin the oracle uses) assign every
    vector to the same cell."""
    from codedup.ann import _ranked_cells, golden_centroids
    from pyspark.sql import functions as F

    rel = (
        _ranked_cells(emb, golden_centroids(), "vec_id", "embedding")
        .filter(F.col("rn") == 1).select("vec_id", "cell")
    )
    a = {r.vec_id: r.cell for r in assigned.select("vec_id", "cell").collect()}
    b = {r.vec_id: r.cell for r in rel.collect()}
    assert a == b


def test_ivf_blocks_equals_expression_form(spark, emb, assigned):
    from codedup.ann import golden_centroids, ivf_topk, ivf_topk_blocks
    from pyspark.sql import functions as F

    cent = golden_centroids()
    probes = emb.filter(F.col("vec_id") % 50 == 0)
    want = ivf_topk(assigned, cent, probes, k=5, nprobe=6).toPandas()
    got = ivf_topk_blocks(assigned, cent, probes, k=5, nprobe=6).toPandas()
    key = lambda df: sorted(map(tuple, df[["query_id", "neighbor_id", "rank"]].values))
    assert key(got) == key(want)


def test_semantic_dedup_cells_equals_relational(spark, assigned):
    from codedup.ann import semantic_dedup_cells
    from codedup.queries import q_semantic_dedup

    got = semantic_dedup_cells(assigned, 0.45).toPandas()
    want = q_semantic_dedup(spark, SF).toPandas()
    g = sorted(map(tuple, got[["vec_id", "cell", "kept"]].values))
    w = sorted(map(tuple, want[["vec_id", "cell", "kept"]].values))
    assert g == w


def test_embedding_fixture_deterministic_and_planted():
    from codedup.fixtures import generate_embeddings
    import numpy as np

    t1 = generate_embeddings(2000, seed=7)
    t2 = generate_embeddings(2000, seed=7)
    assert np.array_equal(np.stack(t1["embeddings"].embedding.to_numpy()),
                          np.stack(t2["embeddings"].embedding.to_numpy()))
    truth = t1["truth_dups"]
    assert len(truth) == 100   # dup_frac 0.05
    emb = np.stack(t1["embeddings"].embedding.to_numpy()).astype(np.float64)
    n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    cos = (n[truth.a.to_numpy()] * n[truth.b.to_numpy()]).sum(axis=1)
    assert cos.min() > 0.99    # planted dups really are near-dups


def test_multiprobe_semantic_dedup_superset_and_boundary_recovery(spark):
    """Multi-probe SemDeDup (nprobe=2) drops a SUPERSET of the
    single-cell drops (same rule, more shared cells), and recovers a
    constructed near-dup pair that single-cell assignment splits
    across a Voronoi boundary."""
    import numpy as np
    import pandas as pd
    from codedup.ann import (probe_cells, semantic_dedup_cells,
                             semantic_dedup_multiprobe)

    # two centroids on the x axis; a near-dup pair straddling the
    # y-axis boundary between them, plus filler vectors deep in
    # each cell
    dim = 4
    cents = [[-2.0, 0, 0, 0], [2.0, 0, 0, 0]]
    rows = [
        (0, [-0.05, 1.0, 0.0, 0.0]),   # boundary pair, cell 0 side
        (1, [0.05, 1.0, 0.0, 0.0]),    # boundary pair, cell 1 side (cos~0.995)
        (2, [-3.0, 0.2, 0.0, 0.0]),    # deep in cell 0
        (3, [3.0, -0.2, 0.0, 0.0]),    # deep in cell 1
    ]
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": [r[0] for r in rows],
                      "embedding": [np.asarray(r[1], dtype=np.float32) for r in rows]}))
    single = semantic_dedup_cells(probe_cells(emb, cents, 1), 0.98).toPandas()
    multi = semantic_dedup_multiprobe(emb, cents, 0.98, nprobe=2).toPandas()
    s_drop = set(single[single.kept == 0].vec_id)
    m_drop = set(multi[multi.kept == 0].vec_id)
    assert s_drop == set()          # boundary pair split across cells: missed
    assert m_drop == {1}            # multi-probe shares a cell: caught
    assert s_drop <= m_drop
    # primary cell reported is the nearest cell either way
    assert dict(zip(multi.vec_id, multi.cell)) == dict(zip(single.vec_id, single.cell))
