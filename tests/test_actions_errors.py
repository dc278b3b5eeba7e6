"""Action-plan sink (S10) and errors side-channel tests."""

from pyspark.sql import functions as F

from codedup.stages.ingest import FILES_SCHEMA, split_invalid


def test_action_plan_shape(run_tiny):
    plan = run_tiny.actions.toPandas()
    members = run_tiny.members.toPandas()
    assert len(plan) == len(members)
    assert set(plan.action.unique()) <= {"keep", "dedup", "review"}
    per_cluster = plan.groupby("cluster_id").action.apply(
        lambda s: (s == "keep").sum()
    )
    assert (per_cluster == 1).all(), "exactly one keep per cluster"
    # every dedup row is byte-identical to its cluster's kept file
    m = members.set_index("file_id")
    keep_sha = {r.cluster_id: m.loc[r.file_id].sha256
                for r in plan[plan.action == "keep"].itertuples()}
    for r in plan[plan.action == "dedup"].itertuples():
        assert m.loc[r.file_id].sha256 == keep_sha[r.cluster_id]
    for r in plan[plan.action == "review"].itertuples():
        assert m.loc[r.file_id].sha256 != keep_sha[r.cluster_id]


def test_split_invalid_routes_bad_rows(spark):
    rows = [
        ("org/a", "ok.py", "c" * 40, "python", "print(1)\n"),
        ("", "emptyrepo.py", "c" * 40, "python", "x"),
        ("org/a", "nullcontent.py", "d" * 40, "python", None),
        (None, "nullrepo.py", "e" * 40, "python", "y"),
    ]
    # nullable twin of FILES_SCHEMA: a real-world source can violate the
    # declared contract, which is exactly what the side-channel is for
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    good, errors = split_invalid(df)
    assert good.count() == 1
    e = errors.toPandas()
    assert len(e) == 3
    assert set(e.stage) == {"ingest"}
    assert (e.message.isin(["null content", "null/empty key column"])).all()


def test_errors_stage_persisted(spark, tiny, cfg, tmp_path):
    import os

    from codedup import pipeline

    res = pipeline.run(spark, [tiny["paths"]["files"]], cfg,
                       work_dir=str(tmp_path / "w"), run_id="e", resume=False)
    assert os.path.exists(str(tmp_path / "w" / "runs" / "e" / "errors.manifest.json"))
    assert res.recomputed_stages == pipeline.STAGES


def test_id_collision_guard_routes_to_errors(spark):
    """ADVICE r1: a 64-bit file_id held by two distinct keys (expected
    ~27k times at 10^12 files) must be excluded from dedup and surfaced,
    never silently merged."""
    from codedup.ids import split_id_collisions

    fp = spark.createDataFrame(
        [(100, "r1", "a.py", "c1", "k1"),
         (100, "r2", "b.py", "c2", "k2"),   # same id, different key -> collision
         (200, "r1", "c.py", "c1", "k3"),
         (200, "r1", "c.py", "c1", "k3")],  # same id, SAME key -> fine (dup row)
        "file_id long, repo string, path string, commit string, key string",
    )
    clean, collided = split_id_collisions(fp)
    assert {r["file_id"] for r in clean.collect()} == {200}
    assert {r["path"] for r in collided.collect()} == {"a.py", "b.py"}


def test_pipeline_has_id_errors_stage(run_tiny):
    from codedup import pipeline

    assert "id_errors" in pipeline.STAGES
    assert "id_errors" in run_tiny.recomputed_stages
