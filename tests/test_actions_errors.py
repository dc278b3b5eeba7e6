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
