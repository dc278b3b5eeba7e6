"""No-Python-on-the-hot-path enforcement (SURVEY §4.2.5, §5.2.5).

Exactly two stages may cross the Arrow boundary (signatures, verify).
Every other stage's physical plan must contain no Python evaluation
node — this is the enforceable form of BASELINE.json:15's "no per-row
Python".
"""

from pyspark.sql import functions as F

from codedup.stages.banding import band_rows
from codedup.stages.candidates import candidate_pairs
from codedup.stages.exact import exact_edges, exact_groups, representatives
from codedup.stages.fingerprint import fingerprint
from codedup.stages.signatures import compute_signatures

PY_NODES = ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_pure(df, name: str):
    plan = _plan(df)
    for node in PY_NODES:
        assert node not in plan, f"stage {name} has Python node {node}:\n{plan}"


def test_jvm_only_stages(spark, tiny, cfg):
    files = spark.read.parquet(tiny["paths"]["files"])
    fp = fingerprint(files)
    _assert_pure(fp, "fingerprint")
    _assert_pure(exact_edges(fp), "exact_edges")
    _assert_pure(exact_groups(fp), "exact_groups")
    _assert_pure(representatives(fp), "representatives")

    # banding/candidates downstream of a parquet-materialized signatures
    # table (as in the checkpointed pipeline) must be pure JVM
    sigs = compute_signatures(representatives(fp).select("file_id", "content"), cfg)
    path = str(tiny["paths"]["files"]).replace("files.parquet", "_sigs_purity.parquet")
    sigs.write.mode("overwrite").parquet(path)
    sigs2 = spark.read.parquet(path)
    bands = band_rows(sigs2, cfg)
    _assert_pure(bands, "bands")
    _assert_pure(candidate_pairs(bands, cfg), "candidates")


def test_arrow_stages_are_mapinpandas(spark, tiny, cfg):
    files = spark.read.parquet(tiny["paths"]["files"])
    reps = representatives(fingerprint(files)).select("file_id", "content")
    plan = _plan(compute_signatures(reps, cfg))
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time python anywhere


def test_filter_pushdown_reaches_scan(spark, tiny):
    """Catalyst must push the lang predicate into the parquet scan
    (P1/S3; SURVEY §4.1)."""
    df = spark.read.parquet(tiny["paths"]["files"]).filter(F.col("lang") == "python")
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "lang" in plan.split("PushedFilters:")[1][:200]


def test_column_pruning(spark, tiny):
    """A projection to (repo, path) must not read `content` (ReadSchema
    pruning — critical when content is the fat column)."""
    df = spark.read.parquet(tiny["paths"]["files"]).select("repo", "path")
    plan = _plan(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "content" not in read_schema
