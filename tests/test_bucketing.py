"""Bucketed tables for co-located joins (SURVEY §4.2 / driver brief:
"bucketing for co-located joins").

On a real deployment the fingerprint and signature tables are written
bucketed by file_id so every later file_id equi-join (verify's content
joins, members') is exchange-free.  This test proves the mechanism:
two tables bucketed on the join key join with NO Exchange (shuffle) in
the physical plan, while the unbucketed twin shuffles."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, tiny, tmp_path_factory):
    import shutil
    import uuid

    from codedup.stages.fingerprint import fingerprint

    fp = fingerprint(spark.read.parquet(tiny["paths"]["files"]))
    # unique names: a fresh in-memory catalog can't DROP a previous
    # session's table, but its warehouse location may still exist
    suffix = uuid.uuid4().hex[:8]
    t1, t2 = f"fp_bucketed_{suffix}", f"meta_bucketed_{suffix}"
    (fp.select("file_id", "sha256", "size")
       .write.mode("overwrite").bucketBy(8, "file_id").sortBy("file_id")
       .format("parquet").saveAsTable(t1))
    (fp.select("file_id", "key", "lang")
       .write.mode("overwrite").bucketBy(8, "file_id").sortBy("file_id")
       .format("parquet").saveAsTable(t2))
    yield {"fp": fp, "t1": t1, "t2": t2}
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    for t in (t1, t2):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    """With broadcast disabled (forcing the sort-merge path a large-
    large join would take), bucketed tables join with zero shuffle."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table(warehouse["t1"])
        b = spark.table(warehouse["t2"])
        joined = a.join(b, "file_id")
        plan = _plan(joined)
        assert "Exchange hashpartitioning" not in plan, f"bucketed join shuffles:\n{plan}"
        assert "Bucketed: true" in plan
        assert joined.count() == warehouse["fp"].count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_shuffles(spark, warehouse):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fp = warehouse["fp"]
        a = fp.select("file_id", "sha256")
        b = fp.select("file_id", "key")
        plan = _plan(a.join(b, "file_id"))
        assert "Exchange hashpartitioning" in plan  # the contrast case
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_correct(spark, warehouse):
    got = (
        spark.table(warehouse["t1"]).join(spark.table(warehouse["t2"]), "file_id")
        .select("file_id", "sha256", "key")
        .toPandas()
        .sort_values("file_id", ignore_index=True)
    )
    want = (
        warehouse["fp"].select("file_id", "sha256", "key")
        .toPandas()
        .sort_values("file_id", ignore_index=True)
    )
    assert got.equals(want)
