"""Feedback store (upsert semantics) + preference model (Spark ML
LogisticRegression twin of feedback.py:176-261)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from codedup.feedback import FeedbackStore, PreferenceModel


def _fb_rows(spark, rows):
    return spark.createDataFrame(
        rows, "key string, decision string, embedding array<double>"
    )


def test_store_upsert_latest_wins(spark, tmp_path):
    store = FeedbackStore(spark, str(tmp_path))
    store.add_feedback(_fb_rows(spark, [
        ("a.py", "keep", [1.0, 0.0]),
        ("b.py", "trash", [0.0, 1.0]),
    ]))
    store.add_feedback(_fb_rows(spark, [("a.py", "trash", [1.0, 0.5])]))
    cur = {r["key"]: r["decision"] for r in store.current().collect()}
    assert cur == {"a.py": "trash", "b.py": "trash"}
    assert store.stats() == {"trash": 2, "total": 2}
    store.compact()
    assert {r["key"]: r["decision"] for r in store.current().collect()} == cur


@pytest.fixture(scope="module")
def separable(spark):
    """Two well-separated Gaussian blobs + 'review' noise rows."""
    rng = np.random.default_rng(11)
    rows = []
    for i in range(20):
        rows.append((f"k{i}", "keep", (rng.normal(0, 0.1, 8) + 2.0).tolist()))
        rows.append((f"t{i}", "trash", (rng.normal(0, 0.1, 8) - 2.0).tolist()))
    for i in range(5):  # ambiguous: must be EXCLUDED from training
        rows.append((f"r{i}", "review", rng.normal(0, 5.0, 8).tolist()))
    return _fb_rows(spark, rows)


def test_can_train_gate(spark):
    m = PreferenceModel()
    few = _fb_rows(spark, [("a", "keep", [1.0]), ("b", "trash", [0.0])])
    ok, reason = m.can_train(few)
    assert not ok and "at least" in reason
    assert m.train(few) == {"success": False, "error": reason}


def test_train_and_threshold_predictions(spark, separable):
    m = PreferenceModel()
    stats = m.train(separable)
    assert stats["success"]
    assert stats["samples_used"] == 40          # review rows excluded
    assert stats["keep_samples"] == 20 and stats["trash_samples"] == 20
    assert stats["train_accuracy"] == 1.0       # separable blobs

    preds = m.predict(separable.filter(F.col("decision") != "review"))
    got = {r["key"]: r["decision"] for r in preds.collect()}
    assert all(got[f"k{i}"] == "keep" for i in range(20))
    assert all(got[f"t{i}"] == "trash" for i in range(20))

    # a midpoint embedding sits between the thresholds -> review
    mid = _fb_rows(spark, [("mid", "x", [0.0] * 8)])
    r = m.predict(mid).first()
    assert r["decision"] == "review"
    assert 0.3 <= r["keep_prob"] <= 0.7

    # deterministic: retrain + repredict gives identical decisions
    m2 = PreferenceModel()
    m2.train(separable)
    got2 = {r["key"]: r["decision"]
            for r in m2.predict(separable.filter(F.col("decision") != "review")).collect()}
    assert got2 == got


def test_save_load_round_trip(spark, separable, tmp_path):
    """Spark ML native persistence (reference feedback.py:290-305 twin):
    train -> save -> load into a FRESH object -> keep_prob identical to
    the original model on a fixed split."""
    m = PreferenceModel()
    assert m.train(separable)["success"]
    with pytest.raises(ValueError):
        PreferenceModel().save(str(tmp_path / "nope"))
    m.save(str(tmp_path / "model"))

    m2 = PreferenceModel.load(str(tmp_path / "model"))
    probe = separable.filter(F.col("decision") != "review")
    want = {r["key"]: (round(r["keep_prob"], 9), r["decision"])
            for r in m.predict(probe).collect()}
    got = {r["key"]: (round(r["keep_prob"], 9), r["decision"])
           for r in m2.predict(probe).collect()}
    assert got == want
    # save is idempotent-overwrite: a second save to the same path loads
    m.save(str(tmp_path / "model"))
    assert PreferenceModel.load(str(tmp_path / "model")).model is not None


def test_untrained_model_returns_unknown(spark, separable):
    preds = PreferenceModel().predict(separable.limit(3))
    assert {r["decision"] for r in preds.collect()} == {"unknown"}


def test_catalog_query_runs(spark):
    from codedup.queries import q_feedback_model_predictions

    out = q_feedback_model_predictions(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    n = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").count()
    assert len(rows) == n
    assert {r["decision"] for r in rows} <= {"keep", "trash", "review"}


def test_lr_golden_reproduces(spark):
    """Retraining the preference LR at sf0.01 must reproduce the
    committed folded golden (tools/make_lr_model.py) — ties the offline
    training half to the oracle-checked scoring half, like the IVF
    centroid golden."""
    from codedup.queries import _feedback_lr
    from tools.make_lr_model import train_folded

    fresh = train_folded(spark, "/root/testdata/sf0.01")
    golden = _feedback_lr()
    assert abs(fresh["bias"] - golden["bias"]) < 1e-6
    assert all(abs(a - b) < 1e-6 for a, b in zip(fresh["coef"], golden["coef"]))


def test_pinned_scoring_equals_live_model(spark):
    """The relational pinned-coefficient scorer (catalog query) must
    produce the same decisions as the live Spark-ML model trained on
    the same rows (coefficient rounding to 9 decimals cannot move a
    probability across a threshold on this corpus)."""
    from pyspark.sql import functions as F

    from codedup.queries import q_feedback_model_predictions

    sf = "/root/testdata/sf0.01"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    fb = emb.filter(F.col("vec_id") % 5 != 0).select(
        F.col("vec_id").cast("string").alias("key"),
        F.when(F.col("label") < 5, "keep").otherwise("trash").alias("decision"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    model = PreferenceModel()
    assert model.train(fb)["success"]
    live = {r["vec_id"]: r["decision"]
            for r in model.predict(emb.select("vec_id", "embedding"),
                                   id_col="vec_id").collect()}
    pinned = {r["vec_id"]: r["decision"]
              for r in q_feedback_model_predictions(spark, sf).collect()}
    assert pinned == live
