"""Feedback store + trained preference model (SURVEY §2.8).

Reference: user keep/trash/review decisions accumulate in a SQLite
table keyed by path (upsert, feedback.py:59-97); a scikit-learn
LogisticRegression (C=0.1, class_weight="balanced", StandardScaler)
trains on keep/trash embeddings — review rows are skipped — and
predictions map keep-probability to a decision with 0.7/0.3 thresholds
(feedback.py:176-261).

Spark twin:
  FeedbackStore    parquet-backed upsert-by-key table (latest decision
                   wins, like the reference's UNIQUE(image_path) +
                   UPDATE) — append-only writes, latest-wins read.
  PreferenceModel  pyspark.ml StandardScaler + LogisticRegression.
                   sklearn's C is an inverse PER-SUM regularizer
                   (minimize sum(loss) + ||w||^2 / (2C)); Spark
                   minimizes mean(loss) + regParam * ||w||^2 / 2, so
                   regParam = 1 / (C * n).  class_weight="balanced"
                   becomes a weight column n / (2 * n_class).
                   Thresholds: keep_prob > 0.7 -> keep, < 0.3 -> trash,
                   else review.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

MIN_SAMPLES_PER_CLASS = 5   # reference default min_samples
SKLEARN_C = 0.1             # reference regularization
KEEP_THRESHOLD = 0.7
TRASH_THRESHOLD = 0.3

FEEDBACK_SCHEMA = "key string, decision string, embedding array<double>, seq long"


class FeedbackStore:
    """Upsert-by-key decision table over parquet: writes append with a
    monotonically increasing sequence; reads keep the latest row per
    key.  Compact() rewrites to latest-only (bounds re-read cost)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.dir = os.path.join(root, "feedback")

    def _next_seq(self) -> int:
        cur = self.read_all()
        if cur is None:
            return 0
        return (cur.agg(F.max("seq")).first()[0] or 0) + 1

    def read_all(self) -> DataFrame | None:
        if not os.path.isdir(self.dir):
            return None
        return self.spark.read.parquet(self.dir)

    def add_feedback(self, rows: DataFrame) -> None:
        """rows(key, decision, embedding) — appended with the next
        sequence number; an existing key is superseded, not rewritten."""
        seq = self._next_seq()
        rows.select("key", "decision", "embedding") \
            .withColumn("seq", F.lit(seq)) \
            .write.mode("append").parquet(self.dir)

    def current(self) -> DataFrame:
        """Latest decision per key (the reference's upsert view)."""
        allf = self.read_all()
        if allf is None:
            return self.spark.createDataFrame([], FEEDBACK_SCHEMA).drop("seq")
        w = Window.partitionBy("key").orderBy(F.desc("seq"))
        return (
            allf.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("key", "decision", "embedding")
        )

    def compact(self) -> None:
        cur = self.current().withColumn("seq", F.lit(0)).localCheckpoint(eager=True)
        cur.write.mode("overwrite").parquet(self.dir)

    def stats(self) -> dict:
        pdf = self.current().groupBy("decision").count().collect()
        out = {r["decision"]: r["count"] for r in pdf}
        out["total"] = sum(out.values())
        return out


class PreferenceModel:
    """Spark ML logistic-regression preference model."""

    def __init__(self):
        self.model = None
        self.scaler = None

    def can_train(self, feedback: DataFrame) -> tuple[bool, str]:
        counts = {r["decision"]: r["count"] for r in
                  feedback.groupBy("decision").count().collect()}
        for cls in ("keep", "trash"):
            if counts.get(cls, 0) < MIN_SAMPLES_PER_CLASS:
                return False, (f"Need at least {MIN_SAMPLES_PER_CLASS} samples "
                               f"each for 'keep' and 'trash'")
        return True, "Ready to train"

    def train(self, feedback: DataFrame) -> dict:
        """feedback(key, decision, embedding array<numeric>) -> stats.
        'review' rows are excluded, like the reference."""
        from pyspark.ml.classification import LogisticRegression
        from pyspark.ml.feature import StandardScaler
        from pyspark.ml.functions import array_to_vector

        ok, reason = self.can_train(feedback)
        if not ok:
            return {"success": False, "error": reason}

        labeled = (
            feedback.filter(F.col("decision").isin("keep", "trash"))
            .select(
                array_to_vector(F.col("embedding").cast("array<double>")).alias("raw"),
                F.when(F.col("decision") == "keep", 1.0).otherwise(0.0).alias("label"),
            )
        )
        n = labeled.count()
        n_keep = labeled.filter("label = 1.0").count()
        n_trash = n - n_keep
        # class_weight="balanced": weight = n / (2 * n_class)
        labeled = labeled.withColumn(
            "w",
            F.when(F.col("label") == 1.0, F.lit(n / (2.0 * n_keep)))
            .otherwise(F.lit(n / (2.0 * n_trash))),
        )

        self.scaler = StandardScaler(
            withMean=True, withStd=True, inputCol="raw", outputCol="features"
        ).fit(labeled)
        scaled = self.scaler.transform(labeled)
        lr = LogisticRegression(
            regParam=1.0 / (SKLEARN_C * n),   # sklearn C=0.1 equivalence
            maxIter=1000,
            weightCol="w",
            featuresCol="features",
            labelCol="label",
        )
        self.model = lr.fit(scaled)
        acc = self.model.summary.accuracy
        return {
            "success": True,
            "samples_used": n,
            "keep_samples": n_keep,
            "trash_samples": n_trash,
            "train_accuracy": round(acc, 3),
        }

    def save(self, path: str) -> None:
        """Persist scaler + LR via Spark ML native persistence — the
        twin of the reference's model pickle
        (/root/reference/src/image_dedup/feedback.py:290-305); a saved
        model reloads into a fresh process and predicts identically
        (round-trip pinned in tests/test_feedback.py)."""
        if self.model is None:
            raise ValueError("no trained model to save")
        self.scaler.write().overwrite().save(os.path.join(path, "scaler"))
        self.model.write().overwrite().save(os.path.join(path, "lr"))

    @classmethod
    def load(cls, path: str) -> "PreferenceModel":
        from pyspark.ml.classification import LogisticRegressionModel
        from pyspark.ml.feature import StandardScalerModel

        m = cls()
        m.scaler = StandardScalerModel.load(os.path.join(path, "scaler"))
        m.model = LogisticRegressionModel.load(os.path.join(path, "lr"))
        return m

    def predict(self, emb: DataFrame, id_col: str = "key",
                emb_col: str = "embedding") -> DataFrame:
        """-> (id_col, keep_prob double, decision string) with the
        reference's 0.7/0.3 decision thresholds."""
        from pyspark.ml.functions import array_to_vector, vector_to_array

        if self.model is None:
            return emb.select(
                id_col,
                F.lit(0.5).alias("keep_prob"),
                F.lit("unknown").alias("decision"),
            )
        vec = emb.select(
            id_col, array_to_vector(F.col(emb_col).cast("array<double>")).alias("raw")
        )
        scored = self.model.transform(self.scaler.transform(vec))
        return scored.select(
            id_col,
            vector_to_array("probability")[1].alias("keep_prob"),
        ).withColumn(
            "decision",
            F.when(F.col("keep_prob") > KEEP_THRESHOLD, "keep")
            .when(F.col("keep_prob") < TRASH_THRESHOLD, "trash")
            .otherwise("review"),
        )
