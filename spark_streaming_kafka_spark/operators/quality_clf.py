"""Trained quality classifier — the pyspark.ml production path behind
the frozen-weight scorer (:func:`..functions.text.logistic_quality`).

Public LM data pipelines gate documents with a cheap linear classifier
(fastText-style) trained on "good vs bad" exemplars. This module is
that trainer/scorer on Spark: the same :func:`..functions.text
.quality_features` signals feed a ``pyspark.ml`` logistic regression,
and scoring is a single ``model.transform`` — JVM-side, no Python in
the hot path.

Registry split: the FROZEN-weight scorer is what the oracle-checked
query (``quality_classifier_scores``) runs, because a value-exact
cross-engine oracle needs fixed arithmetic; this trained path carries
pytest evidence instead (seeded train → held-out accuracy bound →
agreement with the frozen scorer's ranking), the same convention as
the ALS/kmeans paths.

Scale shape: training input is a (bounded) labeled exemplar set —
thousands of rows, not the corpus; corpus scoring is one codegen'd
feature projection + a broadcast of the model's coefficient vector
inside ``model.transform``. No shuffle anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import quality_features

FEATURES = ["len_norm", "stopword_ratio", "punct_ratio", "avg_token_len"]


def quality_feature_frame(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, len_norm, stopword_ratio, punct_ratio, avg_token_len) —
    the classifier's feature projection, shared by train and score."""
    ft = quality_features(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.least(ft["n_tokens"] / F.lit(50.0), F.lit(1.0)).alias("len_norm"),
        ft["stopword_ratio"].alias("stopword_ratio"),
        ft["punct_ratio"].alias("punct_ratio"),
        (ft["avg_token_len"] / F.lit(10.0)).alias("avg_token_len"),
    )


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "label",
    max_iter: int = 50,
    reg_param: float = 0.01,
):
    """Fit a logistic-regression quality gate on labeled exemplars
    (label 1 = keep). Returns the fitted ``PipelineModel``; apply with
    :func:`score_quality_model`. Deterministic: LBFGS on a fixed
    feature order has no RNG state."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = quality_feature_frame(labeled, text_col, id_col).join(
        labeled.select(F.col(id_col).alias("doc_id"), label_col), "doc_id"
    )
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=FEATURES, outputCol="features"),
            LogisticRegression(
                featuresCol="features",
                labelCol=label_col,
                maxIter=max_iter,
                regParam=reg_param,
            ),
        ]
    )
    return pipe.fit(feats)


def score_quality_model(
    model,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus scoring with a trained gate: (doc_id, prob, keep).
    One feature projection + transform; the probability is the
    positive-class component of pyspark.ml's probability vector."""
    from pyspark.ml.functions import vector_to_array

    feats = quality_feature_frame(docs, text_col, id_col)
    out = model.transform(feats)
    prob = F.round(vector_to_array(F.col("probability"))[1], 6)
    return out.select(
        "doc_id",
        prob.alias("prob"),
        (prob >= 0.5).alias("keep"),
    )
