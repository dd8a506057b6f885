"""Distributed text classification: HashingTF -> IDF -> LogisticRegression.

The MLlib text-featurization pipeline the north star's text surface feeds
into (language/quality/topic classifiers over curated corpora). Fully
distributed: tokenization and hashing are narrow, IDF and LR are the only
shuffling stages; the feature space is fixed-width (``num_features``) so
the model size is independent of corpus vocabulary — the property that
matters when the corpus is 100 TB but the model must fit on one node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def text_classifier_pipeline(
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 1 << 14,
    reg_param: float = 0.01,
):
    """Tokenizer -> HashingTF -> IDF -> LogisticRegression pipeline."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import IDF, HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="__tokens", pattern=r"\s+", toLowercase=True
    )
    tf = HashingTF(
        inputCol="__tokens", outputCol="__tf", numFeatures=num_features
    )
    idf = IDF(inputCol="__tf", outputCol="features")
    lr = LogisticRegression(
        featuresCol="features", labelCol=label_col, regParam=reg_param
    )
    return Pipeline(stages=[tok, tf, idf, lr])


def train_text_classifier(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 1 << 14,
):
    """Fit and return (model, training accuracy)."""
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator

    model = text_classifier_pipeline(text_col, label_col, num_features).fit(df)
    # last pipeline stage is the classifier: strip its training summary
    # (see ml/model.py::strip_training_summary for the Spark 4.1
    # ObservationManager serialization hazard)
    from f1_data_engineering_machine_learning_spark.ml.model import (
        strip_training_summary,
    )

    strip_training_summary(model.stages[-1])
    scored = model.transform(df)
    acc = MulticlassClassificationEvaluator(
        labelCol=label_col, predictionCol="prediction", metricName="accuracy"
    ).evaluate(scored)
    return model, acc
