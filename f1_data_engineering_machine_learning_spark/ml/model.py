"""Champion-prediction model: splits, sentinel imputation, RandomForest.

Maps the reference's pandas/sklearn stage
(/root/reference/scripts/05_ml_model.py) onto MLlib:

- M1 OOT split (lines 40-87)            -> two filters on dtYear
- M2 group-level random split (69-80)   -> F.rand(seed) over distinct
  (DriverId, dtYear) pairs + inner join back. Exact RNG parity with
  numpy is impossible (SURVEY §7 hard part (e)); the contract — split by
  group so a driver-year never straddles train/test, ~80/20, seeded
  determinism — is preserved and tested.
- M3 sentinel imputation (140-172)      -> fillna(99) on the 12 sprint
  position features, fillna(0) on the 6 sprint gain features
- M4 RandomForest (174-185)             -> RandomForestClassifier(seed=42,
  minInstancesPerNode=20) after VectorAssembler
- M5 scoring (215-230)                  -> transform + probability[1]
- M6 metrics (217-235)                  -> accuracy + areaUnderROC
- M7 feature importance (238-245)       -> featureImportances zip
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the reference imputes 99 into the 12 sprint position/grid features and 0
#: into the 6 sprint gain features (/root/reference/scripts/05_ml_model.py:140-172)
SPRINT_POSITION_FEATURES = [
    f"{stat}{base}{suffix}"
    for stat in ("avg", "median")
    for base in ("PositionSprint", "GridPositionSprint")
    for suffix in ("", "1Year", "CurrentTemp")
]
SPRINT_GAIN_FEATURES = [
    f"{stat}PositionSprintGain{suffix}"
    for stat in ("avg", "median")
    for suffix in ("", "1Year", "CurrentTemp")
]

#: columns that are identifiers/labels, never features
#: (/root/reference/scripts/05_ml_model.py:121-126)
NON_FEATURE_COLUMNS = {"DriverId", "dtRef", "flChamp"}


def feature_columns(df: DataFrame) -> list[str]:
    """All columns minus identifiers and the label (P11 column exclusion)."""
    return [c for c in df.columns if c not in NON_FEATURE_COLUMNS]


def oot_split(df: DataFrame, oot_year: int = 2024) -> tuple[DataFrame, DataFrame]:
    """(training pool, out-of-time holdout) by dtYear (M1)."""
    return (
        df.filter(F.col("dtYear") < oot_year),
        df.filter(F.col("dtYear") == oot_year),
    )


def group_random_split(
    df: DataFrame,
    group_cols: Sequence[str] = ("DriverId", "dtYear"),
    test_frac: float = 0.2,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Group-integral random split (M2): all rows of a (DriverId, dtYear)
    land on the same side. ``F.rand(seed)`` over the distinct group frame is
    deterministic for a fixed partitioning — we repartition(1) the (tiny)
    group frame so the assignment is stable run-to-run."""
    groups = (
        df.select(*group_cols)
        .distinct()
        .repartition(1)
        .sortWithinPartitions(*group_cols)
        .withColumn("__r", F.rand(seed))
    )
    train_groups = groups.filter(F.col("__r") >= test_frac).drop("__r")
    test_groups = groups.filter(F.col("__r") < test_frac).drop("__r")
    on = list(group_cols)
    return (
        df.join(F.broadcast(train_groups), on, "inner"),
        df.join(F.broadcast(test_groups), on, "inner"),
    )


def impute_sentinels(df: DataFrame) -> DataFrame:
    """M3: 99 into sprint position features, 0 into sprint gain features —
    NULL here means 'never started a sprint in scope', and the reference
    encodes that as worst-possible position / zero gain."""
    fills: dict[str, float] = {}
    for c in SPRINT_POSITION_FEATURES:
        if c in df.columns:
            fills[c] = 99.0
    for c in SPRINT_GAIN_FEATURES:
        if c in df.columns:
            fills[c] = 0.0
    return df.fillna(fills)


def champion_model(feature_cols: Sequence[str], label_col: str = "flChamp"):
    """VectorAssembler + RandomForestClassifier(seed=42,
    minInstancesPerNode=20) — the MLlib twin of the reference's sklearn
    Pipeline (M4). ``handleInvalid='keep'`` covers residual NULLs the
    sentinel imputer doesn't own (the reference imputes only sprint
    features; other NULL features are filtered by the ABT gate)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.feature import VectorAssembler

    assembler = VectorAssembler(
        inputCols=list(feature_cols), outputCol="features", handleInvalid="keep"
    )
    rf = RandomForestClassifier(
        featuresCol="features",
        labelCol=label_col,
        seed=42,
        minInstancesPerNode=20,
        numTrees=100,
    )
    return Pipeline(stages=[assembler, rf])


def score(model, df: DataFrame) -> DataFrame:
    """M5: adds ``predict`` (class) and ``proba`` (P(champ)) columns."""
    from pyspark.ml.functions import vector_to_array

    out = model.transform(df)
    return out.withColumn(
        "proba", vector_to_array(F.col("probability"))[1]
    ).withColumnRenamed("prediction", "predict")


def evaluate(scored: DataFrame, label_col: str = "flChamp") -> dict[str, float]:
    """M6: accuracy + ROC-AUC, computed distributed."""
    from pyspark.ml.evaluation import (
        BinaryClassificationEvaluator,
        MulticlassClassificationEvaluator,
    )

    with_double = scored.withColumn("__label", F.col(label_col).cast("double"))
    auc = BinaryClassificationEvaluator(
        labelCol="__label", rawPredictionCol="rawPrediction", metricName="areaUnderROC"
    ).evaluate(with_double)
    acc = MulticlassClassificationEvaluator(
        labelCol="__label", predictionCol="predict", metricName="accuracy"
    ).evaluate(with_double.withColumn("predict", F.col("predict").cast("double")))
    return {"accuracy": acc, "roc_auc": auc}


def feature_importances(model, feature_cols: Sequence[str]) -> list[tuple[str, float]]:
    """M7: (name, importance) sorted desc, zeros dropped."""
    rf_model = model.stages[-1]
    imps = rf_model.featureImportances.toArray()
    pairs = [(n, float(v)) for n, v in zip(feature_cols, imps) if v > 0]
    return sorted(pairs, key=lambda kv: -kv[1])


def strip_training_summary(model) -> None:
    """Drop a fitted model's training summary BEFORE the model rides into
    prediction closures. Spark 4.1 hazard: the summary holds a
    SparkSession reference, and the session's ``observationManager`` is a
    lazily-initialized NON-transient field — null (and silently skipped
    by Java serialization) until the first ``Dataset.observe`` anywhere
    in the session, after which every closure that captures the session
    fails with ``Task not serializable``. Training a model and computing
    write-audit metrics (plans/export.py::write_with_audit) in the same
    session is exactly that combination. Best-effort: MLlib models
    without a summary are left untouched; PipelineModels strip each
    stage.

    The summary field is a Scala ``Option``: it must be cleared with
    ``Option.empty()``, not py4j ``None`` — a raw null makes a later
    ``model.hasSummary`` throw NullPointerException (``isDefined`` on
    null) instead of returning False."""
    from pyspark import SparkContext

    stages = getattr(model, "stages", None)
    for m in stages if stages is not None else [model]:
        try:
            jobj = getattr(m, "_java_obj", None)
            if jobj is None:
                continue
            jvm = SparkContext._active_spark_context._jvm
            jobj.setSummary(jvm.scala.Option.empty())
        except Exception:
            pass


def train_champion_model(
    abt: DataFrame, oot_year: int = 2024, seed: int = 42
) -> dict:
    """End-to-end M1-M7: split, impute, train, score, evaluate. Returns the
    fitted model, per-split metrics, and importances; nothing is collected
    except scalar metrics."""
    pool, oot = oot_split(abt, oot_year)
    train, test = group_random_split(pool, seed=seed)
    feats = feature_columns(abt)
    numeric_feats = [
        c
        for c in feats
        if dict(abt.dtypes)[c] in ("int", "bigint", "double", "float")
    ]

    train_i = impute_sentinels(train)
    # Guard the degenerate split: a training pool whose group split left
    # a single label class fits a 1-class forest whose probability
    # vectors have length 1, and the AUC evaluator then dies with an
    # opaque "rawPredictionCol vectors must have length=2". Surface the
    # real cause instead — tight OOT bounds on small pools hit this
    # (e.g. the fixture's oot_year=2022 leaves one season to split).
    n_classes = train_i.select("flChamp").distinct().count()
    if n_classes < 2:
        raise ValueError(
            "training split has a single flChamp class; widen the pool "
            "(earlier oot_year) or re-seed group_random_split"
        )
    model = champion_model(numeric_feats).fit(train_i)
    strip_training_summary(model)

    result = {"model": model, "features": numeric_feats, "metrics": {}}
    for name, split in (("train", train), ("test", test), ("oot", oot)):
        scored = score(model, impute_sentinels(split))
        if scored.limit(1).count() > 0:
            result["metrics"][name] = evaluate(scored)
    result["importances"] = feature_importances(model, numeric_feats)
    return result
