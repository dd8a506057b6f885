"""The F1-shaped medallion pipeline, recomposed from the operator library
(SURVEY §7 step 4): raw CSV -> bronze (all-string) -> champions ->
point-in-time driver feature store -> ABT."""

from f1_data_engineering_machine_learning_spark.pipeline.bronze import build_bronze  # noqa: F401
from f1_data_engineering_machine_learning_spark.pipeline.champions import champions  # noqa: F401
from f1_data_engineering_machine_learning_spark.pipeline.feature_store import (  # noqa: F401
    driver_feature_snapshot,
    driver_feature_store,
    driver_snapshot_columns,
    event_dates,
    typed_results,
)
from f1_data_engineering_machine_learning_spark.pipeline.abt import abt_champions  # noqa: F401
