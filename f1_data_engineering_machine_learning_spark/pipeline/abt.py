"""ABT: analytical base table = feature store + champion label.

Reproduces /root/reference/sql/abt_champions.sql: filter snapshots with a
non-NULL current-season form and before the out-of-time bound, left-join the
champions table on (DriverId, dtYear = year) — note the reference's
cross-type join (int dtYear vs bronze string year, SURVEY §1.2), made an
explicit cast here — and decorate with the binary ``flChamp`` label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.operators import label_join


def abt_champions(
    feature_store: DataFrame,
    champions: DataFrame,
    oot_bound: int = 2025,
) -> DataFrame:
    """``oot_bound`` is the reference's hard-coded ``dtYear < 2025``
    (/root/reference/sql/abt_champions.sql:9)."""
    fs = feature_store.filter(
        F.col("avgPositionCurrentTemp").isNotNull()
        & (F.col("dtYear") < F.lit(oot_bound))
    )
    champ = champions.select(
        F.col("DriverId").alias("__champ_driver"),
        F.col("year").cast("int").alias("__champ_year"),
    )
    out = label_join(
        fs,
        champ,
        (F.col("DriverId") == F.col("__champ_driver"))
        & (F.col("dtYear") == F.col("__champ_year")),
        "flChamp",
        "__champ_driver",
    )
    return out.drop("__champ_driver", "__champ_year")
