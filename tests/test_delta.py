"""Delta Lake surface: visible-skip coverage of the optional paths.

delta-spark is not installed in this container, so the Delta branches of
io.py / plans/ingest.py (replaceWhere, VACUUM, MERGE upsert) cannot
execute here. These tests make that untested surface VISIBLE in the test
report (skipped, with the reason) instead of silently never running; on
an environment with delta-spark they execute for real against a local
Delta table.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

try:  # pragma: no cover - optional dependency
    import delta  # type: ignore # noqa: F401

    HAS_DELTA = True
except ImportError:
    HAS_DELTA = False

needs_delta = pytest.mark.skipif(
    not HAS_DELTA, reason="delta-spark not installed in this environment"
)


def test_delta_catalog_class_names():
    """The exact integration class names the session wires when Delta
    loads. The catalog lives under ``sql.delta.catalog`` — a plausible-
    looking ``sql.catalog`` value breaks every catalog operation the
    moment Delta is actually enabled, while staying invisible without it."""
    from f1_data_engineering_machine_learning_spark.session import (
        DELTA_CATALOG_CLASS,
        DELTA_SQL_EXTENSION,
    )

    assert DELTA_CATALOG_CLASS == "org.apache.spark.sql.delta.catalog.DeltaCatalog"
    assert DELTA_SQL_EXTENSION == "io.delta.sql.DeltaSparkSessionExtension"


def test_delta_disabled_falls_back_to_parquet(spark, tmp_path):
    """Without delta-spark the sinks must transparently write parquet."""
    from f1_data_engineering_machine_learning_spark.io import (
        read_table,
        write_table_overwrite,
    )
    from f1_data_engineering_machine_learning_spark.session import delta_enabled

    if HAS_DELTA:
        pytest.skip("delta installed: fallback path not reachable")
    assert not delta_enabled(spark)
    path = str(tmp_path / "t")
    write_table_overwrite(spark.range(5).toDF("id"), path)
    assert not os.path.isdir(os.path.join(path, "_delta_log"))
    assert read_table(spark, path).count() == 5


@needs_delta
def test_delta_replace_where_slice(spark, tmp_path):  # pragma: no cover
    from f1_data_engineering_machine_learning_spark.io import write_partition_slice

    path = str(tmp_path / "sliced")
    base = spark.createDataFrame(
        [("2024-01-01", 2024, 1), ("2024-01-02", 2024, 2)], ["dtRef", "dtYear", "v"]
    )
    write_partition_slice(base, path, ["dtYear"])
    redo = spark.createDataFrame([("2024-01-02", 2024, 99)], ["dtRef", "dtYear", "v"])
    write_partition_slice(redo, path, ["dtYear"], replace_where="dtRef = '2024-01-02'")
    got = {r.dtRef: r.v for r in spark.read.format("delta").load(path).collect()}
    assert got == {"2024-01-01": 1, "2024-01-02": 99}


@needs_delta
def test_delta_vacuum_runs(spark, tmp_path):  # pragma: no cover
    from f1_data_engineering_machine_learning_spark.io import (
        vacuum,
        write_table_overwrite,
    )

    path = str(tmp_path / "vac")
    write_table_overwrite(spark.range(10).toDF("id"), path)
    write_table_overwrite(spark.range(10).toDF("id"), path)  # second version
    vacuum(spark, path, retention_hours=0.0)
    assert spark.read.format("delta").load(path).count() == 10


@needs_delta
def test_delta_merge_upsert(spark, tmp_path):  # pragma: no cover
    from f1_data_engineering_machine_learning_spark.io import write_table_overwrite
    from f1_data_engineering_machine_learning_spark.plans.ingest import upsert_table

    path = str(tmp_path / "merged")
    write_table_overwrite(
        spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]), path
    )
    upsert_table(
        spark, path, spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"]), ["k"]
    )
    got = {r.k: r.v for r in spark.read.format("delta").load(path).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
