"""Raw CSV stage: S1-S5 loop — fixture rows -> per-session CSVs -> bronze."""

from __future__ import annotations

import pytest

from f1_data_engineering_machine_learning_spark.pipeline.bronze import build_bronze
from f1_data_engineering_machine_learning_spark.pipeline.fixtures import results_rows
from f1_data_engineering_machine_learning_spark.pipeline.raw import write_raw_csvs


def test_raw_to_bronze_roundtrip(spark, tmp_path):
    rows = results_rows()
    paths = write_raw_csvs(rows, str(tmp_path / "raw"))
    # one file per (year, round, identifier): 3 seasons x 10 rounds + 6 sprints
    assert len(paths) == 36
    assert paths[0].endswith("2021_01_race.csv")

    bronze = build_bronze(spark, str(tmp_path / "raw" / "*.csv"))
    assert bronze.count() == len(rows)
    # the all-string bronze contract (02_bronze.py:97 — no inferSchema)
    assert all(t == "string" for _, t in bronze.dtypes)
    # null round-trips: csv empty cell -> NULL back in Spark
    assert bronze.filter("Position IS NULL").count() > 0


def test_empty_glob_is_hard_error(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        build_bronze(spark, str(tmp_path / "nothing" / "*.csv"))
