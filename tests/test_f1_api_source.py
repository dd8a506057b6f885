"""PySpark 4 Python DataSource connector for the F1 results API
(sources/f1_api.py): partition planning, option handling, and parity with
the driver-side fixture path it replaces."""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.pipeline.fixtures import (
    ROUNDS_PER_SEASON,
    SEASONS,
    results_fixture,
)
from f1_data_engineering_machine_learning_spark.sources.f1_api import (
    F1ResultsReader,
    register,
)


def test_source_matches_driver_side_fixture(spark):
    register(spark)
    via_source = spark.read.format("f1results").option("seed", "42").load()
    via_driver = results_fixture(spark, seed=42)
    assert via_source.schema == via_driver.schema
    a = {tuple(r) for r in via_source.collect()}
    b = {tuple(r) for r in via_driver.collect()}
    assert a == b and len(a) > 0


def test_one_partition_per_race_weekend(spark):
    reader = F1ResultsReader({})
    parts = reader.partitions()
    assert len(parts) == len(SEASONS) * ROUNDS_PER_SEASON
    # each partition yields only its own weekend's rows
    p = parts[0]
    rows = list(reader.read(p))
    assert rows, "weekend partition produced no rows"
    year_idx, round_idx = 10, 11  # schema positions of year / RoundNumber
    assert {(r[year_idx], r[round_idx]) for r in rows} == {
        (str(p.year), str(p.round_number))
    }


def test_year_and_round_options_prune_partitions(spark):
    register(spark)
    df = (
        spark.read.format("f1results")
        .option("years", "2022")
        .option("rounds", "3")
        .load()
    )
    got = df.select("year", "RoundNumber").distinct().collect()
    assert {(r["year"], r["RoundNumber"]) for r in got} == {
        ("2022", str(i)) for i in (1, 2, 3)
    }
    # option-driven pruning happens at partition PLANNING, not as a filter
    assert len(F1ResultsReader({"years": "2022", "rounds": "3"}).partitions()) == 3
