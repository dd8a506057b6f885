"""Spark Python DataSource for the F1 results API (SURVEY §2.1 S1).

The reference ingests from the FastF1 web API in a driver-side loop —
one ``session.load()`` call per (year, round, session) — then hands pandas
frames to Spark (/root/reference/scripts/01_raw.py). That serializes the
slowest part of the pipeline through one process. This connector moves the
API boundary INTO Spark's source layer using the PySpark 4 Python
DataSource API:

- one ``InputPartition`` per (year, round) race weekend, so fetches run in
  parallel across executors, scale with the cluster, and retry per-task on
  failure — the properties a driver-side loop can never have;
- the schema is declared up front (all-string, the reference's bronze
  contract), so downstream plans bind without an inference pass;
- ``spark.read.format("f1results")`` composes with every other operator —
  the ingest pipeline reads the API exactly like it reads parquet.

The network call itself is replaced by the deterministic fixture generator
(`pipeline/fixtures.py` — this container has no network and `fastf1` is
not installed; the seam is ``_partition_rows``, which a real deployment
points at ``fastf1.get_session(...).load()``). Everything Spark-side —
registration, partition planning, per-partition iteration, option
handling — is the real production surface and is tested.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: bronze results schema — column order matches pipeline/fixtures.py rows
#: (every field string, /root/reference/scripts/02_bronze.py:97 contract)
RESULTS_SCHEMA_FIELDS: Sequence[str] = (
    "DriverNumber",
    "DriverId",
    "TeamId",
    "Position",
    "GridPosition",
    "Status",
    "Points",
    "Laps",
    "identifier",
    "date",
    "year",
    "RoundNumber",
    "Country",
    "Location",
    "OfficialEventName",
)

RESULTS_SCHEMA = ", ".join(f"{c} string" for c in RESULTS_SCHEMA_FIELDS)


class RaceWeekendPartition(InputPartition):
    """One race weekend = one fetch task (both its sessions: sprint+race)."""

    def __init__(self, year: int, round_number: int, seed: int):
        self.year = year
        self.round_number = round_number
        self.seed = seed


class F1ResultsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.seed = int(options.get("seed", 42))
        years = options.get("years")
        from f1_data_engineering_machine_learning_spark.pipeline import fixtures

        self.years = (
            [int(y) for y in str(years).split(",")] if years else list(fixtures.SEASONS)
        )
        self.rounds = int(options.get("rounds", fixtures.ROUNDS_PER_SEASON))

    def partitions(self) -> list[RaceWeekendPartition]:
        return [
            RaceWeekendPartition(y, r, self.seed)
            for y in self.years
            for r in range(1, self.rounds + 1)
        ]

    def read(self, partition: RaceWeekendPartition) -> Iterator[tuple]:
        for row in _partition_rows(
            partition.year, partition.round_number, partition.seed
        ):
            yield tuple(row[c] for c in RESULTS_SCHEMA_FIELDS)


def _partition_rows(year: int, round_number: int, seed: int) -> list[dict]:
    """The API seam: rows for ONE race weekend.

    Real deployment: ``fastf1.get_session(year, round_number, ...)`` per
    identifier, retried per task. Here: replay the deterministic fixture
    stream and slice this weekend's rows (generation is cheap; a remote
    API would fetch only this slice to begin with).
    """
    from f1_data_engineering_machine_learning_spark.pipeline.fixtures import (
        results_rows,
    )

    y, r = str(year), str(round_number)
    return [
        row
        for row in results_rows(seed)
        if row["year"] == y and row["RoundNumber"] == r
    ]


class F1ResultsDataSource(DataSource):
    """``spark.read.format("f1results")`` — options: seed, years ("2021,2022"),
    rounds."""

    @classmethod
    def name(cls) -> str:
        return "f1results"

    def schema(self) -> str:
        return RESULTS_SCHEMA

    def reader(self, schema) -> F1ResultsReader:
        return F1ResultsReader(self.options)


def register(spark) -> None:
    """Idempotently register the connector on a session."""
    spark.dataSource.register(F1ResultsDataSource)
