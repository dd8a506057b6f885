"""DuckDB oracle for the F1 end-to-end pipeline gate query.

The driver's correctness gate runs each catalog query on Spark AND its
``oracle_sql()`` twin on DuckDB, comparing exact values. The F1 pipeline
(bronze results -> champions -> feature-store snapshots -> ABT,
/root/reference/sql/{champions,feature_store_drivers,abt_champions}.sql)
does not read the TPC-H-ish testdata tables — its input is the committed
deterministic fixture (pipeline/fixtures.py). To keep the oracle fully
self-contained (no filesystem access, no view registration), this module
renders the SAME fixture rows into an inline ``VALUES`` CTE and replays
the three reference SQL files on top of it, faithfully translated to
DuckDB (PERCENTILE -> quantile_cont, INT(FLOAT(x)) -> TRY_CAST chain,
TO_DATE(TO_TIMESTAMP(x)) -> CAST chain) with explicit result-type
normalization so Spark's and DuckDB's pandas dtypes line up bitwise.

Shared with the Spark side: the snapshot column list
(``driver_snapshot_columns``) and the type map (``abt_type_map``) are the
single source of truth for BOTH the oracle's final projection and the
catalog query's — one edit changes both sides together.
"""

from __future__ import annotations

from collections.abc import Sequence

from f1_data_engineering_machine_learning_spark.pipeline.feature_store import (
    driver_snapshot_columns,
)
from f1_data_engineering_machine_learning_spark.pipeline.fixtures import results_rows

#: fixture column order, = results_fixture's schema
_FIXTURE_COLS = [
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
]


def _sql_str(v: str | None) -> str:
    if v is None:
        return "CAST(NULL AS VARCHAR)"
    return "'" + v.replace("'", "''") + "'"


def results_values_cte(seed: int = 42) -> str:
    """The committed fixture as an inline all-VARCHAR VALUES relation —
    byte-identical rows to ``results_fixture(spark, seed)``."""
    rows = results_rows(seed)
    lines = ",\n    ".join(
        "(" + ", ".join(_sql_str(r[c]) for c in _FIXTURE_COLS) + ")"
        for r in rows
    )
    quoted = ", ".join(f'"{c}"' for c in _FIXTURE_COLS)
    return f"(SELECT * FROM (VALUES\n    {lines}\n) AS _t({quoted}))"


def abt_type_map() -> dict[str, str]:
    """Output-type normalization for the ABT gate query: column name ->
    SQL type, applied identically on the Spark side (``.cast``) and the
    oracle side (``CAST``) so pandas dtypes compare equal. Strings pass
    through untyped."""
    tm: dict[str, str] = {"dtYear": "INTEGER", "flChamp": "INTEGER"}
    for c in driver_snapshot_columns():
        if c.startswith(("qtd",)):
            tm[c] = "BIGINT"
        elif c.startswith(("avg", "median", "totalPoints")):
            tm[c] = "DOUBLE"
    return tm


def _fs_metric_block(suffix: str) -> str:
    """One scope's aggregate columns, replaying
    /root/reference/sql/feature_store_drivers.sql:30-120 (incl. the
    ``avgPositioCurrentTemp`` typo at line 100)."""
    metrics = [
        ("Position", "Position"),
        ("PositionRace", "Position"),
        ("PositionSprint", "Position"),
        ("GridPosition", "GridPosition"),
        ("GridPositionRace", "GridPosition"),
        ("GridPositionSprint", "GridPosition"),
        ("PositionGain", "GridPosition - Position"),
        ("PositionRaceGain", "GridPosition - Position"),
        ("PositionSprintGain", "GridPosition - Position"),
    ]

    def scoped(base: str, val: str) -> str:
        if "Race" in base:
            return f"CASE WHEN identifier = 'race' THEN {val} END"
        if "Sprint" in base:
            return f"CASE WHEN identifier = 'sprint' THEN {val} END"
        return val

    cols = []
    if suffix == "":
        cols += [
            "COUNT(*) AS qtdRuns",
            "SUM(CASE WHEN identifier = 'race' THEN 1 ELSE 0 END) AS qtdRace",
            "SUM(CASE WHEN identifier = 'sprint' THEN 1 ELSE 0 END) AS qtdSprint",
        ]
    for base, val in metrics:
        name = f"avg{base}{suffix}"
        if (base, suffix) == ("PositionGain", "CurrentTemp"):
            name = "avgPositioCurrentTemp"
        cols.append(f"AVG({scoped(base, val)}) AS {name}")
    for base, val in metrics:
        cols.append(
            f"quantile_cont({scoped(base, val)}, 0.5) AS median{base}{suffix}"
        )
    cols += [
        f"SUM(CASE WHEN Position = 1 THEN 1 ELSE 0 END) AS qtdeWins{suffix}",
        f"SUM(CASE WHEN Position <= 3 THEN 1 ELSE 0 END) AS qtdePodiums{suffix}",
        f"SUM(CASE WHEN GridPosition = 1 THEN 1 ELSE 0 END) AS qtdePoles{suffix}",
    ]
    if suffix == "CurrentTemp":
        cols.append("SUM(CAST(Points AS DOUBLE)) AS totalPointsCurrentTemp")
    return ",\n           ".join(cols)


def _fs_snapshot_sql(date: str) -> str:
    """One feature-store snapshot date, replaying
    /root/reference/sql/feature_store_drivers.sql structure (4 CTEs +
    left joins) over the ``results`` relation in scope."""
    return f"""
(WITH tb_results AS (
    SELECT DriverId, identifier, Points,
           COALESCE(TRY_CAST(TRY_CAST(Position AS DOUBLE) AS INTEGER), 99) AS Position,
           COALESCE(TRY_CAST(TRY_CAST(GridPosition AS DOUBLE) AS INTEGER), 99) AS GridPosition,
           CAST(CAST("date" AS TIMESTAMP) AS DATE) AS dtEvent,
           RoundNumber
    FROM results
    WHERE CAST(CAST("date" AS TIMESTAMP) AS DATE) <= DATE '{date}'
),
tb_event AS (SELECT DISTINCT dtEvent, RoundNumber FROM tb_results),
tb_drivers AS (
    SELECT DISTINCT DriverId FROM tb_results
    WHERE dtEvent >= (DATE '{date}' - INTERVAL 1 YEAR)
),
tb_agg_life AS (
    SELECT DriverId, MAX('{date}') AS dtRef,
           YEAR(DATE '{date}') AS dtYear,
           {_fs_metric_block("")}
    FROM tb_results
    WHERE DriverId IN (SELECT DriverId FROM tb_drivers)
    GROUP BY DriverId
),
tb_agg_last_year AS (
    SELECT DriverId, {_fs_metric_block("1Year")}
    FROM tb_results
    WHERE DriverId IN (SELECT DriverId FROM tb_drivers)
      AND dtEvent >= (DATE '{date}' - INTERVAL 1 YEAR)
    GROUP BY DriverId
),
tb_agg_current_temp AS (
    SELECT DriverId, {_fs_metric_block("CurrentTemp")}
    FROM tb_results
    WHERE DriverId IN (SELECT DriverId FROM tb_drivers)
      AND YEAR(dtEvent) >= YEAR(DATE '{date}')
    GROUP BY DriverId
)
SELECT t4.RoundNumber AS tempRoundNumber, t1.*,
       t2.* EXCLUDE (DriverId), t3.* EXCLUDE (DriverId)
FROM tb_agg_life t1
LEFT JOIN tb_agg_last_year t2 ON t1.DriverId = t2.DriverId
LEFT JOIN tb_agg_current_temp t3 ON t1.DriverId = t3.DriverId
LEFT JOIN tb_event t4 ON CAST(t1.dtRef AS DATE) = t4.dtEvent)"""


def f1_abt_oracle_sql(
    dates: Sequence[str], oot_bound: int = 2025, seed: int = 42
) -> str:
    """The full end-to-end oracle: fixture VALUES -> champions
    (champions.sql, deterministic DriverId tie-break as in
    pipeline/champions.py) -> feature store over ``dates``
    (feature_store_drivers.sql) -> ABT label join (abt_champions.sql),
    with the shared type map applied in the final projection."""
    fs_union = "\nUNION ALL BY NAME\n".join(
        f"SELECT * FROM {_fs_snapshot_sql(d)}" for d in dates
    )
    tm = abt_type_map()
    out_cols = []
    for c in driver_snapshot_columns():
        src = f"t1.{c}"
        if c in tm:
            out_cols.append(f"CAST({src} AS {tm[c]}) AS {c}")
        else:
            out_cols.append(f"{src} AS {c}")
    out_cols.append(
        "CAST(CASE WHEN t2.DriverId IS NOT NULL THEN 1 ELSE 0 END"
        f" AS {tm['flChamp']}) AS flChamp"
    )
    cols_sql = ",\n       ".join(out_cols)
    return f"""
WITH results AS (SELECT * FROM {results_values_cte(seed)}),
champions AS (
  SELECT * FROM (
    SELECT year, DriverId,
           SUM(CAST(Points AS DOUBLE)) AS total_points,
           ROW_NUMBER() OVER (
             PARTITION BY year
             ORDER BY SUM(CAST(Points AS DOUBLE)) DESC, DriverId
           ) AS rn_driver
    FROM results GROUP BY year, DriverId
  ) WHERE rn_driver = 1
),
feature_store_drivers AS (
{fs_union}
),
tb_fs_drivers AS (
  SELECT * FROM feature_store_drivers
  WHERE avgPositionCurrentTemp IS NOT NULL AND dtYear < {oot_bound}
)
SELECT {cols_sql}
FROM tb_fs_drivers t1
LEFT JOIN champions t2
  ON t1.DriverId = t2.DriverId
 AND t1.dtYear = CAST(t2.year AS INTEGER)
"""
