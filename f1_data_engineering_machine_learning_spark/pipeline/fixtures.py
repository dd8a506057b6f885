"""Deterministic F1-shaped fixture (FIXTURES.md §A).

Synthesizes the bronze ``results`` table exactly as the reference sees it —
every column a string (/root/reference/scripts/02_bronze.py:97) — with the
value properties the semantics need: DNFs ("R"/None) for the sentinel cast,
float-strings ("3.0"), sprints only in later seasons/rounds, driver turnover
across seasons (trailing-activity gate), pit-lane grid "0"s, positive and
negative position gains. Seed-stable.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import DataFrame, SparkSession

RACE_POINTS = [25, 18, 15, 12, 10, 8, 6, 4, 2, 1]
SPRINT_POINTS = [8, 7, 6, 5, 4, 3, 2, 1, 0, 0]

SEASONS = [2021, 2022, 2023]
ROUNDS_PER_SEASON = 10
SPRINT_ROUNDS = {2022: {2, 5, 8}, 2023: {2, 5, 8}}
DRIVERS_PER_SEASON = 10
LOCATIONS = [f"loc_{i:02d}" for i in range(1, ROUNDS_PER_SEASON + 1)]


def _season_drivers(year: int) -> list[str]:
    """Sliding driver roster: 2021 -> d01..d10, 2022 -> d02..d11, ... so
    some drivers leave the trailing-1y activity window mid-season
    (FIXTURES.md §A property 3)."""
    shift = year - SEASONS[0]
    return [f"driver_{i:02d}" for i in range(1 + shift, DRIVERS_PER_SEASON + 1 + shift)]


def results_rows(seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    rows: list[dict] = []
    for year in SEASONS:
        drivers = _season_drivers(year)
        for rnd in range(1, ROUNDS_PER_SEASON + 1):
            race_date = dt.datetime(year, 3, 1, 15, 0, 0) + dt.timedelta(
                days=14 * (rnd - 1)
            )
            sessions = [("race", race_date)]
            if rnd in SPRINT_ROUNDS.get(year, set()):
                sessions.insert(0, ("sprint", race_date - dt.timedelta(days=1)))
            for identifier, when in sessions:
                finish = drivers[:]
                rng.shuffle(finish)
                grid = drivers[:]
                rng.shuffle(grid)
                grid_of = {d: i + 1 for i, d in enumerate(grid)}
                pts = RACE_POINTS if identifier == "race" else SPRINT_POINTS
                for pos_idx, driver in enumerate(finish):
                    position = pos_idx + 1
                    dnf = rng.random() < 0.08 and position > 3
                    pos_str: str | None
                    if dnf:
                        pos_str = rng.choice(["R", None])
                        points = 0
                    else:
                        # ~25% float-strings like "3.0" (FIXTURES.md §A)
                        pos_str = (
                            f"{position}.0" if rng.random() < 0.25 else str(position)
                        )
                        points = pts[pos_idx]
                    g = grid_of[driver]
                    grid_str: str | None = str(g)
                    r = rng.random()
                    if r < 0.03:
                        grid_str = "0"  # pit-lane start
                    elif r < 0.05:
                        grid_str = None
                    rows.append(
                        {
                            "DriverNumber": str(10 + int(driver[-2:])),
                            "DriverId": driver,
                            "TeamId": f"team_{(int(driver[-2:]) - 1) // 2:02d}",
                            "Position": pos_str,
                            "GridPosition": grid_str,
                            "Status": "Finished" if not dnf else "Collision",
                            "Points": f"{points}.0",
                            "Laps": str(rng.randint(50, 70)),
                            "identifier": identifier,
                            "date": str(when),
                            "year": str(year),
                            "RoundNumber": str(rnd),
                            "Country": f"country_{rnd:02d}",
                            "Location": LOCATIONS[rnd - 1],
                            "OfficialEventName": f"GP {rnd:02d} {year}",
                        }
                    )
    return rows


def results_fixture(spark: SparkSession, seed: int = 42) -> DataFrame:
    """The all-string bronze ``results`` frame."""
    rows = results_rows(seed)
    cols = list(rows[0].keys())
    return spark.createDataFrame(
        [[r[c] for c in cols] for r in rows],
        schema=", ".join(f"{c} string" for c in cols),
    )
