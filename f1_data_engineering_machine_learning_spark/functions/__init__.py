"""Scalar expression helpers (SURVEY §2.8) + numeric-stability helpers.

The reference's scalar surface is small: cast chains, COALESCE sentinels,
CASE WHEN, date functions, interval arithmetic
(/root/reference/sql/feature_store_drivers.sql:5-11,27,33). Everything here
is a thin, named composition of built-in ``pyspark.sql.functions`` — JVM-side,
codegen-friendly; no Python UDFs.

The ``dsum`` / ``davg`` helpers exist for oracle-exactness at any scale:
floating-point SUM is order-dependent, and Spark's partial aggregation order
is nondeterministic, so two runs (or Spark vs DuckDB) can differ in the last
ulps. Summing in DECIMAL is exact and associative — identical results
regardless of partitioning — then a final cast back to double is a single
deterministic rounding. At 100 TB this also makes aggregate results
reproducible run-to-run.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "sentinel_int",
    "str_to_date",
    "years_back",
    "dsum",
    "davg",
    "existence_flag",
]


def sentinel_int(col: Column | str, sentinel: int = 99) -> Column:
    """``COALESCE(INT(FLOAT(x)), sentinel)`` — permissive string->int cast with
    a sentinel for unparseable values (DNF positions in the reference,
    /root/reference/sql/feature_store_drivers.sql:5-6). ``try_cast`` keeps the
    semantics under ANSI mode too.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.try_cast("float").try_cast("int"), F.lit(sentinel))


def str_to_date(col: Column | str) -> Column:
    """``TO_DATE(TO_TIMESTAMP(x))`` — string-timestamp to date
    (/root/reference/sql/feature_store_drivers.sql:11)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(F.to_timestamp(c))


def years_back(col: Column | str, n: int = 1) -> Column:
    """``date - INTERVAL n YEARS`` — calendar-year (not 365-day) arithmetic
    (/root/reference/sql/feature_store_drivers.sql:27,88)."""
    c = F.col(col) if isinstance(col, str) else col
    return c - F.expr(f"INTERVAL {n} YEAR")


def _col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Deterministic SUM of a double column: sum in DECIMAL (exact,
    order-independent), emit double."""
    return F.sum(_col(col).cast(f"decimal(30,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Deterministic AVG of a double column: exact decimal sum divided by the
    non-null count, in IEEE double — identical across engines and
    partitionings (unlike AVG, whose accumulation order floats)."""
    c = _col(col)
    return (F.sum(c.cast(f"decimal(30,{scale})")).cast("double") / F.count(c)).cast(
        "double"
    )


def existence_flag(col: Column | str) -> Column:
    """``CASE WHEN x IS NOT NULL THEN 1 ELSE 0 END`` — binary label from a
    left-join hit (/root/reference/sql/abt_champions.sql:16)."""
    return F.when(_col(col).isNotNull(), F.lit(1)).otherwise(F.lit(0))
