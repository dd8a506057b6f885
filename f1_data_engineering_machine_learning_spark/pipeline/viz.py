"""Visualization stage (SURVEY §2.9 M8-M10).

The reference renders 3 PNG line charts + a bar-chart-race GIF from pandas
frames (/root/reference/scripts/05_ml_model.py:250-485). Split cleanly in
two here:

- **frame preparation is DISTRIBUTED** — top-k selection, history filtering,
  keep-last dedup, and the long->wide pivot all run as Spark plans; only the
  final plot-ready frames (a few hundred rows) cross to the driver.
- **rendering is driver-side and optional** — matplotlib isn't in this
  container, so ``render_line_chart`` gates behind an import-try and
  otherwise writes the frame as CSV next to the requested output path (the
  data a chart would show, losslessly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.operators.reshape import pivot_agg
from f1_data_engineering_machine_learning_spark.operators.windows import (
    dedup_keep_last,
    topk,
)


def top_entities_at(
    scored: DataFrame,
    at_col: str,
    at_value,
    entity_col: str = "DriverId",
    score_col: str = "proba",
    k: int = 5,
) -> list[str]:
    """Top-k entities by score at one reference point — the reference's
    'top-5 drivers at the last round'
    (/root/reference/scripts/05_ml_model.py:260-266), distributed
    (TakeOrderedAndProject), only k ids collected."""
    frame = scored.filter(F.col(at_col) == at_value)
    rows = topk(frame, [F.desc(score_col), F.col(entity_col)], k).select(entity_col)
    return [r[0] for r in rows.collect()]


def score_history(
    scored: DataFrame,
    entities: list[str],
    entity_col: str = "DriverId",
    time_col: str = "dtRef",
    score_col: str = "proba",
) -> DataFrame:
    """Per-entity score-over-time frame for the line charts (P9 membership
    filter + projection), scaled to percent like the reference
    (/root/reference/scripts/05_ml_model.py:337)."""
    return (
        scored.filter(F.col(entity_col).isin(entities))
        .select(
            time_col,
            entity_col,
            (F.col(score_col) * 100).alias("predict_pct"),
        )
        .orderBy(time_col, entity_col)
    )


def bar_race_frame(
    scored: DataFrame,
    entity_col: str = "DriverId",
    time_col: str = "dtRef",
    score_col: str = "proba",
) -> DataFrame:
    """The bar-chart-race input: keep-LAST per (time, entity)
    (/root/reference/scripts/05_ml_model.py:441, M9) then pivot long->wide
    with zero fill (:444-448, M8). Pivot width = entity count — bounded by
    the caller passing a filtered entity set at scale."""
    last = dedup_keep_last(scored, [time_col, entity_col], [score_col])
    entities = sorted(
        r[0] for r in last.select(entity_col).distinct().collect()
    )
    return pivot_agg(
        last,
        [time_col],
        entity_col,
        entities,
        F.first(F.col(score_col) * 100),
        fill=0,
    ).orderBy(time_col)


def render_line_chart(pdf, x: str, y: str, series: str, out_path: str) -> str:
    """Driver-side render; falls back to CSV when matplotlib is absent."""
    try:  # pragma: no cover - plotting library optional
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 6))
        for name, grp in pdf.groupby(series):
            ax.plot(grp[x], grp[y], label=str(name))
        ax.legend()
        ax.set_xlabel(x)
        ax.set_ylabel(y)
        fig.savefig(out_path, bbox_inches="tight")
        plt.close(fig)
        return out_path
    except ImportError:
        csv_path = out_path.rsplit(".", 1)[0] + ".csv"
        pdf.to_csv(csv_path, index=False)
        return csv_path
