"""Visualization stage: distributed frame prep + the optional render seam.

The render itself needs matplotlib, which is absent in this container —
the PNG test skips VISIBLY (reason in the report) rather than silently
never executing; the CSV fallback, which is what actually runs here, is
tested for real.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from f1_data_engineering_machine_learning_spark.pipeline.viz import (
    bar_race_frame,
    render_line_chart,
    score_history,
    top_entities_at,
)

try:  # pragma: no cover - optional dependency
    import matplotlib  # type: ignore # noqa: F401

    HAS_MPL = True
except ImportError:
    HAS_MPL = False


@pytest.fixture(scope="module")
def scored(spark):
    rows = [
        ("2020-01-01", "a", 0.9),
        ("2020-01-01", "b", 0.5),
        ("2020-01-01", "c", 0.1),
        ("2020-02-01", "a", 0.7),
        ("2020-02-01", "b", 0.8),
        ("2020-02-01", "c", 0.2),
        ("2020-02-01", "c", 0.4),  # duplicate slot: keep-last wins
    ]
    return spark.createDataFrame(rows, ["dtRef", "DriverId", "proba"])


def test_top_entities_and_history(scored):
    top = top_entities_at(scored, "dtRef", "2020-02-01", k=2)
    assert top == ["b", "a"]
    hist = score_history(scored, top).collect()
    assert {r.DriverId for r in hist} == {"a", "b"}
    assert all(0 <= r.predict_pct <= 100 for r in hist)


def test_bar_race_frame_wide_and_keep_last(scored):
    wide = bar_race_frame(scored).collect()
    cols = wide[0].asDict()
    assert set(cols) == {"dtRef", "a", "b", "c"}
    feb = [r for r in wide if r.dtRef == "2020-02-01"][0]
    assert feb.c == pytest.approx(40.0)  # keep-LAST of the duplicate slot


def test_render_falls_back_to_csv(scored, tmp_path):
    if HAS_MPL:
        pytest.skip("matplotlib installed: CSV fallback not reachable")
    pdf = score_history(scored, ["a", "b"]).toPandas()
    out = render_line_chart(pdf, "dtRef", "predict_pct", "DriverId",
                            str(tmp_path / "chart.png"))
    assert out.endswith(".csv")
    assert (tmp_path / "chart.csv").read_text().startswith("dtRef")


@pytest.mark.skipif(not HAS_MPL, reason="matplotlib not installed in this environment")
def test_render_real_png(scored, tmp_path):  # pragma: no cover
    pdf = score_history(scored, ["a", "b"]).toPandas()
    out = render_line_chart(pdf, "dtRef", "predict_pct", "DriverId",
                            str(tmp_path / "chart.png"))
    assert out.endswith(".png")
    assert (tmp_path / "chart.png").read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"
