"""Frame comparison helper: exact, order-insensitive, engine-neutral."""

from __future__ import annotations

import math

import pandas as pd


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    return v


def normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        if pd.api.types.is_numeric_dtype(out[c]) or out[c].dtype == object:
            try:
                converted = pd.to_numeric(out[c])
                if pd.api.types.is_numeric_dtype(converted):
                    out[c] = converted.astype("float64")
            except (ValueError, TypeError):
                pass
    rows = [
        tuple(_norm(v) for v in row)
        for row in out.itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def assert_frames_equal(a: pd.DataFrame, b: pd.DataFrame, label: str = ""):
    assert sorted(a.columns) == sorted(b.columns), (
        f"{label}: columns differ: {sorted(a.columns)} vs {sorted(b.columns)}"
    )
    assert len(a) == len(b), f"{label}: rowcount {len(a)} vs {len(b)}"
    ra, rb = normalize(a), normalize(b)
    for i, (x, y) in enumerate(zip(ra, rb)):
        assert x == y, f"{label}: first row mismatch at {i}:\n  {x}\n  {y}"
