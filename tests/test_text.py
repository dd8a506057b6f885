

def test_normalize_unicode_nfc_matches_duckdb_and_composes(spark):
    """NFC parity with DuckDB's nfc_normalize on planted multi-form
    Unicode (the cross-engine contract the ASCII corpus can't exercise):
    decomposed sequences compose, already-NFC text is unchanged
    (idempotence), compatibility forms (ligatures) are NOT folded, and
    NULL passes through."""
    import duckdb

    from f1_data_engineering_machine_learning_spark.dataops.text import (
        normalize_unicode_nfc,
    )

    cases = [
        "café",          # e + combining acute -> é composed
        "café",                # already NFC
        "ﬁle",                 # ﬁ ligature: NFC keeps it (NFKC wouldn't)
        "Å",                  # A + ring -> Å
        "Á̧",       # multiple combining marks
        "plain ascii",
        None,
    ]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    got = [r.n for r in normalize_unicode_nfc(df, "t", "n").orderBy("t").collect()]
    con = duckdb.connect()
    want = [
        con.sql("SELECT nfc_normalize(?) AS n", params=[c]).fetchone()[0]
        if c is not None
        else None
        for c in sorted([c for c in cases if c is not None])
    ] + [None]
    # align: Spark orderBy puts NULL first
    assert got[0] is None
    assert got[1:] == want[:-1]
    # idempotence + composition spot checks
    import unicodedata

    assert unicodedata.normalize("NFC", cases[0]) == "café"
    assert "café" in got
    assert "ﬁle" in got  # ligature untouched by NFC
