"""Raw CSV stage: S1-S5 loop — fixture rows -> per-session CSVs -> bronze."""

from __future__ import annotations

import pytest

from f1_data_engineering_machine_learning_spark.pipeline.bronze import build_bronze
from f1_data_engineering_machine_learning_spark.pipeline.fixtures import results_rows
from f1_data_engineering_machine_learning_spark.pipeline.raw import write_raw_csvs


def test_jsonl_roundtrip_documents(spark, sf_dir, tmp_path):
    """JSONL corpus interchange: write the documents table as gzipped
    JSON-Lines shards, read it back with an explicit schema — identical
    contents, no corrupt records, multiple shards (never coalesce(1))."""
    from f1_data_engineering_machine_learning_spark import io as fio

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(4)
    path = str(tmp_path / "docs_jsonl")
    fio.write_jsonl(docs, path)
    import glob

    assert len(glob.glob(f"{path}/part-*.json.gz")) == 4
    back = fio.read_jsonl(
        spark,
        path,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).cache()  # cache: Spark disallows corrupt-column-only scans (see read_jsonl)
    assert back.filter("_corrupt_record IS NOT NULL").count() == 0
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    diff = (
        back.select(cols).exceptAll(docs.select(cols)).count()
        + docs.select(cols).exceptAll(back.select(cols)).count()
    )
    assert diff == 0


def test_jsonl_malformed_lines_quarantined_not_fatal(spark, tmp_path):
    from f1_data_engineering_machine_learning_spark import io as fio

    p = tmp_path / "shard.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok"}\n'
    )
    back = fio.read_jsonl(
        spark, str(tmp_path), "doc_id bigint, text string"
    ).cache()
    assert back.count() == 3  # bad line is a row, not a crash
    assert back.filter("_corrupt_record IS NOT NULL").count() == 1
    assert back.filter("doc_id IS NOT NULL").count() == 2


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
