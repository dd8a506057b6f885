"""Python UDTF (dataops/udtfs.py): LATERAL-join sentence segmentation."""

from __future__ import annotations

from f1_data_engineering_machine_learning_spark.dataops.udtfs import register_udtfs


def test_lateral_split_sentences(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [
            (1, "First one. Second here!  Third?"),
            (2, "No terminal punctuation"),
            (3, None),
            (4, ""),
        ],
        "doc_id long, text string",
    ).createOrReplaceTempView("docs_udtf")
    rows = spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence, s.char_start, s.n_tokens
        FROM docs_udtf d, LATERAL split_sentences(d.text) s
        ORDER BY d.doc_id, s.sent_idx
        """
    ).collect()
    got = [(r.doc_id, r.sent_idx, r.sentence, r.char_start, r.n_tokens) for r in rows]
    assert got == [
        (1, 0, "First one.", 0, 2),
        (1, 1, "Second here!", 11, 2),
        (1, 2, "Third?", 25, 1),
        (2, 0, "No terminal punctuation", 0, 3),
    ]  # doc 3 (NULL) and doc 4 (empty) yield no rows


def test_offsets_reconstruct_source(spark):
    register_udtfs(spark)
    text = "Alpha beta. Gamma!   Delta epsilon zeta."
    spark.createDataFrame([(text,)], "text string").createOrReplaceTempView(
        "one_doc_udtf"
    )
    rows = spark.sql(
        "SELECT s.* FROM one_doc_udtf d, LATERAL split_sentences(d.text) s"
    ).collect()
    for r in rows:
        assert text[r.char_start : r.char_start + len(r.sentence)] == r.sentence
