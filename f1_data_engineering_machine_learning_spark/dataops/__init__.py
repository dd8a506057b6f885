"""Large-scale training-data operators (the north star's LLM-data surface;
no reference counterpart — SURVEY §2.10, §7 step 7).

- ``text``       : tokenization, language-ID, quality scoring, token
                   counting, content fingerprinting — all JVM-side
                   expressions (no Python in the hot path).
- ``dedup``      : exact, MinHash+LSH, SimHash, n-gram Jaccard — candidate
                   generation and verification as DataFrame ops.
- ``similarity`` : brute-force cosine top-k baseline + LSH / IVF scale
                   paths over an ``array<float>`` embedding column.
- ``multimodal`` : binary-column plumbing (schema, batch shape, Pandas-UDF
                   signatures) with clearly-stubbed decoders.
"""

from f1_data_engineering_machine_learning_spark.dataops import dedup, similarity, text  # noqa: F401
