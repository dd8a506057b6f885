"""f1_data_engineering_machine_learning_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference repo
``guifrs/f1_data_engineering_machine_learning`` (an F1 medallion pipeline:
raw CSV -> bronze -> silver -> point-in-time feature store -> ABT -> ML),
re-expressed as a generic, composable, oracle-checkable PySpark operator
library, plus the large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) the north star
requires.

Layout
------
- ``session``    : SparkSession factory (Delta-optional, parquet fallback)
- ``io``         : scans / sinks / temp-view registration (SURVEY §2.1)
- ``functions``  : scalar expression helpers (SURVEY §2.8)
- ``operators``  : relational operators — projections, filters, joins,
                   aggregates, windows, reshape (SURVEY §2.2–2.7)
- ``plans``      : point-in-time snapshot engine + incremental ingestor
                   (SURVEY §2.1 S9/S14, §3.2)
- ``pipeline``   : the F1-shaped medallion pipeline recomposed from the
                   operator library (bronze / champions / feature store / ABT)
- ``ml``         : Spark MLlib stage replacing the reference's pandas/sklearn
                   model (SURVEY §2.9)
- ``dataops``    : LLM-data operators — dedup (exact/minhash/simhash),
                   similarity search, text analysis, multimodal columns
- ``streaming``  : Structured-Streaming surface + batch-equivalent windowed
                   aggregations / sessionization
"""

__version__ = "0.1.0"

from f1_data_engineering_machine_learning_spark.session import build_session  # noqa: F401
