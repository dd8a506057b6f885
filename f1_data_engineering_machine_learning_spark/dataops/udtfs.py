"""Python user-defined table functions (Spark 4 UDTF API).

Where a scalar UDF maps row -> value and explode maps row -> fixed-shape
array elements, a UDTF maps row -> ANY number of structured rows with
logic too stateful for a regex — here, a sentence segmenter that carries
running character offsets (the provenance a training-data pipeline needs
to map spans back into source documents). Runs per-row on executors via
a LATERAL join, so it parallelizes like any projection; like all Python
UDFs it is the slow path and belongs off the hot aggregate path (the
catalog's pure-regex ops stay JVM-side; this is the escape hatch for
shapes they can't express).
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_SENTENCE_END = re.compile(r"(?<=[.!?])\s+")


@udtf(returnType="sent_idx int, sentence string, char_start int, n_tokens int")
class SplitSentences:
    """One output row per sentence: index, text, starting character
    offset in the source document, whitespace token count. NULL/empty
    documents yield zero rows (LATERAL semantics drop them)."""

    def eval(self, text: str):  # noqa: D401 - UDTF contract method
        if not text:
            return
        offset = 0
        for idx, chunk in enumerate(_SENTENCE_END.split(text)):
            start = text.index(chunk, offset)
            offset = start + len(chunk)
            if chunk.strip():
                yield idx, chunk, start, len(chunk.split())


def register_udtfs(spark) -> None:
    """Register all table functions for SQL use (idempotent)."""
    spark.udtf.register("split_sentences", SplitSentences)
