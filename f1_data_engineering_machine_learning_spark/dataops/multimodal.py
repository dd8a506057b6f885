"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side contract (what this module makes real and tested):

- **schema**: media rows are ``(id, media binary, meta struct<mime,width,
  height,duration_ms,n_frames>)`` — binary stays opaque to Catalyst; all
  pruning/partitioning decisions use the typed metadata columns.
- **batch shape**: decode/feature-extract run via ``mapInPandas`` — Arrow
  batches in, Arrow batches out, with ``spark.sql.execution.arrow.
  maxRecordsPerBatch`` bounding peak memory per task (binary payloads are
  big; batch size is the OOM lever at scale).
- **partitioning**: media tables are processed with narrow transformations
  only (no shuffle touches the binary column); joins against media happen
  on the id AFTER feature extraction projects the binary away.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode kernels are stubbed: ``decoder='fake'`` produces a deterministic
pseudo-decode (so the plumbing is testable end-to-end); ``decoder='real'``
raises NotImplementedError at the exact seam where the codec call belongs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "mime string, width int, height int, duration_ms int, n_frames int"
)

FEATURE_DIM = 16


def attach_fake_media(
    df: DataFrame, id_col: str, payload_bytes: int = 256
) -> DataFrame:
    """Deterministic fake media column derived from the id — stands in for
    reading real blobs; exercises the binary column path end to end."""
    payload = F.repeat(
        F.sha2(F.col(id_col).cast("string"), 256), payload_bytes // 64 + 1
    )
    return df.withColumn(
        "media", F.substring(payload, 1, payload_bytes).cast("binary")
    ).withColumn(
        "meta",
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.lit(4).alias("width"),
            F.lit(4).alias("height"),
            F.lit(0).alias("duration_ms"),
            F.lit(1).alias("n_frames"),
        ),
    )


def _fake_decode(payload: bytes, width: int, height: int) -> list[float]:
    """Deterministic pseudo-decode: byte histogram folded to width*height
    'pixels' in [0,1]. Replace with the real codec at the marked seam."""
    n = width * height
    if not payload:
        return [0.0] * n
    return [payload[i % len(payload)] / 255.0 for i in range(n)]


def decode_media(
    df: DataFrame,
    decoder: str = "fake",
    media_col: str = "media",
    batch_rows: int = 64,
) -> DataFrame:
    """Decode the binary column into a ``pixels array<double>`` column via
    mapInPandas (schema preserved + appended column). ``batch_rows`` caps
    Arrow batch size — the memory lever when payloads are megabytes."""
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows))
    # NB: StructType.add mutates in place and df.schema is cached on the
    # DataFrame — build a fresh StructType instead of .add-ing to it
    out_schema = StructType(
        list(df.schema.fields) + [StructField("pixels", ArrayType(DoubleType()))]
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                # >>> real codec call goes here (PIL.Image.open etc.) <<<
                raise NotImplementedError(
                    "real media decoding requires codec libraries not present "
                    "in this environment; use decoder='fake' for plumbing"
                )
            widths = pdf["meta"].map(lambda m: m["width"])
            heights = pdf["meta"].map(lambda m: m["height"])
            pdf = pdf.copy()
            pdf["pixels"] = [
                _fake_decode(payload, w, h)
                for payload, w, h in zip(pdf[media_col], widths, heights)
            ]
            yield pdf

    return df.mapInPandas(decode_batches, out_schema)


def media_features(df: DataFrame, pixels_col: str = "pixels") -> DataFrame:
    """Feature extraction AFTER decode, as plain array expressions (mean /
    min / max / 13 coarse histogram bins -> FEATURE_DIM floats). Projects the
    binary away — downstream joins/shuffles never move the payload."""
    px = F.col(pixels_col)
    mean = F.aggregate(px, F.lit(0.0), lambda a, x: a + x) / F.size(px)

    def bin_pred(lo: float, hi: float):
        # closure factory: F.filter inspects the lambda arity, so the bin
        # bounds can't ride along as default args
        return lambda x: (x >= lo) & (x < hi)

    feats = [mean, F.array_min(px), F.array_max(px)] + [
        F.size(F.filter(px, bin_pred(i / 13.0, (i + 1) / 13.0))).cast("double")
        / F.size(px)
        for i in range(FEATURE_DIM - 3)
    ]
    return df.drop("media").withColumn(
        "media_features", F.array(*[f.cast("double") for f in feats])
    )


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling — metadata-driven: expand frame indexes 0, n,
    2n, ... from ``meta.n_frames`` WITHOUT touching the binary (the decode
    of selected frames happens later, in decode_media batches)."""
    idx = F.sequence(
        F.lit(0),
        F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
        F.lit(every_n),
    )
    return df.withColumn("frame_index", F.explode(idx))
