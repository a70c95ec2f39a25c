"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side contract is real and tested -- binary columns with
typed metadata, Arrow-batched ``mapInPandas`` decode/feature-extract
with a stable output schema and bounded batch sizes.  The actual
codec step is STUBBED (image/audio libraries are not in this
container): ``decode_fn=None`` raises NotImplementedError, and tests
inject a deterministic fake decoder.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.columns import round_half_up as rnd
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("byte_len", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("feature_dim", IntegerType()),
        StructField("feature_norm", StringType()),
    ]
)


def to_media_frame(documents: DataFrame) -> DataFrame:
    """Treat each document's text as an opaque binary payload with
    typed metadata -- the storage layout a multimodal table uses
    (binary column + metadata columns, partition-prunable)."""
    return documents.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.octet_length("text").alias("byte_len"),
    )


def decode_media(
    media: DataFrame,
    decode_fn: Callable[[bytes], list[float]] | None = None,
) -> DataFrame:
    """Arrow-batched decode / feature-extract over the binary column.

    ``decode_fn`` maps payload bytes -> feature vector.  None = the
    stub path: raises NotImplementedError at execution time (codec
    libs absent here); tests pass a deterministic fake.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_fn is None:
                raise NotImplementedError(
                    "media codecs not available in this environment; "
                    "inject decode_fn (see tests for the deterministic fake)"
                )
            feats = pdf["payload"].map(lambda b: decode_fn(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "feature_dim": feats.map(len).astype("int32"),
                    "feature_norm": feats.map(
                        lambda v: f"{sum(x * x for x in v):.6f}"
                    ),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def multimodal_binary_stats(documents: DataFrame) -> DataFrame:
    """Metadata analytics over the binary payloads (no decode): byte
    sizes and content-hash cardinality per source."""
    payload_len = F.octet_length("text")
    return (
        documents.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(payload_len).cast("bigint").alias("total_bytes"),
            rnd(F.avg(payload_len), 4).alias("avg_bytes"),
            F.countDistinct(F.sha2(F.col("text"), 256)).alias("n_distinct_payloads"),
        )
    )
