"""Batch model-inference harness: run an opaque per-document model
(embedder, classifier, reward scorer) over the corpus as Arrow-batched
``mapInPandas`` -- the shape a GPU/model-server scoring pass takes on
a Spark cluster.  (No reference analog -- training-data mandate: every
modern curation pipeline has an "embed/score everything" stage.)

The model here is a DETERMINISTIC STAND-IN (md5-seeded pseudo-
embedder) because no ML runtime ships in this container -- the same
honesty rule as the multimodal codec stubs, except this stand-in is
fully real end-to-end: the Spark plumbing (schema, batching,
partitioning) is production shape AND the stand-in's arithmetic is
exactly reproducible in Catalyst and ANSI SQL, which is what lets the
driver's DuckDB oracle hash-verify a mapInPandas pipeline at all.  To
run a real model, replace ``_pseudo_embed_batch`` with the model call
(ONNX session, HTTP batch endpoint, ...) -- every other line stays.

Determinism contract (pinned by tests against the Catalyst twin):
  e_j(doc) = md5_u32(doc_id ":" j) / 2^32 - 0.5
each term is exact in float64 (power-of-two divide, exact subtract),
and the norm accumulates dimension-by-dimension in ascending j order
-- the SAME left fold the Catalyst twin and the SQL oracle use, so
sums agree to the bit with no sorted-fold tricks needed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import INFER_DIM
from ..functions.columns import round_half_up as rnd

# output schema of the embedding pass: the id + the vector
_EMBED_SCHEMA = "doc_id bigint, lang string, embedding array<double>"


def _pseudo_embed_batch(doc_ids) -> list[list[float]]:
    """The stand-in 'model': one md5 per (doc, dim).  Swap this one
    function for a real model call; everything else is the harness."""
    import hashlib

    out = []
    for d in doc_ids:
        out.append(
            [
                int(hashlib.md5(f"{d}:{j}".encode()).hexdigest()[:8], 16)
                / 4294967296.0
                - 0.5
                for j in range(INFER_DIM)
            ]
        )
    return out


def embed_docs(documents: DataFrame) -> DataFrame:
    """(doc_id, lang, embedding): the inference pass itself.

    Scale shape: ``mapInPandas`` is map-side only -- no shuffle, no
    state; Arrow moves each batch across the Python boundary once.
    The repartition spreads the few-split scan across cores (model
    inference is the textbook CPU/GPU-bound stage).  Batch size is
    governed by spark.sql.execution.arrow.maxRecordsPerBatch exactly
    as a real model's max-batch would be.
    """

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "lang": pdf["lang"],
                        "embedding": _pseudo_embed_batch(pdf["doc_id"].tolist()),
                    }
                )

    return (
        documents.repartition(documents.sparkSession.sparkContext.defaultParallelism)
        .select("doc_id", "lang")
        .mapInPandas(infer, _EMBED_SCHEMA)
    )


def _audit_projection(embedded: DataFrame) -> DataFrame:
    """Per-doc audit row over the generated vectors: first/last
    component and the L2 norm, norm accumulated in ascending-dim
    order (exact left fold, matches the oracle's explicit chain)."""
    norm2 = F.aggregate(
        F.col("embedding"), F.lit(0.0), lambda acc, x: acc + x * x
    )
    return embedded.select(
        "doc_id",
        "lang",
        F.lit(INFER_DIM).alias("dim"),
        rnd(F.element_at("embedding", 1), 6).alias("e_first"),
        rnd(F.element_at("embedding", INFER_DIM), 6).alias("e_last"),
        rnd(F.sqrt(norm2), 6).alias("norm"),
    )


def doc_embed_inference(documents: DataFrame) -> DataFrame:
    """Registry face of the inference harness: embed every doc via
    the mapInPandas pass, emit the per-doc audit row (scalar columns
    only, so the driver's oracle can hash-compare a Python-side
    inference result against ANSI SQL)."""
    return _audit_projection(embed_docs(documents))


def _embed_catalyst(documents: DataFrame) -> DataFrame:
    """Catalyst twin of embed_docs -- same arithmetic as JVM-side
    expressions (conv(md5) per dim).  Exists to PIN the Python path:
    tests assert bit-identical audit rows from both, the same
    discipline as similarity._assign_cells vs its Catalyst twin."""
    emb = F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.col("doc_id"), F.lit(str(j)))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("double")
                / F.lit(4294967296.0)
                - F.lit(0.5)
            )
            for j in range(INFER_DIM)
        ]
    )
    return documents.select("doc_id", "lang", emb.alias("embedding"))
