"""PySpark-native realtime-voting analytics engine.

A from-scratch Spark-first re-expression of the capabilities of the
reference pipeline ``blessedmadukoma/de-realtime-voting`` (Kafka
producer -> vote caster -> Spark Structured Streaming aggregations ->
Kafka sinks; reference files main.py / voting.py / spark-streaming.py),
plus the large-scale training-data operators (dedup, similarity
search, text analysis, multimodal plumbing) a 100 TB pipeline needs.

Design rules:
- DataFrame/SQL only; no RDDs; no driver-side collect loops.
- Operators are pure ``DataFrame -> DataFrame`` functions reused by
  batch queries and streaming pipelines alike.
- Hot paths stay JVM-side (builtin functions / higher-order array
  lambdas); Python appears only in Arrow-batched ``mapInPandas`` for
  the (stubbed) multimodal decode.

Cache lifecycle: a handful of operators ``persist()`` a multiply-read
intermediate and return a LAZY plan that still references it
(``curation_waterfall``, ``bigram_logprob_score``,
``token_heavy_hitters_cms``, several dedup ops — each site carries a
comment).  These caches are LRU-evictable and the batch harnesses
(bench.py, tools/check_parity.py) call
``spark.catalog.clearCache()`` between queries; a long-lived session
embedding these operators should do the same once it has consumed a
query's result.  The exception is ops whose result is a bounded
summary (e.g. ``near_dup_triangles``): those collect eagerly inside
the builder and release their caches deterministically before
returning.
"""

__version__ = "0.1.0"
