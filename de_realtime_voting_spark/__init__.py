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
"""

__version__ = "0.1.0"
