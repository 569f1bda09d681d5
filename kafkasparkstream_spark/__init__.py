"""kafkasparkstream_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline ashrafkvt/KafkaSparkStream
(Kafka → Spark Structured Streaming → windowed aggregates → serving SQL),
plus the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) the reference lacks.

Layout:
- ``session``    — SparkSession factory tuned for local testing / cluster scale
- ``schemas``    — explicit StructTypes (schema-on-read regime, reference
                   processor.py:47-55)
- ``tables``     — parquet table registry over the driver's testdata
- ``sources``    — Kafka / file / rate sources + JSON parse operators (S1, S6-S9)
- ``operators``  — batch operator library: serving queries (A1-A12), windowed
                   aggregate batch shadow (S10), TPC-H-style analytics, dedup,
                   similarity, text analysis, multimodal
- ``streaming``  — the continuous pipeline (ST1-ST8): watermark → tumbling
                   window → foreachBatch sinks
- ``functions``  — reusable column expressions (pure pyspark.sql.functions)
- ``plans``      — explain/plan-inspection helpers
"""

__version__ = "0.1.0"
