"""vector_search_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of chansule92/vector_search, re-expressed
Spark-first (DataFrame/SQL/Catalyst), plus the large-scale LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis).

Layout
------
- ``session``     SparkSession builder tuned for the local[32] test harness,
                  with configs that scale to a multi-executor cluster.
- ``sources``     table catalog: parquet fixtures now, any Spark source later.
- ``functions``   scalar/vector/text expression library (JVM-side built-ins
                  wherever possible; Pandas UDFs only where unavoidable).
- ``operators``   composed DataFrame operators: KNN / threshold search /
                  multi-probe fusion, sweep-line interval aggregation, dedup
                  family, relational query suite.
- ``plans``       driver-side SQL codegen (the reference's templating stage).
- ``streaming``   Structured Streaming re-expressions over the events table.
- ``llm``         pluggable LLM/embedding clients with deterministic fakes.
- ``multimodal``  binary-column (image/audio/video) plumbing with stubbed
                  decoders.
"""

__version__ = "0.1.0"
