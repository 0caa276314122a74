"""etl_procesos_odo_spark — a PySpark-native analytics engine.

A ground-up rebuild of the query/data-processing capabilities of
MichaelDiaz22/ETL-Procesos-ODO (a suite of pandas/Streamlit clinic back-office
ETL apps) as an idiomatic Spark library, organized in layers:

- ``session``   — SparkSession factory tuned for the harness (layer 0)
- ``sources``   — readers, fuzzy column resolver, schema checks (layer 0)
- ``functions`` — the scalar expression library (SURVEY.md §2.8, layer 1)
- ``operators`` — relational operator kit: spines, spine-joins, aggregates,
                  windows, partitioner (SURVEY.md §2.1–2.7, layer 2)
- ``plans``     — the six reference pipelines as parameterized logical plans
                  (SURVEY.md §3, layer 3)
- ``streaming`` — Structured Streaming variants of the temporal aggregates
- ``llm``       — large-scale training-data ops: dedup (exact/MinHash/SimHash/
                  Jaccard), ANN similarity search, text analysis, multimodal
- ``ml``        — demand forecasting via pyspark.ml (SURVEY.md §2.9 U3/U4)

Everything is a pure DataFrame -> DataFrame function; no collect() in operator
paths, broadcast only for bounded dims, designed for a 1000-executor cluster
even though the harness runs local mode.
"""

__version__ = "0.1.0"
