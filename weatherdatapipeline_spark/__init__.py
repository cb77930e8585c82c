"""weatherdatapipeline_spark — a PySpark-native analytics engine.

A ground-up re-expression of the query and data-processing capabilities of
the reference pipeline (papichoolo/WeatherDataPipeline — an eager pandas
ETL + MLOps pipeline, see SURVEY.md) on Apache Spark: declarative
DataFrame/SQL logical plans optimized by Catalyst, Structured Streaming for
ingestion, plus LLM-data-pipeline extensions (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.

Layout
------
- ``session``    : SparkSession factory with scale-oriented defaults (AQE,
                   Arrow, shuffle sizing).
- ``schemas``    : declared StructTypes — schema-on-write at every boundary
                   (replaces the reference's repeated defensive re-casting,
                   SURVEY.md §1.3).
- ``sources``    : batch + streaming sources and sinks (synthetic generator,
                   REST-fetch interface, parquet/CSV table catalog).
- ``operators``  : batch operators — stats, feature plan, relational
                   (joins / set ops / windows / as-of), dedup, similarity,
                   text analysis, multimodal plumbing.
- ``streaming``  : Structured Streaming jobs (micro-batch ingest,
                   latest-per-key, windowed stats, watermark dedup).
"""

__version__ = "0.1.0"
