"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference project ``prakashdontaraju/google-cloud-ecommerce``
(batch + streaming clickstream ETL and the five downstream analytics queries),
re-expressed Spark-first: DataFrame/SQL plans optimized by Catalyst, Structured
Streaming for the stream path, and LLM-data-pipeline extensions (dedup,
similarity search, text analysis, multimodal columns) designed for 100 TB scale.

Layout:
    session     SparkSession builder (AQE, Arrow, UTC)
    catalog     testdata table registry (parquet -> temp views)
    transforms  reference per-row transforms as pure Column functions
    queries     reference analytics suite (Q1-Q6) + relational surface
    operators   dedup / similarity / text / multimodal
    streaming   Structured Streaming jobs (replay, windows, sessions)
"""

__version__ = "0.1.0"
