"""PySpark-native analytics engine with the query/data-processing
capabilities of alfred-ojuku/Dynamics-365-To-Bigquery-Spark-ETL-Pipeline,
re-expressed Spark-first (DataFrame/SQL/Catalyst/Structured Streaming).

Layout:
    session      -- tuned SparkSession factory (AQE, UTC, shuffle sizing)
    catalog      -- register the test star-schema parquet tables as views
    operators/   -- CDC merge, name/type policies, dedup, similarity, text
    sources/     -- CSV entity reader, watermark state table
    functions/   -- portable scalar expression helpers (Spark<->ANSI SQL)
    plans/       -- the query library exposed through __spark_entry__
    streaming/   -- Structured Streaming CDC merge

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior (cited by
file:line in docstrings).
"""

__version__ = "0.1.0"
