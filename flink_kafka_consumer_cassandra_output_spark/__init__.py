"""PySpark-native analytics engine with the capabilities of the reference
system ``ayberkcansever/flink-kafka-consumer-cassandra-output`` (a Flink
Kafka->Cassandra message-archival pipeline), rebuilt Spark-first.

Layout (see SURVEY.md section 7 for the build plan):

- ``session``    -- tuned SparkSession builder (local + cluster posture)
- ``config``     -- properties-file loading / kafka prefix namespacing (O19)
- ``sources``    -- parquet fixture catalog, Kafka + Avro source builders (O1-O3)
- ``functions``  -- scalar function library: datetime (O5/O6), crypto (O7/O8),
                    taxonomy (O22), xml (O21), numeric parity helpers, text,
                    vectors
- ``operators``  -- composed DataFrame->DataFrame operators: the reference
                    message pipeline (O10-O13), dedup, similarity, multimodal
- ``plans``      -- the query registry driving ``__spark_entry__.py``:
                    every query has a builder and (where expressible) a
                    DuckDB oracle SQL string
- ``streaming``  -- Structured Streaming twin of the batch pipeline (O17)

All computation stays on the public DataFrame/SQL API; Catalyst does the
optimization (SURVEY.md section 4.2: no custom rules needed).
"""

__version__ = "0.1.0"
