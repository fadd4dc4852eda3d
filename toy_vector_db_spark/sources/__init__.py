from toy_vector_db_spark.sources import ndjson  # noqa: F401
