from toy_vector_db_spark.functions import vector, text  # noqa: F401
