from data_pipeline2_spark.sources.parquet import load_table, load_tables  # noqa: F401
