from binance_futures_data_lake_spark.sources.testdata import load_table, load_events  # noqa: F401
