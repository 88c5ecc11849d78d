"""PySpark-native analytics engine with the capabilities of
LeopoldLj/binance_futures_data_lake (a pandas/pyarrow futures-klines data
lake), re-expressed Spark-first.

Layers (mirroring the reference's architecture, see SURVEY.md):

- ``sources``   — parquet lake layout, staged append, compaction, merge-write,
                  checkpointed incremental ingest (ref: src/bfdl/collectors,
                  src/bfdl/transforms/compact_staging.py).
- ``operators`` — resample/OHLCV aggregation, as-of joins, dedup, gap
                  detection, regimes, backtest kernels, ML pipeline, plus
                  large-scale training-data ops (dedup/similarity/text).
- ``functions`` — window-function library (lag/rolling/EWM/Ichimoku/...)
                  and scalar helpers (ref: scripts/research/*).
- ``plans``     — composed research pipelines (the shell-chained DAG of the
                  reference becomes one lazy DataFrame DAG).
- ``streaming`` — Structured Streaming ingest/aggregation story.

Everything is DataFrame-API first; ``applyInPandas`` is reserved for the few
genuinely sequential kernels (EWM recursion, sticky state machines, position
loops).
"""

__version__ = "0.1.0"
