"""``python -m binance_futures_data_lake_spark`` entry point."""

import sys

from binance_futures_data_lake_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
