"""A/B the position-loop kernel: git-HEAD walk vs the flat-span skip-ahead.

Builds the SAME bars×cfg signal frame the scale probe sweeps (synthetic
klines → research pipeline → vectorized signals), collects it once, then
runs BOTH kernels per (symbol, cfg) group driver-side — no Spark pickling,
so the old kernel can load straight from `git show` output. Asserts the
trade frames are identical row-for-row and reports total kernel wall for
each. Usage: python scripts/kernel_ab.py [--rows N] [--old PATH]
(default old = extracted to /tmp/bfdl_old_backtest.py by the caller).
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_module(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def ensure_old_kernel(path: str) -> str:
    """Extract the committed kernel from git HEAD if the caller didn't."""
    if not os.path.exists(path):
        import subprocess

        src = subprocess.check_output(
            ["git", "-C", REPO, "show",
             "HEAD:binance_futures_data_lake_spark/operators/backtest.py"],
        )
        with open(path, "wb") as fh:
            fh.write(src)
    return path


def main() -> int:
    import pandas as pd
    from pyspark.sql import functions as F

    rows = int(sys.argv[sys.argv.index("--rows") + 1]) if "--rows" in sys.argv else 1_000_000
    old_path = (
        sys.argv[sys.argv.index("--old") + 1]
        if "--old" in sys.argv
        else "/tmp/bfdl_old_backtest.py"
    )

    from binance_futures_data_lake_spark.operators import backtest as NEW
    from binance_futures_data_lake_spark.operators.regime import VolRegimeParams
    from binance_futures_data_lake_spark.plans.pipeline import joined_research_frame
    from binance_futures_data_lake_spark.session import get_spark
    from binance_futures_data_lake_spark.sources.synthetic import synthetic_klines_m1

    OLD = load_module(ensure_old_kernel(old_path), "bfdl_old_backtest")

    n_symbols = 20
    # the 4M-row signal frame collects to the driver by design (the kernels
    # under test are pure pandas); size the result cap accordingly
    spark = get_spark(
        "bfdl-kernel-ab", overrides={"spark.driver.maxResultSize": "8g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    symbols = tuple(f"SYM{i:03d}" for i in range(n_symbols))
    m1 = synthetic_klines_m1(
        spark, symbols=symbols, n_minutes=max(1440, rows // n_symbols), trend_amp=0.05
    )
    frame = joined_research_frame(m1, vol_params=VolRegimeParams(lookback=48))

    # same loose cfgs as scale_check's sweep probe (entries actually fire)
    all_hours = ",".join(str(h) for h in range(24))
    loose = dict(
        session_hours=all_hours, minute_guard=0, mr_rr=0.3, mr_d=0.1,
        mr_cp_low=0.45, mr_cp_high=0.55, mr_mean_dist=0.0,
        mr_atr_pctl_max=1.0, vol_filter_high=False,
    )
    cfgs = [
        NEW.Cfg(name="base", **loose),
        NEW.Cfg(name="tight", **{**loose, "mr_sl_atr": 1.2}),
        NEW.Cfg(name="cooldown", **{**loose, "cooldown_after_loss": 5,
                                    "cost_r_per_trade": 0.02}),
        NEW.Cfg(name="no_trend", **{**loose, "trend_enabled": False}),
    ]

    # replicate run_sweep up to the signal frame (backtest.py run_sweep)
    by, order = ["symbol"], ["ts"]
    bars = frame
    for c, default in NEW._gate_defaults().items():
        if c not in bars.columns:
            bars = bars.withColumn(c, default)
    if "hour_utc" not in bars.columns:
        bars = bars.withColumn("hour_utc", F.hour("ts")).withColumn(
            "minute_utc", F.minute("ts")
        )
    crossed = bars.crossJoin(F.broadcast(NEW.configs_df(spark, cfgs)))
    sig = NEW.with_signals(crossed, by, order)
    pdf = sig.toPandas()
    spark.stop()
    print(f"signal frame: {len(pdf)} rows x {len(pdf.columns)} cols", flush=True)

    groups = list(pdf.groupby(["symbol", "name"], sort=True))
    totals = {}
    outs = {}
    for label, mod in (("old", OLD), ("new", NEW)):
        t0 = time.perf_counter()
        parts = [mod._position_loop(g, order, by) for _, g in groups]
        totals[label] = round(time.perf_counter() - t0, 2)
        outs[label] = (
            pd.concat(parts, ignore_index=True)
            .sort_values(["cfg", "engine", "side", "entry_ts", "exit_ts"])
            .reset_index(drop=True)
        )
        print(f"{label}: {totals[label]} s, {len(outs[label])} trades", flush=True)

    pd.testing.assert_frame_equal(outs["old"], outs["new"])
    speedup = round(totals["old"] / totals["new"], 2) if totals["new"] else None
    print(f"IDENTICAL trades ({len(outs['new'])}); kernel speedup {speedup}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
