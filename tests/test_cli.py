"""CLI parity layer smoke tests (reference cli/collect.py, cli/aggregate.py):
collect → compact → aggregate → validate on a synthetic lake, in-process
with an injected transport."""

from __future__ import annotations

import json
import os

from binance_futures_data_lake_spark import cli
from tests.test_poll import T0, MIN_MS, FakeKlines


def _write_symbols(base_dir: str, syms) -> None:
    os.makedirs(os.path.join(base_dir, "config"), exist_ok=True)
    with open(os.path.join(base_dir, "config", "symbols.yml"), "w") as f:
        f.write("symbols:\n" + "".join(f"  - {s}\n" for s in syms))


def test_symbols_file_parser(tmp_path):
    p = tmp_path / "symbols.yml"
    p.write_text('symbols:\n  # comment\n  - btcusdt\n  - "ETHUSDT"\n\n  - BTCUSDT\n')
    assert cli.read_symbols_file(str(p)) == ["BTCUSDT", "ETHUSDT"]


def test_full_cycle(spark, tmp_path, capsys):
    base = str(tmp_path)
    _write_symbols(base, ["BTCUSDT", "ETHUSDT"])
    t1 = T0 + 600 * MIN_MS  # 10 hours of minutes
    fake = FakeKlines(T0, t1)

    # collect both symbols (serial, shared dataset root, per-symbol ckpt)
    rc = cli.main(
        ["collect", "--base-dir", base, "--start-ms", str(T0),
         "--end-ms", str(t1 - 1), "--sleep-sec", "0"],
        transport=fake,
    )
    assert rc == 0
    from binance_futures_data_lake_spark.sources import lake

    root = cli.raw_root(base)
    assert lake.read_checkpoint(root, "next_start_time_ms.BTCUSDT") == T0 + 599 * MIN_MS + 1
    assert lake.read_checkpoint(root, "next_start_time_ms.ETHUSDT") == T0 + 599 * MIN_MS + 1

    assert cli.main(["compact", "--base-dir", base]) == 0
    raw = lake.read_lake(spark, root)
    assert raw.count() == 1200  # 600 minutes x 2 symbols
    assert raw.select("symbol").distinct().count() == 2

    # aggregate all TFs with blocking audit
    rc = cli.main(["aggregate", "--base-dir", base, "--audit"])
    assert rc == 0
    h1 = lake.read_lake(spark, cli.derived_root(base, "h1"))
    # T0 sits 14 min into its hour, so 600 minutes span 9 COMPLETE hours
    # per symbol (complete_only drops the two partial edge buckets)
    assert h1.count() == 18
    assert h1.filter((h1.open_time_ms % 3_600_000) != 0).count() == 0

    # validate everything (m1 + derived)
    assert cli.main(["validate", "--base-dir", base]) == 0
    out = [json.loads(line) for line in capsys.readouterr().out.splitlines() if line.startswith('{"table"')]
    assert {o["table"] for o in out} == {"m1", "m5", "h1", "h4"}
    assert all(o["audit"]["ok"] for o in out)


def test_validate_flags_gaps(spark, tmp_path):
    base = str(tmp_path)
    t1 = T0 + 120 * MIN_MS
    fake = FakeKlines(T0, t1)
    rc = cli.main(
        ["collect", "--base-dir", base, "--symbol", "BTCUSDT", "--start-ms", str(T0),
         "--end-ms", str(t1 - 1), "--sleep-sec", "0"],
        transport=fake,
    )
    assert rc == 0
    assert cli.main(["compact", "--base-dir", base]) == 0

    # punch a hole into canonical, then validate must fail
    from binance_futures_data_lake_spark.sources import lake

    root = cli.raw_root(base)
    df = lake.read_lake(spark, root)
    holed = df.filter((df.open_time_ms < T0 + 50 * MIN_MS) | (df.open_time_ms > T0 + 55 * MIN_MS))
    lake.write_canonical(holed, root)
    assert cli.main(["validate", "--base-dir", base, "--tf", "m1"]) == 1


def test_plot_writes_svg_per_symbol(spark, tmp_path, capsys):
    base = str(tmp_path)
    _write_symbols(base, ["BTCUSDT"])
    t1 = T0 + 600 * MIN_MS
    assert cli.main(
        ["collect", "--base-dir", base, "--start-ms", str(T0),
         "--end-ms", str(t1 - 1), "--sleep-sec", "0"],
        transport=FakeKlines(T0, t1),
    ) == 0
    assert cli.main(["compact", "--base-dir", base]) == 0

    out_dir = os.path.join(base, "plots")
    assert cli.main(["plot", "--base-dir", base, "--out-dir", out_dir]) == 0
    lines = [json.loads(s) for s in capsys.readouterr().out.splitlines() if s.startswith("{")]
    wrote = [r for r in lines if "wrote" in r]
    assert wrote and wrote[-1]["symbol"] == "BTCUSDT"
    svg = open(wrote[-1]["wrote"]).read()
    assert svg.startswith("<svg") and ("#1f9d55" in svg or "#d64545" in svg)


def test_plot_ranges_mode_writes_overlay_svg(spark, tmp_path, capsys):
    base = str(tmp_path)
    _write_symbols(base, ["BTCUSDT"])
    t1 = T0 + 600 * MIN_MS
    assert cli.main(
        ["collect", "--base-dir", base, "--start-ms", str(T0),
         "--end-ms", str(t1 - 1), "--sleep-sec", "0"],
        transport=FakeKlines(T0, t1),
    ) == 0
    assert cli.main(["compact", "--base-dir", base]) == 0

    out_dir = os.path.join(base, "plots")
    assert cli.main(
        ["plot", "--mode", "ranges", "--base-dir", base, "--out-dir", out_dir]
    ) == 0
    lines = [json.loads(s) for s in capsys.readouterr().out.splitlines() if s.startswith("{")]
    wrote = [r for r in lines if "wrote" in r]
    assert wrote and wrote[-1]["wrote"].endswith("detected_ranges_BTCUSDT.svg")
    svg = open(wrote[-1]["wrote"]).read()
    # candles always render; boxes depend on the synthetic walk's flatness
    assert svg.startswith("<svg") and ("#1e8449" in svg or "#c0392b" in svg)
    assert "Range ACTIVE" in svg  # legend marks the overlay chart variant
