"""Canary-floor bookkeeping in bench.py (r11).

The ambient-load canary prices the machine with a DuckDB scan of
``sf_dir``'s lineitem, so its idle floor is a property of (host, SCALE
FACTOR) — an sf0.01 validation run once persisted its ~4x-faster floor
into the shared slot, which would have made every later sf0.1 run read
as "loaded" and stall the full settle wait. Floors now key by sf;
legacy single-floor files (always measured at the headline sf0.1)
migrate on first write.
"""

from __future__ import annotations

import importlib.util
import json
import sys


def _load_bench(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", "/root/repo/bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    monkeypatch.setattr(
        mod, "CANARY_FLOOR_FILE", str(tmp_path / "floor.json")
    )
    monkeypatch.delenv("BFDL_CANARY_FLOOR_SEC", raising=False)
    return mod


def test_floor_keys_by_scale_factor(tmp_path, monkeypatch):
    b = _load_bench(tmp_path, monkeypatch)
    b._persist_canary_floor(0.0115, "0.01")
    assert b._resolve_canary_floor("0.01") == 0.0115
    # the poison case: an sf0.01 floor must NOT answer for sf0.1
    assert b._resolve_canary_floor("0.1") is None
    b._persist_canary_floor(0.0407, "0.1")
    assert b._resolve_canary_floor("0.1") == 0.0407
    assert b._resolve_canary_floor("0.01") == 0.0115
    # floors only tighten downward
    b._persist_canary_floor(0.09, "0.1")
    assert b._resolve_canary_floor("0.1") == 0.0407


def test_legacy_single_floor_migrates(tmp_path, monkeypatch):
    b = _load_bench(tmp_path, monkeypatch)
    with open(b.CANARY_FLOOR_FILE, "w") as f:
        json.dump({"floor_sec": 0.0407}, f)
    # legacy slot answers only for the headline sf it was measured at
    assert b._resolve_canary_floor("0.1") == 0.0407
    assert b._resolve_canary_floor("0.01") is None
    b._persist_canary_floor(0.0115, "0.01")
    data = json.load(open(b.CANARY_FLOOR_FILE))
    assert data["floors"] == {"0.1": 0.0407, "0.01": 0.0115}


def test_env_pin_wins(tmp_path, monkeypatch):
    b = _load_bench(tmp_path, monkeypatch)
    monkeypatch.setenv("BFDL_CANARY_FLOOR_SEC", "0.05")
    assert b._resolve_canary_floor("0.1") == 0.05
    assert b._resolve_canary_floor("0.01") == 0.05


def test_corrupt_floor_file_calibrates_fresh(tmp_path, monkeypatch):
    """ADVICE r11: a hand-edited/corrupt floor file (dict missing both
    'floors' and 'floor_sec', or a non-dict JSON value) must resolve to
    None — first run recalibrates — not crash load_canary."""
    b = _load_bench(tmp_path, monkeypatch)
    for payload in ({"unexpected": 1}, [1, 2, 3], "oops", 42,
                    {"floor_sec": "not-a-number"}):
        with open(b.CANARY_FLOOR_FILE, "w") as f:
            json.dump(payload, f)
        assert b._resolve_canary_floor("0.1") is None
        assert b._resolve_canary_floor("0.01") is None
    # and a persist over the corrupt file heals it
    b._persist_canary_floor(0.04, "0.1")
    assert b._resolve_canary_floor("0.1") == 0.04
