"""Pin the bench stdout contract (the driver parses the LAST stdout line,
capturing only a ~2000-char tail). Round 5's line grew past the window and
BENCH_r05.json recorded ``parsed: null`` — this suite makes that class of
regression a local test failure instead of a lost round artifact."""

import json

from fictional_guacamole_spark.plans import REGISTRY

CONTRACT_KEYS = {"metric", "value", "unit", "queries",
                 "calibration_s", "noise_factor", "par_eff", "par_load",
                 "par_load_attempts", "contended", "sf"}
BUDGET = 1500  # chars; driver tail capture is ~2000 — leave headroom


def _worst_case_line() -> str:
    # every bench query at a 5-digit timing: wider than any plausible run
    timings = {n: 99999.9999 for n, q in REGISTRY.items() if q.bench}
    out = {
        "metric": "headline_queries_total_wall",
        "value": 999999.9999,
        "unit": "sec",
        "queries": timings,
        "calibration_s": 99.9999,
        "noise_factor": 99.999,
        "par_eff": 99.999,
        "par_load": 99.999,
        "par_load_attempts": [99.999, 99.999, 99.999],
        "contended": True,
        "sf": 0.001,
    }
    return json.dumps(out)


def test_contract_line_fits_driver_tail_capture():
    line = _worst_case_line()
    assert len(line) <= BUDGET, (
        f"bench contract line would be {len(line)} chars (> {BUDGET}); "
        "the driver only captures a ~2000-char stdout tail — move any new "
        "field to stderr/BENCH_HISTORY.jsonl, or shrink query names")


def test_contract_line_carries_required_fields():
    out = json.loads(_worst_case_line())
    assert set(out) == CONTRACT_KEYS
    assert out["unit"] == "sec"
    assert isinstance(out["queries"], dict) and out["queries"]


def test_bench_source_prints_contract_line_last():
    # the contract print must be the final statement of main(): nothing —
    # spark.stop() logs included — may follow it on stdout
    src = open("bench.py").read()
    tail = src.split("spark.stop()")[-1]
    assert 'print(line)' in tail, (
        "bench.py must print the compact contract line after spark.stop(), "
        "as the last stdout write")
    assert "vs_history" not in json.loads(_worst_case_line())
