#!/usr/bin/env python
"""BENCH harness: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall time of the headline set (lower is better).
Each query is materialized through the noop sink (``format("noop")``), which
executes the COMPLETE plan — every aggregate and sort survives, unlike
``count()`` where Catalyst prunes unreferenced result expressions (e.g.
q1's eight decimal sums would be dropped when only its 6 group rows are
counted) — without adding driver-collection transfer to the measurement.
A warm-up query runs first so JVM/codegen startup isn't attributed to the
first measured query.

Per-run timings are also appended to BENCH_HISTORY.jsonl (committed) so
later rounds can diff per-query regressions, not just the total. The r2
verdict found the host's noise band (14.9–45.5 s for an identical query
set) made single totals unusable for regression detection, so the output
now also carries ``vs_history``: each query's min-of-3 against the rolling
median of its committed history, making a real regression (a plan change)
distinguishable from a loaded host (every query moves together).

Round 5 makes the run self-defending against host noise (the r4 bench
measured 46% above median on bit-identical code): a fixed-cost calibration
probe — a single-partition 200M-row ``max(xxhash64(id))`` JVM job, constant
work with no IO or shuffle — is timed at the start, middle, and end of the
measured set. ``calibration_s`` (median of the three) over the pinned
``calibration_ref_s`` (0.52 s, the quiet-host median of 7 probe runs when
the constant was set) gives ``noise_factor``; ``queries_normalized`` =
raw / noise_factor, and ``vs_history`` carries both the raw and the
noise-normalized delta, so a loaded host reads as "factor 1.5, normalized
deltas flat" while a real regression survives normalization.

Round 6 adds ``par_eff``: the serial probe is blind to MULTI-CORE
contention (observed: noise_factor 0.87 — "host is fast" — while every
32-thread query ran ~1.5× slow on bit-identical code). A second probe runs
the same per-row work fanned across all cores; its efficiency vs this
run's own serial probe (ideal = serial × rows_ratio / ncpu) is ~1.0 on a
quiet host and drops in proportion to core contention — so "par_eff 0.6,
raw times up uniformly" reads as weather, not regression.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from fictional_guacamole_spark.plans import REGISTRY  # noqa: E402
from fictional_guacamole_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Quiet-host reference for the calibration probe. Provenance: 0.52 is the
# median of 7 warm probe runs on the round-5 host at pin time (raw runs not
# individually recorded that round — the gap this note closes). A round-6
# re-derivation via `python bench.py --calibrate` (same workload, local[32],
# pyspark 4.1.2, 2026-08-13) read raw [0.478, 0.4668, 0.5096, 0.4786,
# 0.4575, 0.4528, 0.4879] → median 0.478, i.e. the host runs ~8% fast vs
# the pin; the pin stays 0.52 because changing it rescales every committed
# noise_factor. To re-pin after a host/JVM/probe-workload change, run
# `--calibrate` on a quiet host and record the raw list here.
CALIBRATION_REF_S = 0.52
CALIBRATION_ROWS = 200_000_000
# The serial probe is blind to MULTI-CORE contention: a co-tenant eating 20
# of 32 cores leaves a 1-thread probe untouched while every 32-thread query
# stage runs ~2× slow (observed in round 6: noise_factor 0.87 "fast host"
# alongside a 1.5× wall-time regression on bit-identical code). The parallel
# probe runs the SAME per-row work sharded across all cores; its efficiency
# vs the serial probe's same-run timing (no external pin needed) drops in
# proportion to core contention.
#
# IMPORTANT: a quiet host does NOT read par_eff ≈ 1.0. The serial probe
# runs at single-core turbo; 32 concurrent tasks run at all-core sustained
# frequency, so sub-linearity is physics, not load. Measured on this host
# idle (steal ~0.2%, loadavg ~0): single task 361.7 Mrows/s vs 32 tasks
# 177.6–210.9 Mrows/s/task → quiet-host par_eff ≈ 0.49–0.58. That measured
# quiet reference is pinned below; the derived par_load (= quiet_ref /
# par_eff) is the contention signal — 1.0 quiet, 2.0 means every
# all-core stage ran ~2× slow. Re-derive after a host change by sweeping
# numPartitions ∈ {1, 32} on the probe workload and pasting the rates here.
PAR_PROBE_FACTOR = 16  # parallel probe rows = CALIBRATION_ROWS × this
PAR_EFF_QUIET_REF = 0.50  # measured idle-host par_eff (see note above)
# Round 7 (r6 verdict task #2): the official r6 run carried par_load 1.572
# — the host was ~57% contended during the measured set and the six
# smallest (fixed-cost-dominated) queries inflated 8–40% while every heavy
# query improved. Nothing gated that; now the run SELF-DEFENDS: when the
# measured attempt's par_load exceeds the threshold, the whole measured
# set re-runs (up to PAR_LOAD_MAX_ATTEMPTS total) and the attempt with the
# LOWEST par_load becomes the official line; every attempt's par_load is
# recorded in the output (`par_load_attempts`) and a `contended` flag
# marks a line whose best attempt still exceeded the threshold, so a
# reader can adjudicate inflated small-query deltas instead of guessing.
# Round 9 (r8 verdict task #2): the official r8 run published at par_load
# 1.171 — just UNDER the old 1.2 threshold — and its sub-second fixed-cost
# queries still inflated 10–30% vs r7 while heavy queries improved, i.e.
# the gate passed a run it exists to catch. Tightened to 1.1 with one more
# retry attempt to compensate for the stricter bar.
PAR_LOAD_RETRY_THRESHOLD = 1.1
PAR_LOAD_MAX_ATTEMPTS = 6
# Round 11 (r10 verdict task #5): the r10 official line published on the
# noisiest host in project history (noise_factor 1.131) and raw deltas
# whipsawed ±30 % while normalized deltas stayed flat — single-pass
# totals conflate host weather with plan changes even WITH the par_load
# gate, because calibration noise is ungated. The official numbers are
# now the PER-QUERY MEDIAN over N_PASSES full measured passes (the
# least-contended ones when the gate forces extras): a one-pass spike on
# any query is voted out by the other passes, and the per-query
# raw-vs-median spread across the used passes is published so a reader
# can see residual weather directly instead of inferring it.
N_PASSES = 3
# Round 12 (r11 verdict task #5): the r10 verdict asked for a <10 %
# per-query spread and r11 still published q10 at 22 % inside one
# median-of-3 run — the pass-level contention gate cannot see a
# single-query scheduling spike. The gate is now per-query retry-until:
# any query whose (max−min)/median across the used passes exceeds
# SPREAD_GATE_PCT gets additional min-of-3 samples (per-row budget
# below), and its official number
# becomes the median of the TIGHTEST N_PASSES-sample window — adding
# samples lets the window vote a spike out entirely, which a plain
# widening median cannot.
SPREAD_GATE_PCT = 10.0
# r15: the budget moved per-row (see the resample loop) after single-row
# stalls exhausted the shared pool twice; 4 matches the heavy tier's
# per-row budget and 13 rows × 4 bounds the worst case at 52 extra
# min-of-3 samples (the old global cap was 24 shared).
SPREAD_EXTRA_RUNS_PER_ROW = 4

# Round 8 (r7 verdict task #7): a SECOND bench tier for the heavy paths the
# headline set predates — the persisted-ANN probe and an engine-executed
# streaming drain. Kept OUT of the headline total so the committed trend
# stays comparable round-over-round; measured min-of-2 after the main set
# (the first persisted-ANN run may build the index — min-of-2 reads the
# amortized warm probe, which is the number that matters at 100 TB) and
# recorded in the contract line under "heavy" + in BENCH_HISTORY for
# median tracking.
# Round 9 (r8 verdict task #8): the r8 latency wins on the stream-stream
# join drain (23.5 s → 4.8 s via replay coalescing) and the composed
# IVF-PQ probe (15.3 s → 2.9 s via shared codebooks) join the tier so the
# wins are regression-guarded by history medians.
# Round 10: the two heaviest new r10 rows join the tier — the chained
# two-stateful-operator drain and the semantic-dedup pipeline (banded
# candidate joins + components labeling) — so their latencies are
# median-tracked from the round they shipped.
# Round 11: the two heaviest new rows join the tier — SemDeDup over real
# embedding vectors (SRP banding + components) and the three-stage dedup
# cascade — so their latencies are median-tracked from the round they
# shipped.
# Round 11 second wave: the ExactSubstr removal transform (positional
# fingerprint grouping + span merge + anti-join rebuild — the heaviest
# new corpus path) and the fully-distributed Lloyd k-means join the tier.
HEAVY_TIER = ["sim_ivf_persisted_topk", "stream_engine_append_watermark",
              "stream_engine_stream_join", "sim_ivf_pq_persisted_topk",
              "stream_engine_chained_agg", "dedup_semantic_embedding",
              "dedup_semantic_pretrained", "pipeline_dedup_cascade",
              "dedup_exact_substring_apply", "cluster_kmeans_embeddings"]


def _ncpu() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _median(xs):
    import statistics
    return statistics.median(xs)


def _materialize(df) -> None:
    # noop sink: full plan execution (nothing pruned), no collect cost
    df.write.format("noop").mode("overwrite").save()


def _probe(spark) -> float:
    """Fixed-cost, single-partition, IO-free JVM job: its wall time moves
    only with host load, so it converts 'is the host busy?' from a guess
    into a measurement taken inside the same process as the queries."""
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    (spark.range(CALIBRATION_ROWS, numPartitions=1)
     .select(F.max(F.xxhash64("id"))).collect())
    return time.perf_counter() - t0


def _probe_parallel(spark) -> float:
    """The same per-row workload fanned across every core (one partition
    per CPU, PAR_PROBE_FACTOR× the rows): wall time on a quiet host ≈
    serial_probe × factor / ncpu; the shortfall from that ideal measures
    multi-core contention, which the serial probe cannot see."""
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    (spark.range(CALIBRATION_ROWS * PAR_PROBE_FACTOR, numPartitions=_ncpu())
     .select(F.max(F.xxhash64("id"))).collect())
    return time.perf_counter() - t0


def calibrate() -> None:
    """Re-derive CALIBRATION_REF_S: print 7 warm probe timings + median.
    Run on a quiet host; paste the median (and the raw list, for
    provenance) into the constant's comment above."""
    spark = get_spark("fg-bench-calibrate")
    _probe(spark)  # codegen warm-up, not counted
    runs = [round(_probe(spark), 4) for _ in range(7)]
    med = sorted(runs)[3]
    print(json.dumps({"probe_runs": runs, "median": med,
                      "pinned": CALIBRATION_REF_S}))
    spark.stop()


def _measure_set(spark, ordered) -> dict:
    """One full measured attempt: the bench set bracketed by load probes.
    Returns raw timings plus this attempt's own calibration/contention
    readings, so attempts are comparable and the least-contended one can
    be selected as the official line."""
    probes = [_probe(spark)]
    par_probes = [_probe_parallel(spark)]
    timings: dict[str, float] = {}
    for i, (name, q) in enumerate(ordered):
        # min of three runs: the host shows multi-second scheduling noise,
        # and min is the standard robust estimator for wall-time benches
        # (r2's min-of-2 left the official number ~2× the r1 fluke)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _materialize(q.builder(spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        if i == len(ordered) // 2 - 1:
            probes.append(_probe(spark))  # mid-set load sample
    probes.append(_probe(spark))
    par_probes.append(_probe_parallel(spark))

    calibration_s = round(_median(probes), 4)
    par_s = round(min(par_probes), 4)
    par_ideal = calibration_s * PAR_PROBE_FACTOR / _ncpu()
    par_eff = round(par_ideal / par_s, 3) if par_s > 0 else None
    par_load = round(PAR_EFF_QUIET_REF / par_eff, 3) if par_eff else None
    return {"timings": timings, "probes": probes, "par_probes": par_probes,
            "calibration_s": calibration_s, "par_eff": par_eff,
            "par_load": par_load}


def main() -> None:
    spark = get_spark("fg-bench")
    bench_queries = {n: q for n, q in REGISTRY.items() if q.bench}

    # Warm-up: run the cheapest query once so session/codegen startup cost
    # is not attributed to the first measured query.
    _materialize(REGISTRY["q6_forecast_revenue"].builder(spark, SF_DIR))
    _probe(spark)  # probe warm-up (codegen for the probe plan itself)

    ordered = sorted(bench_queries.items())
    # Median-of-N official numbers (r10 verdict task #5): run N_PASSES
    # full measured passes — more when the contention gate trips on any
    # of them (up to PAR_LOAD_MAX_ATTEMPTS) — then use the N_PASSES
    # least-contended passes and publish each query's MEDIAN across them.
    attempts = []
    while len(attempts) < PAR_LOAD_MAX_ATTEMPTS:
        attempts.append(_measure_set(spark, ordered))
        clean = [a for a in attempts
                 if a["par_load"] is None
                 or a["par_load"] <= PAR_LOAD_RETRY_THRESHOLD]
        if len(attempts) >= N_PASSES and (
                len(clean) >= N_PASSES
                or len(attempts) == PAR_LOAD_MAX_ATTEMPTS):
            break
        if len(attempts) >= N_PASSES:
            print(json.dumps({"bench_retry": len(attempts),
                              "par_load": attempts[-1]["par_load"],
                              "threshold": PAR_LOAD_RETRY_THRESHOLD}),
                  file=sys.stderr)
    used = sorted(
        attempts,
        key=lambda a: (a["par_load"] is None, a["par_load"] or 0)
    )[:N_PASSES]
    # per-query samples (each itself a min-of-3 reading) + the spread
    # gate: re-sample any query whose window spread exceeds the gate and
    # keep the tightest N_PASSES-sample window as its official reading
    samples = {qn: [a["timings"][qn] for a in used] for qn, _ in ordered}

    def _tightest_window(vals: list[float]) -> list[float]:
        s = sorted(vals)
        i = min(range(len(s) - N_PASSES + 1),
                key=lambda j: s[j + N_PASSES - 1] - s[j])
        return s[i:i + N_PASSES]

    def _win_stats(vals: list[float]) -> tuple[float, float]:
        win = _tightest_window(vals)
        med = _median(win)
        return med, ((max(win) - min(win)) / med if med > 0 else 0.0)

    by_query = dict(ordered)
    spread_runs = 0
    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    resampled: dict[str, int] = {}
    for qn, _ in ordered:
        med, sp = _win_stats(samples[qn])
        # Round 15 (declared in OPTIMIZATION_r15.md; same measurement fix
        # the heavy tier took this round): the extra-sample budget is per
        # ROW, not global — a single stalled query late in the list
        # (q5 77.9 % mid-round, stream_session_window 62.2 % in a
        # degraded-host close attempt) could otherwise exhaust the shared
        # budget and publish the gate failing on visibly tight steady
        # states. `spread_extra_runs` still reports the total.
        row_extra = 0
        while (sp > SPREAD_GATE_PCT / 100.0
               and row_extra < SPREAD_EXTRA_RUNS_PER_ROW):
            row_extra += 1
            spread_runs += 1
            resampled[qn] = resampled.get(qn, 0) + 1
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                _materialize(by_query[qn].builder(spark, SF_DIR))
                best = min(best, time.perf_counter() - t0)
            samples[qn].append(round(best, 4))
            med, sp = _win_stats(samples[qn])
        timings[qn] = round(med, 4)
        spread[qn] = round(sp, 3)
    # r12 advisor: tightest-window selection shifts official numbers
    # toward the fast cluster and makes spread_gate_met near-tautological
    # for re-sampled queries. Publish the PLAIN median over ALL samples
    # alongside (diagnostics + history), and flag exactly which queries'
    # official numbers came from re-sampled tightest-window selection, so
    # cross-round comparisons can use a consistent estimator.
    plain_median = {qn: round(_median(vals), 4)
                    for qn, vals in samples.items()}
    best_attempt = {
        "timings": timings,
        "par_probes": [p for a in used for p in a["par_probes"]],
        "calibration_s": round(
            _median([a["calibration_s"] for a in used]), 4),
        "par_eff": round(_median([a["par_eff"] for a in used]), 3)
        if all(a["par_eff"] for a in used) else None,
        "par_load": round(_median([a["par_load"] for a in used]), 3)
        if all(a["par_load"] for a in used) else None,
    }
    par_probes = best_attempt["par_probes"]

    # heavy tier: outside the calibrated set (raw seconds). Round 14 (r13
    # verdict task #3): the tier was single-shot min-of-2, so the
    # cascade's 19.7 s r13 spike (historical band 8.2–18.8 s) was
    # indistinguishable from a real 20 % regression. Now each row takes
    # HEAVY_PASSES samples, the official reading is the MEDIAN of the
    # tightest window (the headline protocol), rows past the spread gate
    # get bounded extra samples, and the raw sample lists travel in the
    # history record. Estimator break: r8–r13 heavy officials were
    # min-of-2 (index-build amortization — which the median handles too,
    # by voting a build-carrying first sample out); medians read slightly
    # above mins, so cross-round heavy deltas spanning r13→r14 should be
    # read against the published samples, not the scalar alone.
    # Round 15 (r14 verdict task #2, a measurement fix — no timing method
    # change): the extra-sample budget was GLOBAL (8 across the tier), so
    # rows late in the list (`dedup_exact_substring_apply`,
    # `cluster_kmeans_embeddings`) hit their cold-start spread with the
    # budget already consumed by earlier rows and the gate published
    # honestly-failing despite visibly tight steady states. The budget is
    # now PER ROW; `heavy_extra_runs` still reports the total so history
    # parsing is unchanged.
    HEAVY_PASSES = 3
    HEAVY_EXTRA_RUNS_PER_ROW = 4
    heavy: dict[str, float] = {}
    heavy_samples: dict[str, list[float]] = {}
    heavy_spread: dict[str, float] = {}
    heavy_extra = 0
    for name in HEAVY_TIER:
        q = REGISTRY.get(name)
        if q is None:
            continue
        runs: list[float] = []
        for _ in range(HEAVY_PASSES):
            t0 = time.perf_counter()
            _materialize(q.builder(spark, SF_DIR))
            runs.append(round(time.perf_counter() - t0, 4))
        med, sp = _win_stats(runs)
        row_extra = 0
        while (sp > SPREAD_GATE_PCT / 100.0
               and row_extra < HEAVY_EXTRA_RUNS_PER_ROW):
            row_extra += 1
            heavy_extra += 1
            t0 = time.perf_counter()
            _materialize(q.builder(spark, SF_DIR))
            runs.append(round(time.perf_counter() - t0, 4))
            med, sp = _win_stats(runs)
        heavy[name] = round(med, 4)
        heavy_samples[name] = runs
        heavy_spread[name] = round(sp, 3)

    # per-query delta vs the committed history's rolling median, so a real
    # regression (one query moves, plan changed) is distinguishable from a
    # loaded host (every query moves together)
    hist_path = Path(__file__).resolve().parent / "BENCH_HISTORY.jsonl"
    hist_by_query: dict[str, list[float]] = {}
    prev_rec: dict | None = None   # newest prior record (same sf): the
    # cross-round comparator for calibrated per-query ratios; each history
    # line carries its own calibration_s, so the calibration probe's own
    # history IS the committed record (r12 verdict task #8)
    try:
        sf_val = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
        for line in hist_path.read_text().splitlines():
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if str(rec.get("sf")) != sf_val:
                continue
            if rec.get("queries"):
                prev_rec = rec
            for qn, secs in (rec.get("queries") or {}).items():
                hist_by_query.setdefault(qn, []).append(float(secs))
            for qn, secs in (rec.get("heavy") or {}).items():
                hist_by_query.setdefault(qn, []).append(float(secs))
    except OSError:
        pass

    # calibration/contention readings come from the SELECTED attempt
    # (computed inside _measure_set, bracketing exactly those timings)
    calibration_s = best_attempt["calibration_s"]
    noise_factor = round(calibration_s / CALIBRATION_REF_S, 3)
    normalized = {qn: round(t / noise_factor, 4) for qn, t in timings.items()}
    par_eff = best_attempt["par_eff"]
    # >1 = all-core stages ran that much slower than the measured quiet
    # host; ~1.0 = quiet (par_eff alone misleads: quiet reads ~0.5)
    par_load = best_attempt["par_load"]

    # calibrated per-query ratios vs the PREVIOUS round's line (r12
    # verdict task #8): both sides divided by their OWN run's noise
    # factor, so the ratio reads plan change, not host weather. The
    # single-scalar factor still can't split raw-vs-host perfectly —
    # which is why the per-query vs_history normalized deltas and the
    # plain medians ship alongside, never a lone scalar.
    vs_prev_ratio: dict[str, float] = {}
    vs_prev_total = None
    if prev_rec:
        prev_noise = (float(prev_rec.get("calibration_s")
                            or CALIBRATION_REF_S)
                      / float(prev_rec.get("calibration_ref_s")
                              or CALIBRATION_REF_S))
        prev_norm = {qn: float(secs) / prev_noise
                     for qn, secs in prev_rec["queries"].items()
                     if qn in normalized and secs}
        vs_prev_ratio = {qn: round(normalized[qn] / pn, 3)
                         for qn, pn in prev_norm.items() if pn > 0}
        tot_prev = sum(prev_norm.values())
        if tot_prev > 0:
            vs_prev_total = round(
                sum(normalized[qn] for qn in prev_norm) / tot_prev, 3)

    # Round 15 (r14 verdict task #5, measurement only): the rolling-
    # history-median comparator joins the CONTRACT line as
    # `vs_hist_median_norm_total` — r14's `vs_prev_norm_total: 1.123`
    # against a fast-edge single prior sample whipsawed the cross-round
    # signal; the rolling median of committed history lines is the
    # stable denominator (already computed for diagnostics since r2).
    hist_med_tot = sum(_median(h) for qn, h in hist_by_query.items()
                       if qn in normalized and h)
    vs_hist_total = (round(sum(normalized[qn]
                               for qn, h in hist_by_query.items()
                               if qn in normalized and h) / hist_med_tot, 3)
                     if hist_med_tot > 0 else None)

    vs_history = {
        qn: {"median": round(_median(h), 4),
             "delta_pct": round(100.0 * (timings[qn] - _median(h)) / _median(h), 1),
             # the load-corrected delta: what the query would have read on
             # a reference-speed host — a real regression survives this,
             # a loaded host does not
             "delta_norm_pct": round(
                 100.0 * (normalized[qn] - _median(h)) / _median(h), 1)}
        for qn, h in hist_by_query.items() if qn in timings and h
    }

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # The driver captures only the LAST ~2000 chars of stdout, so the
    # contract line must stay compact (r5's full-diagnostic line grew to
    # ~2.4k chars and BENCH_r05.json parsed nothing). Contract fields only
    # here; every derived view (normalized timings, history deltas) goes
    # to stderr + BENCH_HISTORY.jsonl, never stdout.
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "calibration_s": calibration_s,
        "noise_factor": noise_factor,
        "par_eff": par_eff,
        "par_load": par_load,
        "par_load_attempts": [a["par_load"] for a in attempts],
        "passes": len(used),
        "max_spread": (max(spread, key=spread.get)
                       if spread else None),
        "max_spread_pct": (round(100 * max(spread.values()), 1)
                           if spread else None),
        "spread_extra_runs": spread_runs,
        "spread_gate_met": (max(spread.values()) <= SPREAD_GATE_PCT / 100.0
                            if spread else True),
        "vs_prev_norm_total": vs_prev_total,
        "vs_hist_median_norm_total": vs_hist_total,
        # per-HEADLINE-query calibrated ratio vs the previous committed
        # line (r13 verdict task #8): on the contract line itself so
        # cross-round movers are attributable from BENCH_r{N}.json alone
        "vs_prev_norm": {qn: round(r, 2)
                         for qn, r in sorted(vs_prev_ratio.items())},
        "contended": bool(par_load is not None
                          and par_load > PAR_LOAD_RETRY_THRESHOLD),
        "heavy": heavy,
        "heavy_passes": HEAVY_PASSES,
        "heavy_extra_runs": heavy_extra,
        "heavy_max_spread_pct": (round(100 * max(heavy_spread.values()), 1)
                                 if heavy_spread else None),
        "heavy_spread_gate_met": (
            max(heavy_spread.values()) <= SPREAD_GATE_PCT / 100.0
            if heavy_spread else True),
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
    }
    diagnostics = {
        "calibration_ref_s": CALIBRATION_REF_S,
        "parallel_probe_s": par_probes,
        "queries_normalized": normalized,
        "value_normalized": round(sum(normalized.values()), 4),
        "vs_history": vs_history,
        "vs_prev_norm_ratio": vs_prev_ratio,
        "queries_plain_median": plain_median,
        "value_plain_median": round(sum(plain_median.values()), 4),
        "resampled_tightest_window": resampled,
        "per_query_spread": spread,
        "per_pass_timings": [a["timings"] for a in used],
        "per_query_samples": samples,
        "heavy_samples": heavy_samples,
        "heavy_spread": heavy_spread,
    }
    print(json.dumps(diagnostics), file=sys.stderr)
    try:
        # value_normalized travels ON the headline record (r7 verdict
        # nit #2): a parser reading headline lines alone gets the
        # load-corrected trend without the vs_history companion
        hist = dict(out, calibration_ref_s=CALIBRATION_REF_S,
                    value_normalized=diagnostics["value_normalized"],
                    # r12 advisor: flag officials that came from
                    # re-sampled tightest-window selection, and carry the
                    # plain all-samples median so cross-round comparisons
                    # have a selection-free estimator
                    queries_plain_median=plain_median,
                    resampled_tightest_window=resampled,
                    vs_prev_norm_ratio=vs_prev_ratio,
                    heavy_samples=heavy_samples,
                    heavy_spread=heavy_spread,
                    ts=int(time.time()),
                    round=os.environ.get("SPARK_GRAFT_ROUND"))
        # history lines stay raw-timings-only (+ the calibration sample so
        # future rounds can load-correct old entries); derived views are
        # recomputed at read time
        with open(Path(__file__).resolve().parent / "BENCH_HISTORY.jsonl",
                  "a") as f:
            f.write(json.dumps(hist) + "\n")
    except OSError:
        pass  # history is best-effort; never fail the bench line
    spark.stop()
    line = json.dumps(out)
    if len(line) > 1800:  # defend the tail-capture budget, whatever grows
        slim = dict(out, queries={q: round(t, 2)
                                  for q, t in timings.items()},
                    heavy={q: round(t, 2) for q, t in heavy.items()})
        line = json.dumps(slim)
        if len(line) > 1800:
            slim.pop("vs_prev_norm", None)
            line = json.dumps(slim)
            if len(line) > 1800:
                line = json.dumps({k: v for k, v in slim.items()
                                   if k != "queries"})
    print(line)  # LAST stdout line: the driver's parse target


if __name__ == "__main__":
    if "--calibrate" in sys.argv[1:]:
        calibrate()
    else:
        main()
