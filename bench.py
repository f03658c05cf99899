"""Benchmark harness — driver contract.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation, no
driver-side collect cost). One warmup pass of a trivial action amortizes JVM
/ codegen startup out of the measured numbers.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# every declared query except the lake round-trip (it writes a temp
# warehouse — correctness-gated, not a throughput metric)
EXCLUDE = {"iceberg_roundtrip"}

# Control-trio clean-band reference (BASELINE.md): the early-r07 clean P3
# run measured these three plan-stable control queries IN-BENCH at sf0.1 at
# 1.16 / 1.81 / 1.03 s. Every later round's runs landed on a drifted host
# (1.3-1.6x on the same controls with unchanged plans), so cross-round
# totals were only comparable when host luck cooperated. The normalized
# metric divides the run total by the geometric mean of the in-run control
# ratios vs this band — a drift estimate measured INSIDE the same process /
# JVM / load window as every other number in the run — so cross-round
# comparisons stop depending on the host's background load. sf0.1 only:
# the band is an sf0.1 measurement.
_CONTROL_CLEAN_SF01 = {
    "pricing_summary": 1.16,
    "partition_evolution": 1.81,
    "supplier_share_trend": 1.03,
}


def _force(df) -> None:
    """Materialize the full result without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from bytewax_iceberg_connector_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    names = [n for n in sorted(qs) if n not in EXCLUDE]
    # execution order: the wall budget gives whichever end runs LAST a
    # cold single pass every run, so successive runs ALTERNATE direction
    # (each query gets a warm best-of-2 number at least every other
    # round). The previous run's direction is read from BENCH_DETAIL.json;
    # SPARK_GRAFT_BENCH_ORDER=asc|desc pins it explicitly. Warm numbers
    # are order-independent, and the detail file records exec_order so
    # cross-round tooling can separate the cold tail mechanically.
    exec_order = os.environ.get("SPARK_GRAFT_BENCH_ORDER")
    if exec_order not in ("asc", "desc"):
        try:
            with open(os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_DETAIL.json",
            )) as f:
                prev = json.load(f).get("exec_order", "desc")
            exec_order = "desc" if prev == "asc" else "asc"
        except (OSError, ValueError):
            exec_order = "asc"
    if exec_order == "desc":
        names.reverse()
    # light warmup: JVM/parquet-footer startup only. A FULL warmup pass
    # became redundant once timing went best-of-2 — the first timed run
    # is the cold/codegen-compile run and min() always lands on the warm
    # second — and at 140+ queries the extra pass pushed total wall past
    # external harness timeouts (~1/3 of the run for numbers min() never
    # used).
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    # best-of-2 steady-state timing per query (local single-JVM runs have
    # multi-second GC/scheduler noise; min is the stable estimator; the
    # first run doubles as that query's JIT/codegen warmup).
    # clearCache between QUERIES: every query() call persists fresh frames
    # (index tables etc.), and with 90+ queries x 2 passes the storage pool
    # otherwise accumulates until eviction thrash dominates the early
    # alphabet — each query pays its own persist cost, no cross-query noise.
    # wall-clock budget guard: the external harness kills the process at
    # ~600 s and a killed run records NOTHING, so stop-and-record beats a
    # complete-but-lost run. Queries the budget cuts are counted in the
    # final line (`queries_unrun`) — a capped run is visibly capped, never
    # silently "complete".
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "480"))
    t_start = time.perf_counter()

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    # per-query clean-band references (BENCH_REF.json = min warm sf0.1
    # timing ever recorded; bursts/drift only inflate timings, so the
    # cross-run minimum converges on the clean-host steady-state cost).
    # Loaded BEFORE the timing loop so a query whose in-run ratio blows
    # past the burst threshold can be re-timed immediately (see below).
    ref_q: dict[str, float] = {}
    try:
        with open(os.path.join(repo_dir, "BENCH_REF.json")) as f:
            loaded = json.load(f)
        if isinstance(loaded, dict) and isinstance(loaded.get("queries"), dict):
            ref_q = loaded["queries"]
    except (OSError, ValueError):
        pass
    # burst-retest (r10 VERDICT item 2): a GC/scheduler burst on a loaded
    # host can inflate ONE query's best-of-2 well past its clean band —
    # r10 archived similarity_ivf_pq at 2.178x when its true warm cost was
    # ~1.07x. When a warm in-run ratio vs BENCH_REF exceeds this, the
    # query is re-timed once more in the SAME process and BOTH numbers are
    # recorded (BENCH_DETAIL.json: sec_pre_retest + burst_suspect); the
    # min becomes the query's number, so a burst can never be archived as
    # the cost while a true plan regression (retest also slow) still
    # shows. BASELINE.md documents the read rule.
    burst_ratio = float(os.environ.get("SPARK_GRAFT_BURST_RATIO", "2.0"))

    timings: dict[str, float] = {}
    passes: dict[str, int] = {}
    burst_pre: dict[str, float] = {}
    _running_ratios: list[float] = []  # warm ratios vs ref, loop-order
    unrun_names: list[str] = []
    unrun = 0
    single_pass = 0
    for i, name in enumerate(names):
        if time.perf_counter() - t_start > budget:
            unrun = len(names) - i  # everything from here on is unrun
            unrun_names = names[i:]
            break
        t0 = time.perf_counter()
        _force(qs[name](spark, sf_dir))
        best = time.perf_counter() - t0
        # second (warm/steady-state) pass only while clearly inside the
        # wall budget: at 190+ queries the doubled wall can cross the
        # harness cap, and COVERAGE (every query timed once) beats
        # best-of-2 stability for the tail — a single-pass tail number is
        # cold-biased but recorded; an unrun query is a hole. The
        # authoritative per-query cold/warm flag is BENCH_DETAIL.json's
        # `passes` (execution order ALTERNATES between runs, so the old
        # sorted-suffix convention no longer identifies the tail).
        # controls ALWAYS get the steady-state pass (3 extra runs ≈ 5 s):
        # the drift factor requires all three warm, and on a slow host
        # the cold tail otherwise swallows a control and withholds the
        # normalized number exactly when it is most needed
        if (
            time.perf_counter() - t_start < budget * 0.85
            or name in _CONTROL_CLEAN_SF01
        ):
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
            passes[name] = 2
        else:
            single_pass += 1
            passes[name] = 1
        # burst-retest: only meaningful against a warm (best-of-2) number
        # at the ref's scale; the retest still honors the wall budget (a
        # killed run records nothing) with headroom for one more pass.
        # r12 (VERDICT item 4): the trigger is the ratio OVER THE RUNNING
        # MEDIAN of warm ratios so far, not the raw ratio vs ref — on a
        # sustained-slow host every query reads 1.5-2x its clean band and
        # the old raw trigger fired 8 retests that all "confirmed slow"
        # (the host, not the query). Dividing by the run's own drift makes
        # the trigger mean "this query is slow RELATIVE TO THIS RUN".
        # Before 10 warm ratios exist the raw ratio is the only signal.
        ref = ref_q.get(name)
        raw_ratio = (
            best / ref
            if isinstance(ref, (int, float)) and ref > 0
            else None
        )
        run_med = (
            statistics.median(_running_ratios)
            if len(_running_ratios) >= 10
            else None
        )
        if (
            sf == "0.1"
            and passes[name] == 2
            and raw_ratio is not None
            and (raw_ratio / run_med if run_med else raw_ratio)
            > burst_ratio
            and time.perf_counter() - t_start + best < budget
        ):
            burst_pre[name] = round(best, 3)
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
            passes[name] = 3  # the retest IS a third timed pass (r12
            # ADVICE: the warm/cold bookkeeping must reflect it)
        if (
            sf == "0.1"
            and passes[name] >= 2
            and isinstance(ref, (int, float))
            and ref > 0
        ):
            _running_ratios.append(best / ref)
        timings[name] = round(best, 3)
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    # Each warm query gets ratio = sec/ref in BENCH_DETAIL.json, and the
    # MEDIAN warm ratio is a ~200-point drift estimate no single burst
    # can move (r09 VERDICT: the 3-point control trio read 1.07 on a run
    # where one query absorbed a 2x burst) — a query whose ratio stands
    # far above the run median is a burst or a true plan regression, and
    # comparing its ratio across rounds separates the two.
    ratios: dict[str, float] = {}
    if sf == "0.1":
        for n, sec in timings.items():
            r = ref_q.get(n)
            if passes.get(n, 0) >= 2 and isinstance(r, (int, float)) and r > 0:
                ratios[n] = round(sec / r, 3)
    drift_median = (
        round(statistics.median(ratios.values()), 3)
        if len(ratios) >= 20
        else None
    )
    # keep the reference fresh: a warm timing below the stored min becomes
    # the new clean-band estimate (never raised — regressions must show as
    # persistent ratio > 1, not silently rebase the bar). runs_seen counts
    # every sf0.1 run consumed (the seeder's definition), so the file is
    # rewritten each run whether or not a minimum moved. The whole block
    # is corruption-tolerant: a hand-mangled BENCH_REF.json must degrade
    # to a reseed, never crash main() between timing and the stdout line.
    if sf == "0.1":
        try:
            for n, sec in timings.items():
                r = ref_q.get(n)
                if passes.get(n, 0) >= 2 and sec > 0 and (
                    not isinstance(r, (int, float)) or sec < r
                ):
                    ref_q[n] = sec
            try:
                with open(os.path.join(repo_dir, "BENCH_REF.json")) as f:
                    payload = json.load(f)
                if not isinstance(payload, dict):
                    raise ValueError("non-dict payload")
            except (OSError, ValueError):
                payload = {"note": "per-query clean-band reference = min "
                           "warm (best-of-2) sf0.1 timing ever recorded",
                           "runs_seen": 0}
            payload["queries"] = {n: ref_q[n] for n in sorted(ref_q)}
            try:
                payload["runs_seen"] = int(payload.get("runs_seen", 0)) + 1
            except (TypeError, ValueError):
                payload["runs_seen"] = 1
            with open(os.path.join(repo_dir, "BENCH_REF.json"), "w") as f:
                json.dump(payload, f, indent=1)
        except Exception:
            pass  # the stdout record must survive any ref-file trouble
    # control-normalized total (sf0.1 only; see _CONTROL_CLEAN_SF01).
    # Requires all three controls timed warm (best-of-2): a cold-tail
    # control would overstate drift and flatter the normalized number.
    drift = None
    norm = None
    if sf == "0.1" and all(
        passes.get(c, 0) >= 2 and timings.get(c, 0) > 0
        for c in _CONTROL_CLEAN_SF01
    ):
        # the >0 gate: timings round to 3 dp, and log(0) after a full
        # 480 s run would crash BEFORE the stdout line prints — the
        # normalization must degrade to None, never lose the record
        import math

        drift = round(
            math.exp(
                sum(
                    math.log(timings[c] / ref)
                    for c, ref in _CONTROL_CLEAN_SF01.items()
                )
                / len(_CONTROL_CLEAN_SF01)
            ),
            3,
        )
        norm = round(total / drift, 3)
    # full-fidelity side file: the stdout line is budgeted to the driver's
    # 2000-char capture window, so the per-query pass count (cold
    # single-pass vs warm best-of-2) lives here — cross-round tooling
    # excludes the cold tail mechanically instead of re-deriving it from
    # the sorted-suffix convention.
    detail = {
        "sf": float(sf) if sf else None,
        "exec_order": exec_order,
        "total_sec": total,
        "controls": {c: timings.get(c) for c in _CONTROL_CLEAN_SF01},
        "drift_factor": drift,
        "total_sec_normalized": norm,
        # median warm per-query ratio vs BENCH_REF.json — the burst-proof
        # drift estimate (~200 points vs the trio's 3); per-query `ratio`
        # below separates a one-query burst from a plan regression
        "drift_median_ratio": drift_median,
        "total_sec_normalized_median": (
            round(total / drift_median, 3) if drift_median else None
        ),
        "queries": {
            n: {
                "sec": timings[n],
                "passes": passes[n],
                **({"ratio": ratios[n]} if n in ratios else {}),
                # drift-relative ratio (r12 VERDICT item 4): per-query
                # ratio / the run's median warm ratio. A sustained-slow
                # host inflates `ratio` uniformly but leaves this ~1, so
                # an archived number can only pattern-match a plan
                # regression when the query is slow RELATIVE TO ITS OWN
                # RUN. The read rule: >2.0 here = regression candidate.
                **(
                    {
                        "ratio_over_run_median": round(
                            ratios[n] / drift_median, 3
                        )
                    }
                    if n in ratios and drift_median
                    else {}
                ),
                # burst-retest record: sec_pre_retest is the inflated
                # best-of-2 that tripped the trigger; `sec` is
                # min(pre, retest). burst_suspect (r12): set ONLY when
                # the FINAL number still stands >2x the run median — a
                # retest that recovered, or a number the run's own drift
                # explains, is not a suspect.
                **(
                    {"sec_pre_retest": burst_pre[n]}
                    if n in burst_pre
                    else {}
                ),
                # when <20 warm ratios exist (budget-truncated run) the
                # drift context is unknowable — fall back to the raw
                # ratio so a retested-and-still-slow query can never be
                # archived flagless (r12 review find)
                **(
                    {"burst_suspect": True}
                    if n in ratios
                    and (ratios[n] / drift_median if drift_median
                         else ratios[n]) > burst_ratio
                    else {}
                ),
            }
            for n in timings
        },
        "unrun": unrun_names,
    }
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_DETAIL.json"), "w"
        ) as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass  # a read-only checkout must not kill the stdout contract
    print(
        _final_line(total, timings, float(sf) if sf else None, unrun,
                    single_pass, drift, norm, drift_median,
                    len(burst_pre))
    )
    spark.stop()


# the driver captures only the last 2000 characters of stdout and parses the
# final JSON line out of that window — a line longer than the window is
# unparseable no matter how complete it is (this truncated the round-2
# record). Budget the line; if the per-query dict would overflow, keep the
# slowest entries and summarize the rest.
_LINE_BUDGET = 1900


def _final_line(
    total: float, timings: dict[str, float], sf, unrun: int = 0,
    single_pass: int = 0, drift: float | None = None,
    norm: float | None = None, drift_median: float | None = None,
    burst_retests: int = 0,
) -> str:
    def render(q: dict[str, float], omitted: int, omitted_sec: float) -> str:
        payload = {
            "metric": "headline_queries_total_sec",
            "value": total,
            "unit": "sec",
            "queries": q,
            "sf": sf,
        }
        if drift is not None:
            # host-load drift vs the clean-band control trio (BASELINE.md);
            # value_normalized = value / drift_factor is the cross-round
            # comparable number
            payload["drift_factor"] = drift
            payload["value_normalized"] = norm
        if drift_median is not None:
            # burst-proof variant: median warm per-query ratio vs
            # BENCH_REF.json (~200 points — one bursty query can't move
            # it); per-query ratios live in BENCH_DETAIL.json
            payload["drift_median"] = drift_median
            payload["value_normalized_median"] = round(
                total / drift_median, 3
            )
        if omitted:
            payload["queries_omitted"] = omitted
            payload["omitted_sec"] = round(omitted_sec, 3)
        if unrun:
            payload["queries_unrun"] = unrun
        if single_pass:
            # count of cold-biased (no steady-state pass) queries; the
            # per-query flag lives in BENCH_DETAIL.json (`passes`), since
            # execution order alternates between runs
            payload["single_pass_tail"] = single_pass
        if burst_retests:
            # queries whose warm in-run ratio vs BENCH_REF exceeded the
            # burst threshold and were re-timed in-process; both numbers
            # live in BENCH_DETAIL.json (sec_pre_retest / burst_suspect)
            payload["burst_retests"] = burst_retests
        return json.dumps(payload, separators=(",", ":"))

    line = render(timings, 0, 0.0)
    if len(line) <= _LINE_BUDGET:
        return line
    by_cost = sorted(timings, key=timings.get, reverse=True)
    keep = len(by_cost)
    while keep > 1:
        keep -= 1
        kept = {n: timings[n] for n in by_cost[:keep]}
        omitted = len(timings) - keep
        omitted_sec = sum(timings[n] for n in by_cost[keep:])
        line = render(kept, omitted, omitted_sec)
        if len(line) <= _LINE_BUDGET:
            return line
    return line


if __name__ == "__main__":
    main()
