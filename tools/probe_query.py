"""Isolated fresh-process single-query probe — the r12 adjudication
discipline, now a tool instead of an ad-hoc snippet.

When a bench line drifts on an UNTOUCHED plan, the in-process sweep
cannot distinguish a plan regression from bench-position contention
(registry growth moving which query pays a shared memoized build, GC /
code-cache pressure, host noise). This probe answers it mechanically:
one fresh python+JVM per invocation, the bench's own session build,
warmup and calibration probe, then N timed runs of EXACTLY ONE
registry query. Compare the probe median against the line's recorded
fresh-process expectation in BASELINE.md; record the verdict there.

Usage:
    python tools/probe_query.py QUERY [--runs N] [--sf SF_DIR]

Prints one JSON line: {"query", "sf", "calib": [start, end],
"runs": [...], "median": s}.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from bench import (
        _build_session,
        _calibration_probe,
        _median_time,
        _warm_session,
    )
    from lua_mapreduce_spark.operators import QUERIES

    if args.query not in QUERIES:
        sys.exit(f"unknown query: {args.query}")

    spark = _build_session(f"probe-{args.query}")
    _warm_session(spark, args.sf)
    _calibration_probe(spark)
    calib_start = statistics.median(
        _median_time(lambda: _calibration_probe(spark))
    )
    runs = _median_time(
        lambda: QUERIES[args.query](spark, args.sf).collect(), args.runs
    )
    calib_end = statistics.median(
        _median_time(lambda: _calibration_probe(spark))
    )
    print(
        json.dumps(
            {
                "query": args.query,
                "sf": args.sf,
                "calib": [round(calib_start, 3), round(calib_end, 3)],
                "runs": [round(t, 3) for t in runs],
                "median": round(statistics.median(runs), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
