"""Registry-wide physical-plan survey: one row per query with operator
counts that matter for the optimization guide (Exchange / sort / join
strategies / Python-eval nodes / scans), written as TSV to stdout.

Streaming queries DRAIN on construction (their registered callable runs
the stream and returns the sink table), so this survey executes those —
run it when the host is otherwise idle.

Usage: python tools/plan_survey.py [--sf DIR] [--out FILE]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

_OPS = [
    ("exchange", r"\bExchange\b"),
    ("sort", r"\bSort\b"),
    ("smj", r"\bSortMergeJoin\b"),
    ("bhj", r"\bBroadcastHashJoin\b"),
    ("shj", r"\bShuffledHashJoin\b"),
    ("bnlj", r"\bBroadcastNestedLoopJoin\b"),
    ("cartesian", r"\bCartesianProduct\b"),
    ("py_eval", r"\b(BatchEvalPython|ArrowEvalPython)\b"),
    ("py_map", r"\b(MapInPandas|MapInArrow|FlatMapGroupsInPandas)\b"),
    ("scan_parquet", r"Scan parquet"),
    ("scan_rdd", r"Scan ExistingRDD"),
    ("union_loop", r"\bUnionLoop\b"),
    ("window", r"\bWindow\b"),
    ("wgl", r"\bWindowGroupLimit\b"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from lua_mapreduce_spark.operators import QUERIES
    from lua_mapreduce_spark.session import get_spark

    spark = get_spark("plan-survey")
    spark.sparkContext.setLogLevel("ERROR")
    out = open(args.out, "w") if args.out else sys.stdout
    print("query\tbuild_s\t" + "\t".join(k for k, _ in _OPS), file=out)
    for name in sorted(QUERIES):
        t0 = time.perf_counter()
        try:
            df = QUERIES[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            counts = [len(re.findall(pat, plan)) for _, pat in _OPS]
        except Exception as exc:  # noqa: BLE001 — survey, never fatal
            print(f"{name}\tERROR {exc!r}", file=out, flush=True)
            continue
        dt = time.perf_counter() - t0
        print(
            f"{name}\t{dt:.2f}\t" + "\t".join(str(c) for c in counts),
            file=out,
            flush=True,
        )
    if args.out:
        out.close()
    spark.stop()


if __name__ == "__main__":
    main()
