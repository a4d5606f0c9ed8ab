"""Dump .explain('formatted') for named queries to plans/<tag>/<query>_<suffix>.txt.

Usage:
    python tools/dump_plans.py --tag r16 --suffix before QUERY [QUERY ...]
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", default="r16")
    ap.add_argument("--suffix", default="before")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from lua_mapreduce_spark.operators import QUERIES
    from lua_mapreduce_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(_REPO, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in args.queries:
        df = QUERIES[name](spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
