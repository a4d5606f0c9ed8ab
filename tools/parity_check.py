"""Targeted oracle-parity check for a list of queries — the optimization
round's equivalence gate. Runs each named query against its DuckDB oracle
via tests/oracle.compare (the driver-mirror comparison: rows + schema +
order-insensitive values) at one or more scale factors.

Usage:
    python tools/parity_check.py QUERY [QUERY ...] [--sf DIR ...]
    python tools/parity_check.py --prefix graph_ streaming_ --sf \
        /root/testdata/sf0.01 /root/testdata/sf0.1

Exit code 0 iff every (query, sf) pair passes.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--prefix", nargs="*", default=[])
    ap.add_argument(
        "--sf", nargs="*", default=["/root/testdata/sf0.01"]
    )
    args = ap.parse_args()

    from oracle import compare

    from lua_mapreduce_spark.operators import ORACLES, QUERIES
    from lua_mapreduce_spark.session import get_spark

    names = list(args.queries)
    for p in args.prefix:
        names.extend(n for n in sorted(QUERIES) if n.startswith(p))
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark("parity-check")
    spark.sparkContext.setLogLevel("ERROR")
    n_fail = 0
    for sf_dir in args.sf:
        for name in names:
            t0 = time.perf_counter()
            try:
                res = compare(name, QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)
                ok = res.ok
                msg = "" if ok else str(res)
            except Exception as exc:  # noqa: BLE001 — report, keep sweeping
                ok, msg = False, repr(exc)
            dt = time.perf_counter() - t0
            print(
                f"{'PASS' if ok else 'FAIL'} {sf_dir.rsplit('/', 1)[-1]:7s} "
                f"{name:45s} {dt:6.2f}s {msg}",
                flush=True,
            )
            n_fail += 0 if ok else 1
    print(f"{'ALL PASS' if n_fail == 0 else f'{n_fail} FAILURES'}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
