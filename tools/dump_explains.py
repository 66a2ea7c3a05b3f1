"""Dump .explain("formatted") for every registered query + a plan-shape
summary (Exchange / BroadcastExchange / BatchEvalPython / ArrowEvalPython
node counts, PushedFilters presence). Round-14 optimization evidence:
many suite builders are EAGER (lifecycle fixtures execute inside build),
so this runs them; the captured plan is the returned frame's.

Usage: python3 tools/dump_explains.py [sf_dir] [out_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "plans/r14/explains"
    os.makedirs(out_dir, exist_ok=True)

    from lance_trino_spark.session import get_spark
    from lance_trino_spark.suite import all_queries

    spark = get_spark("dump-explains")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    rows = []
    for name, q in all_queries().items():
        t0 = time.time()
        try:
            df = q.build(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
            with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
                f.write(plan[:40000])
            rows.append((name, plan.count("Exchange"),
                         plan.count("BroadcastExchange"),
                         plan.count("BatchEvalPython"),
                         plan.count("ArrowEvalPython"),
                         plan.count("MapInArrow") + plan.count("MapInPandas"),
                         "PushedFilters" in plan, round(time.time() - t0, 1)))
        except Exception as ex:
            rows.append((name, -1, -1, -1, -1, -1, False, round(time.time() - t0, 1)))
            with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
                f.write(f"EXPLAIN FAILED: {ex!r}\n")
        print(f"# {name}: {rows[-1]}", file=sys.stderr, flush=True)
    with open(os.path.join(out_dir, "SUMMARY.md"), "w") as f:
        f.write("| query | Exchange | BroadcastExchange | BatchEvalPython | "
                "ArrowEvalPython | MapInArrow/Pandas | PushedFilters | build_s |\n")
        f.write("|---|---|---|---|---|---|---|---|\n")
        for r in rows:
            f.write("| " + " | ".join(str(x) for x in r) + " |\n")
    spark.stop()


if __name__ == "__main__":
    main()
