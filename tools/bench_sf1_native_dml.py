"""sf1-scale anchor for NATIVE MoR DML (round-8 surface): on the 2M-row
/ 8-fragment native dataset, time DELETE 1% / UPDATE 1 row / MERGE a
1k-row upsert through native_delete_where / native_update_where /
native_merge_into, and PROVE zero data-file rewrites. Appends a
markdown section to BENCH_SF1.md.

Usage: python3 tools/bench_sf1_native_dml.py"""
from __future__ import annotations

import glob
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from lance_trino_spark.format.lance_native import (
        LanceNativeDataset,
        append_native_rows,
        native_delete_where,
        native_merge_into,
        native_update_where,
        write_native_dataset,
    )
    from lance_trino_spark.session import get_spark
    from lance_trino_spark.sources.lance_datasource import (
        register_lance_datasource,
    )

    src_root = os.path.join(REPO, ".scratch", "sf1-scalar-index")
    root = os.path.join(REPO, ".scratch", "sf1-native-dml")
    shutil.rmtree(root, ignore_errors=True)
    n_frag, rows_per = 8, 250_000
    if os.path.isdir(src_root):
        shutil.copytree(src_root, root)
    else:
        for i in range(n_frag):
            base = i * rows_per
            cols = {
                "k": list(range(base, base + rows_per)),
                "payload": [
                    f"row-{j:08d}" for j in range(base, base + rows_per)
                ],
            }
            (write_native_dataset if i == 0 else append_native_rows)(
                root, cols)
    total = LanceNativeDataset(root).count_rows()

    spark = get_spark("bench-native-dml")
    spark.sparkContext.setLogLevel("ERROR")
    register_lance_datasource(spark)
    files0 = set(glob.glob(os.path.join(root, "data", "*")))

    results = []
    t0 = time.time()
    native_delete_where(spark, root, F.col("k") % 100 == 0)  # 1% = 20k rows
    results.append(("delete_1pct_mor (20k rows)", time.time() - t0))
    t0 = time.time()
    native_update_where(
        spark, root, F.col("k") == 1_000_001,
        {"payload": F.lit("updated")})
    results.append(("update_1row_mor", time.time() - t0))
    upsert = spark.range(500_000, 501_000).selectExpr(
        "id AS k", "concat('merged-', id) AS payload")
    t0 = time.time()
    native_merge_into(spark, root, upsert, on=["k"])
    results.append(("merge_1k_upsert", time.time() - t0))

    ds = LanceNativeDataset(root)
    survivors = ds.count_rows()
    rewrote = bool(files0 - set(glob.glob(os.path.join(root, "data", "*"))))
    stamp = time.strftime("%Y-%m-%d %H:%M")
    lines = [
        "",
        f"## sf1 NATIVE MoR DML anchor ({stamp}, local[32]; {total} rows / "
        f"{n_frag} fragments, real `.lance` layout, no SDK)",
        "",
        "| statement | seconds |",
        "|---|---|",
    ] + [f"| {name} | {sec:.2f} |" for name, sec in results] + [
        "",
        f"post-DML live rows {survivors}; original data files rewritten: "
        f"{rewrote} (must be False — write amplification is O(changed "
        "rows): DV files + delta fragments only).",
        "",
        "Wall-clock is dominated by Python-DataSource job overhead (flat",
        "in data size); the pinned property is the no-rewrite commit and",
        "the per-statement single manifest version.",
    ]
    with open(os.path.join(REPO, "BENCH_SF1.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    assert not rewrote


if __name__ == "__main__":
    main()
