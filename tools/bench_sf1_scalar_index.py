"""sf1-scale anchor for scalar-index consumption on native `.lance`
scans: a 2M-row / 8-fragment native dataset; the btree sidecar's
page-bounded lookup + preselected decode vs the unindexed
late-materialized scan. Reports BOTH the driver-side per-fragment read
(where the codec-level win is visible) and the end-to-end Spark
wall-clock (scheduling-bound at this scale). Appends to BENCH_SF1.md.

Usage: python3 tools/bench_sf1_scalar_index.py"""
from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import numpy as np
    import pyarrow.dataset as pads

    from lance_trino_spark.format import lance_native as ln

    root = os.path.join(REPO, ".scratch", "sf1-scalar-index")
    n_frag, rows_per = 8, 250_000
    total = n_frag * rows_per
    t_write = t_build = 0.0
    if not os.path.isdir(root):
        t0 = time.time()
        for i in range(n_frag):
            base = i * rows_per
            cols = {
                "k": list(range(base, base + rows_per)),
                "payload": [
                    f"row-{j:08d}" for j in range(base, base + rows_per)
                ],
            }
            if i == 0:
                ln.write_native_dataset(root, cols)
            else:
                ln.append_native_rows(root, cols)
        t_write = time.time() - t0
        t0 = time.time()
        ln.write_native_scalar_index(root, "k", page_rows=4096)
        t_build = time.time() - t0

    idx = ln.list_native_scalar_indices(root)[0]
    probe_k = 1_499_999
    rows, st = ln.scalar_index_lookup(idx, eq_values=[probe_k])
    m = ln.read_native_manifest(root)
    frag = next(f for f in m.fragments if f.id in rows)

    def frag_read(pre):
        kwargs = {} if pre is None else {"preselected": pre}
        return ln.read_native_fragment(
            root, frag, m,
            filter_expr=pads.field("k") == probe_k, filter_cols=["k"],
            **kwargs)

    def best_ms(fn, n=7):
        fn()  # warm
        return min(
            (lambda t0: (fn(), time.time() - t0)[1])(time.time())
            for _ in range(n)
        ) * 1000

    ti = best_ms(lambda: frag_read(rows[frag.id]))
    tu = best_ms(lambda: frag_read(None))

    # end-to-end Spark wall clock, interleaved best-of-5
    from pyspark.sql import functions as F

    from lance_trino_spark.session import get_spark
    from lance_trino_spark.sources.lance_datasource import (
        register_lance_datasource,
    )

    spark = get_spark("bench-scalar-idx")
    spark.sparkContext.setLogLevel("ERROR")
    register_lance_datasource(spark)

    def scan(indexed):
        r = spark.read.format("lance")
        if not indexed:
            r = r.option("use_scalar_index", "false")
        return r.load(root)

    def point(df):
        return df.filter(F.col("k") == probe_k).collect()

    point(scan(True)); point(scan(False))
    si, su = [], []
    for _ in range(5):
        t0 = time.time(); point(scan(True)); si.append(time.time() - t0)
        t0 = time.time(); point(scan(False)); su.append(time.time() - t0)

    stamp = time.strftime("%Y-%m-%d %H:%M")
    lines = [
        "",
        f"## sf1 scalar-index scan anchor ({stamp}, local[32]; {total} rows "
        f"/ {n_frag} fragments, int64 key + string payload)",
        "",
        (f"dataset write {t_write:.1f} s; btree build {t_build:.1f} s "
         "(driver path)" if t_write else
         "(reusing existing dataset + index)"),
        "",
        "| measurement | indexed | unindexed |",
        "|---|---|---|",
        f"| index lookup IO | {st['pages_read']}/{st['n_pages']} pages, "
        f"{st['bytes_read']} B | — |",
        f"| per-fragment point-probe read (driver, warm) | {ti:.2f} ms | "
        f"{tu:.2f} ms |",
        f"| Spark end-to-end point lookup (best of 5) | {min(si):.2f} s | "
        f"{min(su):.2f} s |",
        "",
        "The codec-level win (preselected decode touches O(matches) values;",
        "mmap faults in only the touched pages) shows in the per-fragment",
        "row; the Spark wall-clock at 2M rows is dominated by job scheduling",
        "and 8-task python-worker startup, identical for both paths — the",
        "index's wall-clock benefit appears when fragments are large enough",
        "that full-column decode dominates task time (the 100 TB regime).",
    ]
    with open(os.path.join(REPO, "BENCH_SF1.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
