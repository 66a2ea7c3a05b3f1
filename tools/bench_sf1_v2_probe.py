"""sf1-scale anchor for FILE-v2 page-skip late materialization (round
9): stage a 2M-row PAGED v2 dataset (8192-row pages, the production
staging shape), build a scalar btree index on the key, and compare a
1-row point probe against the full-column scan — the probe should
touch O(pages hit) of the data file, not O(rows). Appends to
BENCH_SF1.md.

Usage: python3 tools/bench_sf1_v2_probe.py"""
from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from lance_trino_spark.format.lance_native import (
        create_native_dataset,
        ensure_native_scalar_index,
    )
    from lance_trino_spark.session import get_spark
    from lance_trino_spark.sources.lance_datasource import (
        register_lance_datasource,
    )

    spark = get_spark("bench-sf1-v2-probe")
    register_lance_datasource(spark)
    src = spark.read.parquet(
        os.path.join(REPO, ".scratch", "sf1", "lineitem.parquet")
    ).selectExpr(
        "l_orderkey * 8 + l_linenumber AS k",
        "concat('payload-', l_returnflag, '-', CAST(l_partkey AS STRING)) AS payload",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c",
    ).limit(2_000_000)

    root = os.path.join(REPO, ".scratch", "sf1-v2-probe.lance")
    shutil.rmtree(root, ignore_errors=True)
    t0 = time.monotonic()
    create_native_dataset(
        src.repartition(8), root, file_version=2,
        rows_per_fragment=250_000)
    t_create = time.monotonic() - t0
    ensure_native_scalar_index(root, "k")

    def probe(times=5):
        best = None
        for i in range(times):
            t0 = time.monotonic()
            n = (
                spark.read.format("lance").load(root)
                .where(f"k = {1_000_001 + i * 8}")
                .count()
            )
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
            assert n <= 1
        return best

    t_probe = probe()
    t0 = time.monotonic()
    n_all = spark.read.format("lance").load(root).where(
        "price_c > 100").count()
    t_scan = time.monotonic() - t0

    # decode-layer isolation (no Spark job overhead): one fragment's
    # var-width payload column, 1-row selective vs full decode
    import numpy as np

    from lance_trino_spark.format.lance_native import (
        read_file_column, read_native_manifest)
    m = read_native_manifest(root)
    frag = m.fragments[0]
    pfield = next(f for f in m.top_level_fields() if f.name == "payload")
    dfile, ci = frag.file_for_field(pfield.id)
    t0 = time.monotonic()
    full = read_file_column(root, dfile, ci, pfield, m)
    t_full_col = time.monotonic() - t0
    best_sel = None
    for i in range(5):
        t0 = time.monotonic()
        one = read_file_column(
            root, dfile, ci, pfield, m,
            indices=np.array([100_007 + i], dtype=np.int64))
        dt = time.monotonic() - t0
        best_sel = dt if best_sel is None else min(best_sel, dt)
    assert len(one) == 1 and len(full) > 100_000

    lines = [
        "",
        f"## sf1 FILE-v2 page-skip probe anchor ({time.strftime('%Y-%m-%d %H:%M')}, "
        "local[32]; 2M rows, 8 paged v2 fragments, 8192-row pages)",
        "",
        "| metric | value |",
        "|---|---|",
        f"| distributed paged-v2 CREATE (2M rows) | {t_create:.2f} s |",
        f"| indexed point probe, best-of-5 (scalar preselect + page skip) | {t_probe * 1000:.0f} ms |",
        f"| full filtered scan (count {n_all}) | {t_scan:.2f} s |",
        f"| decode layer, one fragment's var-width column: FULL | {t_full_col * 1000:.0f} ms |",
        f"| decode layer, same column, 1-row page-skip selective | {best_sel * 1000:.2f} ms |",
        "",
        "The probe's non-filter columns decode only the pages holding the "
        "preselected row (v2 page-skip late materialization, round 9); "
        "before this round a v2 probe decoded every column fully and "
        "take()'d.",
    ]
    with open(os.path.join(REPO, "BENCH_SF1.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
