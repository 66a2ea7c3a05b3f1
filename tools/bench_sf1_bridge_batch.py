"""Scan-floor experiment (VERDICT r13 next #8): does batching the
Python-DataSource Arrow bridge at FRAGMENT granularity recover any of
the measured 2.6-4.2x gap vs in-JVM parquet? The reader already decodes
a whole fragment into one Arrow table and slices it into `batchsize`
RecordBatches for the bridge; this sweeps batchsize from the 65536
default up to whole-fragment (400k rows) on the 6M-row scan fixture and
records the full-scan-aggregate wall time per setting. Appends one
section to BENCH_SF1.md.

Usage: python3 tools/bench_sf1_bridge_batch.py"""
from __future__ import annotations

import datetime
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def best_of(fn, n=3) -> float:
    best = None
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        best = dt if best is None or dt < best else best
    return best


def main() -> None:
    from pyspark.sql import functions as F

    from lance_trino_spark.format.lance_native import create_native_dataset
    from lance_trino_spark.session import get_spark
    from lance_trino_spark.sources.lance_datasource import (
        register_lance_datasource,
    )

    spark = get_spark("bench-sf1-bridge-batch")
    register_lance_datasource(spark)

    nat = os.path.join(REPO, ".scratch", "sf1-scan-native.lance")
    pq = os.path.join(REPO, ".scratch", "sf1-scan-parquet")
    if not os.path.isdir(nat) or not os.path.isdir(pq):
        src = spark.read.parquet(
            os.path.join(REPO, ".scratch", "sf1", "lineitem.parquet")
        ).selectExpr(
            "l_orderkey", "l_partkey", "l_quantity",
            "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c",
            "l_returnflag", "l_shipdate",
        )
        if not os.path.isdir(nat):
            create_native_dataset(
                src.repartition(16), nat, file_version=2,
                rows_per_fragment=400_000)
        if not os.path.isdir(pq):
            src.repartition(16).write.mode("overwrite").parquet(pq)

    def agg(df):
        return df.agg(
            F.sum("price_c").alias("s"), F.count("*").alias("n")
        ).collect()

    t_pq = best_of(lambda: agg(spark.read.parquet(pq)))
    rows = []
    for bsz in (65536, 131072, 262144, 400000):
        t = best_of(lambda: agg(
            spark.read.format("lance").option("batchsize", str(bsz))
            .load(nat)))
        rows.append((bsz, t, t / t_pq))
        print(f"batchsize={bsz}: {t:.2f} s ({t / t_pq:.2f}x parquet)")
    print(f"parquet: {t_pq:.2f} s")

    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    lines = [
        "",
        f"### Bridge batch-granularity sweep ({stamp}, local[32]; "
        "6M rows x 6 cols, 400k-row fragments, full-scan agg best-of-3)",
        "",
        "| bridge batchsize | format(\"lance\") | vs parquet "
        f"({t_pq:.2f} s) |",
        "|---|---|---|",
    ]
    for bsz, t, r in rows:
        label = f"{bsz}" + (" (whole fragment)" if bsz == 400000 else "")
        lines.append(f"| {label} | {t:.2f} s | {r:.2f}x |")
    with open(os.path.join(REPO, "BENCH_SF1.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
