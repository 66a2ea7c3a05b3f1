"""sf1 anchor for the DISTRIBUTED integer-lattice k-means (suite s14):
run kmeans_lattice over the 20k x 64d sf1 embeddings on local[32],
pinning per-iteration wall-clock and the exact integer inertia (which
is reproducible bit-for-bit on ANY cluster size — the operator's whole
point). Appends a markdown section to BENCH_SF1.md.

Usage: python3 tools/bench_sf1_kmeans.py [sf_dir]
       (default .scratch/sf1 — run tools/gen_sf1.py first)."""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from lance_trino_spark.operators.similarity import kmeans_lattice
    from lance_trino_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scratch", "sf1")
    spark = get_spark("bench-sf1-kmeans")
    emb = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")).cache()
    n = emb.count()  # materialize the cache before timing

    rows_per_iter = []
    inertia = None
    for iters in (1, 2, 4):
        t0 = time.time()
        out = (
            kmeans_lattice(emb, k=16, iters=iters, dim=64)
            .agg(F.sum("dist").alias("inertia"),
                 F.count("*").alias("n"))
            .collect()[0]
        )
        dt = time.time() - t0
        rows_per_iter.append((iters, dt, int(out["inertia"])))
        inertia = int(out["inertia"])
        assert out["n"] == n

    stamp = time.strftime("%Y-%m-%d %H:%M")
    lines = [
        "",
        f"## sf1 distributed integer-lattice k-means anchor ({stamp}, "
        f"local[32]; {n} x 64d vectors, k=16)",
        "",
        "| Lloyd iterations | wall s | exact integer inertia |",
        "|---|---|---|",
    ]
    for iters, dt, ine in rows_per_iter:
        lines.append(f"| {iters} | {dt:.2f} | {ine} |")
    lines += [
        "",
        "Every assign/update is exact lattice arithmetic: the inertia",
        "column is bit-reproducible on any partitioning or cluster size",
        "(the sf0.01 suite oracle reproduces it in DuckDB). Per-iteration",
        "cost is one literal-array map + one map-side-combinable groupBy",
        f"of k x 65 partial sums; the driver sees 16 rows per iteration.",
    ]
    with open(os.path.join(REPO, "BENCH_SF1.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
