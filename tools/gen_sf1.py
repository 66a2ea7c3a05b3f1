"""Generate sf1-scale testdata under .scratch/sf1 by key-offset replication
of the driver's sf0.1 parquet (10 copies with consistently shifted join
keys), so bench numbers stop arguing with sandbox noise at toy scale.

Join consistency: every key column is shifted by copy * (its table's key
span), applied to BOTH sides of each relationship (custkey in customer and
orders; orderkey in orders and lineitem; partkey/suppkey in part/supplier
and lineitem). region/nation stay fixed (dimension tables are fixed-size in
TPC-H at every SF). Dates/prices/flags replicate unchanged — the point is
cardinality and shuffle width, not new value distributions.

Usage: python3 tools/gen_sf1.py [out_dir] [copies]
"""

from __future__ import annotations

import os
import shutil
import sys

SRC = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scratch", "sf1"
    )
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from pyspark.sql import functions as F

    from lance_trino_spark.session import get_spark

    spark = get_spark("gen-sf1")
    os.makedirs(out, exist_ok=True)

    # key spans (max+1) from the source, so shifted copies never collide
    spans = {}
    for tbl, key in (("customer", "c_custkey"), ("orders", "o_orderkey"),
                     ("part", "p_partkey"), ("supplier", "s_suppkey")):
        spans[key] = (
            spark.read.parquet(f"{SRC}/{tbl}.parquet")
            .agg(F.max(key)).first()[0] + 1
        )

    for tbl, key in (("documents", "doc_id"), ("embeddings", "vec_id"),
                     ("events", "event_id")):
        spans[key] = (
            spark.read.parquet(f"{SRC}/{tbl}.parquet")
            .agg(F.max(key)).first()[0] + 1
        )

    shifted_keys = {
        "customer": {"c_custkey": spans["c_custkey"]},
        "orders": {"o_orderkey": spans["o_orderkey"],
                   "o_custkey": spans["c_custkey"]},
        "lineitem": {"l_orderkey": spans["o_orderkey"],
                     "l_partkey": spans["p_partkey"],
                     "l_suppkey": spans["s_suppkey"]},
        "part": {"p_partkey": spans["p_partkey"]},
        "supplier": {"s_suppkey": spans["s_suppkey"]},
        # pipeline tables: key-shifted replicas keep the text/embedding
        # payloads (duplicate CONTENT across copies is realistic for dedup
        # workloads — that's what near-dup detection hunts at 100 TB)
        "documents": {"doc_id": spans["doc_id"]},
        "embeddings": {"vec_id": spans["vec_id"]},
        # events: shift ids so sessions/funnels gain USERS (shuffle keys),
        # not longer per-user histories; ts/value/props replicate unchanged
        "events": {"event_id": spans["event_id"], "user_id": 1500},
    }

    for tbl in ("region", "nation"):
        shutil.copy(f"{SRC}/{tbl}.parquet", f"{out}/{tbl}.parquet")
        print(f"{tbl}: copied")

    for tbl, keymap in shifted_keys.items():
        src = spark.read.parquet(f"{SRC}/{tbl}.parquet")
        parts = []
        for k in range(copies):
            df = src
            for col, span in keymap.items():
                df = df.withColumn(col, F.col(col) + F.lit(k * span))
            if tbl == "embeddings" and k > 0:
                # replicas get a tiny DETERMINISTIC per-copy perturbation:
                # byte-identical vectors across copies make ANN self-match
                # ambiguous (ties), which is a replication artifact — real
                # corpora have near-dups, not exact float-equal embeddings
                df = df.withColumn(
                    "embedding",
                    F.transform(
                        F.col("embedding"),
                        # pseudo-random deterministic per-(copy, dim)
                        # delta, ~±0.1: far enough apart that quantized
                        # ANN separates the copies (top-1 self-match
                        # stays unique under PQ distortion), close
                        # enough to keep them semantic near-dups
                        # magnitude scales with k: same-magnitude deltas
                        # make every copy (near-)EQUIDISTANT from the
                        # original (the residue pattern is just phase-
                        # shifted per k) — engineered distance ties that
                        # flap exact-ANN order checks
                        lambda x, i: (
                            x + ((i * 31 + F.lit(k) * 17) % 11 - 5)
                            * 0.01 * F.lit(k)
                        ).cast("float"),
                    ),
                )
            parts.append(df)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionAll(p)
        if tbl == "embeddings":
            # interleave the copies (deterministic hash order): copy-BLOCKED
            # row order builds HNSW graphs incrementally inside one
            # near-duplicate block at a time, which era-clusters the graph
            # and strands earlier blocks — real ingests are not
            # copy-ordered, and neither should the synthetic corpus be
            big = big.orderBy(F.xxhash64(F.col("vec_id")))
        big.write.mode("overwrite").parquet(f"{out}/{tbl}.parquet")
        print(f"{tbl}: {big.count()} rows")
    spark.stop()


if __name__ == "__main__":
    main()
