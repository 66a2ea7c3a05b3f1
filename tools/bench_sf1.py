"""sf1 bench anchor: headline relational queries, Spark vs DuckDB on the
SAME parquet files, best-of-3 per query (the pinned noise-band method —
sandbox single-run variance at sf0.1 was measured up to ~2x, so no
regression call is valid off a single run).

Usage: python3 tools/bench_sf1.py [sf_dir]   (default .scratch/sf1;
run tools/gen_sf1.py first). Appends a markdown table to BENCH_SF1.md.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "q01_pricing_summary", "q03_shipping_priority", "q05_local_supplier_volume",
    "q06_revenue_forecast", "q09_product_profit", "q12_priority_classes",
    "q14_promo_revenue", "q18_large_volume_customers",
    "q21_waiting_suppliers", "q24_window_running_revenue",
    # pipeline operators at sf1 (documents/embeddings key-shifted replicas)
    "d01_exact_dedup", "d02_minhash_lsh_dedup", "t01_token_stats",
    "t02_language_id", "t15_rare_ngram_novelty", "s02_bucketed_ann_topk",
    # index family: persisted IVF (build+search), sharded HNSW, binary
    # quantization — the heaviest operators, regression-pinned at sf1 too
    "s09_persisted_ivf_index", "s11_hnsw_index", "s12_binary_quantization",
]

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings")


def jvm_dml_anchor(sf_dir: str) -> None:
    """JVM-catalog DML at sf1 (VERDICT r6 #7): MoR DELETE + DV-bearing
    6M-row scan + SupportsDelta UPDATE write-amplification rows, single
    run each (DML mutates state; the relational anchor carries the
    noise-band method). DuckDB column: the same statement on a duckdb
    table loaded from the same parquet."""
    import shutil

    import duckdb

    from lance_trino_spark.format.dataset import LanceDataset
    from lance_trino_spark.format.manifest import latest_version, read_manifest
    from lance_trino_spark.session import get_spark

    spark = get_spark("bench-sf1-dml")
    root = os.path.join(REPO, ".scratch", "sf1-jvm-dml")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.join(root, "bench"))
    tbl = os.path.join(root, "bench", "lineitem.lance")
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    t0 = time.time()
    LanceDataset.create(tbl, li, max_rows_per_file=1_000_000)
    t_create = time.time() - t0
    jar = os.path.join(REPO, "jvm", "lance-jvm-catalog.jar")
    spark.sql(f"ADD JAR {jar}")
    spark.conf.set("spark.sql.catalog.lance_b", "io.lancespark.LanceJvmCatalog")
    spark.conf.set("spark.sql.catalog.lance_b.root", root)
    rows = []

    def run(name, sql_spark, duck_sql, con):
        t0 = time.time()
        spark.sql(sql_spark)
        ts = time.time() - t0
        t0 = time.time()
        con.execute(duck_sql)
        td = time.time() - t0
        rows.append((name, ts, td))
        print(json.dumps({"anchor": name, "spark_sec": round(ts, 3),
                          "duck_sec": round(td, 3)}))

    li_src = os.path.join(sf_dir, "lineitem.parquet")
    if os.path.isdir(li_src):
        li_src = os.path.join(li_src, "*.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE TABLE li AS SELECT * FROM read_parquet('{li_src}')")

    n0 = spark.sql("SELECT COUNT(*) FROM lance_b.bench.lineitem").collect()[0][0]
    run("delete_1pct_mor",
        "DELETE FROM lance_b.bench.lineitem WHERE l_orderkey % 100 = 0",
        "DELETE FROM li WHERE l_orderkey % 100 = 0", con)
    # DV-bearing full scan (the executor-side bitmap path)
    t0 = time.time()
    n1 = spark.sql(
        "SELECT COUNT(*), SUM(l_quantity) FROM lance_b.bench.lineitem "
        "WHERE l_shipdate IS NOT NULL").collect()[0][0]
    ts = time.time() - t0
    t0 = time.time()
    con.execute("SELECT COUNT(*), SUM(l_quantity) FROM li "
                "WHERE l_shipdate IS NOT NULL").fetchall()
    td = time.time() - t0
    rows.append(("scan_with_dv_6m", ts, td))
    print(json.dumps({"anchor": "scan_with_dv_6m", "rows": int(n1),
                      "spark_sec": round(ts, 3), "duck_sec": round(td, 3)}))
    run("update_1row_mor",
        "UPDATE lance_b.bench.lineitem SET l_tax = 0.5 "
        "WHERE l_orderkey = 1 AND l_linenumber = 1",
        "UPDATE li SET l_tax = 0.5 "
        "WHERE l_orderkey = 1 AND l_linenumber = 1", con)
    run("update_1pct_mor",
        "UPDATE lance_b.bench.lineitem SET l_discount = 0.0 "
        "WHERE l_orderkey % 100 = 1",
        "UPDATE li SET l_discount = 0.0 WHERE l_orderkey % 100 = 1", con)
    # write-amplification proof: no original fragment was rewritten
    m = read_manifest(tbl, latest_version(tbl))
    n_frag = len(m.fragments)
    dv_rows = sum(f.deletion.num_deleted for f in m.fragments if f.deletion)
    lines = [
        "",
        f"## sf1 JVM DML anchor ({time.strftime('%Y-%m-%d %H:%M')}, "
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}], single-run; "
        f"6M-row lineitem, create {t_create:.1f}s, start {n0} rows; "
        f"post-DML: {n_frag} fragments, {dv_rows} DV entries — no fragment "
        "rewritten)",
        "",
        "| anchor | spark (s) | duckdb (s) | ratio |",
        "|---|---|---|---|",
    ]
    for name, ts, td in rows:
        lines.append(f"| {name} | {ts:.3f} | {td:.3f} | "
                     f"{(ts / td if td else 0):.1f}x |")
    lines.append("")
    with open(os.path.join(REPO, "BENCH_SF1.md"), "a") as f:
        f.write("\n".join(lines))
    spark.stop()


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--jvm-dml"]
    sf_dir = args[0] if args else os.path.join(REPO, ".scratch", "sf1")
    if "--jvm-dml" in sys.argv:
        jvm_dml_anchor(sf_dir)
        return
    import duckdb

    from lance_trino_spark.session import get_spark
    from lance_trino_spark.suite import all_queries

    spark = get_spark("bench-sf1")
    registry = all_queries()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        src = p if os.path.isfile(p) else os.path.join(p, "*.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )

    rows = []
    for name in QUERIES:
        q = registry[name]
        spark_times, duck_times = [], []
        n_rows = 0
        for _ in range(3):
            t0 = time.time()
            n_rows = len(q.build(spark, sf_dir).collect())
            spark_times.append(time.time() - t0)
        for _ in range(3):
            t0 = time.time()
            con.execute(q.oracle).fetchall()
            duck_times.append(time.time() - t0)
        rows.append({
            "query": name, "rows": n_rows,
            "spark_best": round(min(spark_times), 3),
            "spark_all": [round(x, 3) for x in spark_times],
            "duck_best": round(min(duck_times), 3),
            "duck_all": [round(x, 3) for x in duck_times],
        })
        print(json.dumps(rows[-1]))

    total_s = sum(r["spark_best"] for r in rows)
    total_d = sum(r["duck_best"] for r in rows)
    lines = [
        "",
        f"## sf1 anchor run ({time.strftime('%Y-%m-%d %H:%M')}, "
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}], best-of-3)",
        "",
        "| query | rows | spark best (s) | spark runs | duckdb best (s) | ratio |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        ratio = (r["spark_best"] / r["duck_best"]) if r["duck_best"] else 0
        lines.append(
            f"| {r['query']} | {r['rows']} | {r['spark_best']} | "
            f"{r['spark_all']} | {r['duck_best']} | {ratio:.1f}x |"
        )
    lines.append(
        f"| **total** | | **{total_s:.2f}** | | **{total_d:.2f}** | "
        f"**{total_s / total_d:.1f}x** |"
    )
    lines.append("")
    with open(os.path.join(REPO, "BENCH_SF1.md"), "a") as f:
        f.write("\n".join(lines))
    print(f"total spark {total_s:.2f}s, duckdb {total_d:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
