"""Local stand-in for the driver's t2 correctness gate.

Runs every suite query through Spark AND its DuckDB oracle at a given sf dir,
then compares: row count, column names, and order-insensitive values (exact
for ints/strings/dates; bitwise for doubles — the suite's determinism contract
says they must match exactly).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written tables are DIRECTORIES of part files
            # (.scratch/sf1); driver testdata is single files
            p = os.path.join(p, "*.parquet")
        elif not os.path.exists(p):
            continue
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — doubles must match bitwise
    if isinstance(v, bool):
        return str(v)
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon_cell(r[i]) for i in order) for r in rows)


def compare(name: str, spark_df, con) -> dict:
    from lance_trino_spark.suite import all_queries

    q = all_queries()[name]
    t0 = time.time()
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    t_spark = time.time() - t0
    if q.oracle is None:
        return {"name": name, "status": "rows-only", "rows": len(s_rows),
                "spark_sec": round(t_spark, 2)}
    t0 = time.time()
    o_res = con.sql(q.oracle)
    o_cols = [d[0] for d in o_res.description]
    o_rows = o_res.fetchall()
    t_duck = time.time() - t0
    out = {"name": name, "spark_sec": round(t_spark, 2), "duck_sec": round(t_duck, 2)}
    if sorted(s_cols) != sorted(o_cols):
        out.update(status="SCHEMA-MISMATCH", spark_cols=s_cols, oracle_cols=o_cols)
        return out
    if len(s_rows) != len(o_rows):
        out.update(status="ROWCOUNT-MISMATCH", spark_rows=len(s_rows),
                   oracle_rows=len(o_rows))
        return out
    cs, co = canon_rows(s_cols, s_rows), canon_rows(o_cols, o_rows)
    if cs != co:
        diffs = [(a, b) for a, b in zip(cs, co) if a != b][:3]
        out.update(status="VALUE-MISMATCH", rows=len(s_rows), first_diffs=diffs)
        return out
    out.update(status="OK", rows=len(s_rows))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from lance_trino_spark.session import get_spark
    from lance_trino_spark.suite import all_queries

    spark = get_spark("check_correctness")
    con = duck_connection(sf_dir)
    qs = all_queries()
    names = [n for n in sorted(qs) if not only or n in only]
    n_ok = n_weak = 0
    failures = []
    for name in names:
        try:
            df = qs[name].build(spark, sf_dir)
            res = compare(name, df, con)
        except Exception as e:  # noqa: BLE001
            res = {"name": name, "status": "ERROR", "error": repr(e)[:500]}
        status = res["status"]
        if status == "OK":
            n_ok += 1
        elif status == "rows-only":
            n_weak += 1
        else:
            failures.append(res)
        print(res, flush=True)
    print(f"\n== {n_ok} OK, {n_weak} rows-only, {len(failures)} FAILED "
          f"of {len(names)} ==")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
