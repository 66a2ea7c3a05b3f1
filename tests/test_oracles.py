"""Static guard over the oracle corpus: every registered oracle must PARSE
and PLAN in DuckDB against the real table schemas. Catches oracle syntax
rot (a typo'd oracle otherwise only surfaces when the driver happens to
sample that query) in seconds, with no Spark session at all."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

SF_DIR = "/root/testdata/sf0.001"


def test_every_oracle_parses_and_plans_in_duckdb():
    from check_correctness import duck_connection

    from lance_trino_spark.suite import all_queries

    con = duck_connection(SF_DIR)
    failures = []
    n = 0
    for name, q in all_queries().items():
        if q.oracle is None:
            continue
        n += 1
        try:
            con.sql(f"EXPLAIN {q.oracle}")
        except Exception as e:  # noqa: BLE001 — collecting all failures
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:160]}")
    assert n >= 140  # the corpus really was swept
    assert not failures, "\n".join(failures)


def test_registry_integrity():
    from lance_trino_spark.suite import PRIORITY_WINDOW, all_queries

    qs = all_queries()
    # window names resolve and lead the iteration order
    assert list(qs)[: len(PRIORITY_WINDOW)] == list(PRIORITY_WINDOW)
    # no duplicate names, every query callable and documented
    assert len(set(qs)) == len(qs)
    for q in qs.values():
        assert callable(q.build) and q.doc


def test_no_oracle_returns_hugeint():
    """DuckDB widens SUM(BIGINT) to HUGEINT, which pandas renders as
    float64 — the driver's value-hash then diverges from Spark's exact
    integers even when every value is correct. This bit the corpus three
    times (t15 r4-r5, cat21+lf18 r7). Binding each oracle (relation
    .types — no execution) and refusing HUGEINT/UHUGEINT output columns
    makes the class structurally impossible: any aggregate that widens
    must carry an outer CAST."""
    from check_correctness import duck_connection

    from lance_trino_spark.suite import all_queries

    con = duck_connection(SF_DIR)
    offenders = []
    for name, q in all_queries().items():
        if q.oracle is None:
            continue
        rel = con.sql(q.oracle)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ).upper()
            if "HUGEINT" in t:  # covers HUGEINT and UHUGEINT
                offenders.append(f"{name}.{col}: {t}")
    assert not offenders, (
        "oracle columns reach pandas as float64 (add an outer CAST):\n"
        + "\n".join(offenders)
    )
