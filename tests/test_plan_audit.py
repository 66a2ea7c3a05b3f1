"""Plan-quality gate: headline suite queries must audit clean (pushdown
present, no cartesian products, no row-at-a-time Python), and the audit
itself must catch the anti-patterns it claims to."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lance_trino_spark.plans.audit import audit_plan
from lance_trino_spark.suite import all_queries

SF_DIR = "/root/testdata/sf0.001"

# Headline relational queries — pure scan/join/agg plans that must be clean.
CLEAN_QUERIES = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q12_priority_classes",
    "q18_large_volume_customers",
    "q24_window_running_revenue",
    "e01_hourly_event_stats",
    "t01_token_stats",
    "d01_exact_dedup",
    # round-3 operators: asof (union-window), BM25 (broadcast stats),
    # Gopher rules (narrow scan), packing (window cumsum), KMV (bottom-k)
    "e07_asof_join",
    "s06_bm25_topk",
    "t10_gopher_quality_filter",
    "t13_sequence_packing",
    "e08_kmv_distinct_sketch",
]

# Sanctioned exceptions: a crossJoin against a BROADCAST single-row stats
# frame plans as BroadcastNestedLoopJoin — the legitimate scalar-subquery
# shape (every row needs the same corpus aggregate).
ALLOW_NESTED_LOOP = {"s06_bm25_topk"}


@pytest.mark.parametrize("name", CLEAN_QUERIES)
def test_headline_query_plans_audit_clean(spark, name):
    df = all_queries()[name].build(spark, SF_DIR)
    assert audit_plan(df, allow_nested_loop=name in ALLOW_NESTED_LOOP) == []


def test_audit_flags_cartesian_product(spark):
    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    spark.conf.set("spark.sql.crossJoin.enabled", "true")
    bad = a.join(b)  # no condition
    findings = audit_plan(bad, allow_nested_loop=True)
    assert any("Cartesian" in f or "NestedLoop" in f for f in findings) or (
        audit_plan(bad) != []
    )


def test_audit_flags_row_python_udf(spark):
    from pyspark.sql.functions import udf

    @udf("long")
    def slow(x):
        return x + 1

    bad = spark.range(10).select(slow("id").alias("y"))
    assert any("BatchEvalPython" in f for f in audit_plan(bad))


def test_audit_accepts_arrow_paths(spark):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def fast(x: pd.Series) -> pd.Series:
        return x + 1

    ok = spark.range(10).select(fast("id").alias("y"))
    assert not any("BatchEvalPython" in f for f in audit_plan(ok))


# ---------------------------------------------------------------------------
# Whole-suite sweep: every lazily-buildable query's physical plan must audit
# clean, except explicitly justified shapes. (Format/catalog/streaming
# entries execute real writes at build time and are audited by their own
# gates instead.)
# ---------------------------------------------------------------------------

# name -> justification for the finding the audit raises
SUITE_AUDIT_ALLOW = {
    # single-row broadcast stats crossJoin (scalar-subquery shape)
    "t12_source_mix_weights": "BroadcastNestedLoopJoin",
    "s06_bm25_topk": "BroadcastNestedLoopJoin",
    # exact-baseline crossJoin against a guarded broadcast-small query set
    "s01_cosine_topk": "BroadcastNestedLoopJoin",
    # s04 embeds the exact baseline as its in-query recall validator — the
    # same sanctioned broadcast-small crossJoin as s01; the IVF search
    # itself stays an equi-join on cell id
    "s04_ivf_trained_topk": "BroadcastNestedLoopJoin",
    # s09 embeds the same exact-baseline recall validator as s04; the
    # index-backed search itself is fragment-parallel mapInPandas over
    # postings sidecars (no join at all)
    "s09_persisted_ivf_index": "BroadcastNestedLoopJoin",
    # s11 embeds the same exact-baseline recall validator (HNSW index)
    "s11_hnsw_index": "BroadcastNestedLoopJoin",
    # s12: the hamming shortlist broadcasts the guarded-small query CODES
    # (max_broadcast_queries cap in binary_topk, mirroring cosine_topk) —
    # the sanctioned s06 shape: broadcast-small side x corpus with a
    # non-equi (hamming) predicate; plus the same exact-baseline recall
    # validator crossJoin as s01/s04/s09/s11
    "s12_binary_quantization": "BroadcastNestedLoopJoin",
    # scalar subquery (single-row threshold) planned as nested-loop
    "q11_important_parts": "BroadcastNestedLoopJoin",
    "q22_idle_customers": "BroadcastNestedLoopJoin",
    # hash-bucket sampling predicate (md5 of concat) is not expressible as
    # a parquet pushdown by design — the filter must run engine-side
    "t06_stratified_sample": "PushedFilters",
    # t24's hash-space pre-filter is the same md5-derived engine-side
    # predicate as t06 (it is the mechanism that keeps the ranking window
    # O(sum of caps) instead of a corpus-wide shuffle)
    "t24_capped_source_budgets": "PushedFilters",
    # two-stage rerank broadcasts the guarded-small query set (same
    # sanctioned shape as s01; the loud max_broadcast_queries cap applies)
    "s08_two_stage_prefix_rerank": "BroadcastNestedLoopJoin",
    # t16: (a) single-row corpus-total broadcast scalar; (b) Spark's
    # InferFiltersFromGenerate puts a size(split(...))>0 filter above the
    # scan — derived from the generator, intrinsically non-pushable
    "t16_corpus_token_histogram": ("BroadcastNestedLoopJoin", "PushedFilters"),
    # same InferFiltersFromGenerate-derived filter as t16
    "t17_vocab_stats_by_source": "PushedFilters",
    # s13 embeds the exact-baseline pool builder (cosine_topk — the
    # sanctioned guarded-broadcast crossJoin as s01); the MMR selection
    # itself is per-query applyInPandas over 40-row pools, and the
    # greedy-optimality recheck is bounded equi-joins (pool x k per query)
    "s13_mmr_diversified_topk": "BroadcastNestedLoopJoin",
    # t19: one-row corpus-total aggregate crossJoin'd onto #strata rows —
    # the identical sanctioned scalar-broadcast shape as t12 (the strata
    # count is bounded by #distinct sources, never row-scale)
    "t19_temperature_mix": "BroadcastNestedLoopJoin",
}


def test_whole_suite_plans_audit_clean(spark):
    skipped_prefixes = ("lf", "ds", "cat", "st", "m")
    findings = {}
    for name, q in all_queries().items():
        if name.startswith(skipped_prefixes):
            continue
        df = q.build(spark, SF_DIR)
        fs = audit_plan(df)
        allowed = SUITE_AUDIT_ALLOW.get(name) or ()
        allowed = (allowed,) if isinstance(allowed, str) else allowed
        fs = [f for f in fs if not any(a in f for a in allowed)]
        if fs:
            findings[name] = fs
    assert findings == {}
