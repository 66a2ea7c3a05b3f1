"""Merge-on-read DELETE / UPDATE / MERGE over LanceDataset (SURVEY §2A.A13,
§3.3).

Paradigm = DELETE_ROW_AND_INSERT_ROW exactly like the reference
(`LanceMetadata.java:1116-1120`): affected rows are identified by row address
(`_rowaddr` = fragment_id << 32 | row_index), deletions are bucketed per
fragment and **unioned across all tasks before being applied** (the reference
comments this exact correctness trap, `LanceMetadata.java:1199-1213`), new
row versions land as fresh fragments, and everything commits as ONE Update
transaction with conflict detection (A17).

Scale note: per-fragment deletion lists are bounded by fragment size (1M rows
default), and the driver-side union mirrors the reference coordinator's
`finishMerge`. Deletes that would remove a large share of the table should be
rewritten as an overwrite (copy-on-write) instead — same guidance as every
MoR lakehouse format.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..format.dataset import (
    ROW_ADDR_COL,
    LanceDataset,
    fragment_id_of,
    row_index_of,
)


class MergeError(ValueError):
    pass


def _reject_blob_rewrite(ds: LanceDataset, op: str) -> None:
    # Row-rewriting ops would re-stage blob descriptors as the blanked
    # logical bytes and corrupt the out-of-line layout. DELETE stays fine
    # (deletion vectors only). Mirrors the reference's blob conservatism
    # (blob columns hidden from INSERT, `LanceColumnHandle.java:393-402`).
    if ds.blob_columns:
        raise MergeError(
            f"{op} is not supported on datasets with blob columns "
            f"({ds.blob_columns}); blob fragments are write-once"
        )


def _collect_deletions(addrs: DataFrame) -> dict[int, list[int]]:
    """rowaddr DataFrame → {fragment_id: [row_index]} on the driver. The
    groupBy unions duplicates from every task before the commit applies them."""
    rows = (
        addrs.select(
            fragment_id_of(F.col(ROW_ADDR_COL)).alias("fid"),
            row_index_of(F.col(ROW_ADDR_COL)).alias("ridx"),
        )
        .groupBy("fid")
        .agg(F.collect_set("ridx").alias("ridxs"))
        .collect()
    )
    out: dict[int, list[int]] = defaultdict(list)
    for r in rows:
        out[int(r["fid"])].extend(int(x) for x in r["ridxs"])
    return dict(out)


def delete(
    ds: LanceDataset,
    spark: SparkSession,
    predicate: str | Column,
    cow_threshold_rows: int = 10_000_000,
    cow_threshold_fraction: float = 0.5,
) -> LanceDataset:
    """DELETE FROM t WHERE predicate — MoR: writes deletion vectors only,
    no data rewritten (docs/src/operations/dml/delete.md "Implementation").

    Scale guard: collecting row addresses onto the driver is bounded — when
    the matched count exceeds ``cow_threshold_rows`` or
    ``cow_threshold_fraction`` of the table, the delete is rewritten as a
    copy-on-write overwrite (survivors re-staged by executors, zero rows ever
    collected). Blob datasets always stay MoR — blob fragments are
    write-once, and deletion vectors never touch them.
    """
    scan = ds.to_df(spark, with_row_address=True)
    matched = scan.filter(predicate).select(ROW_ADDR_COL).persist()
    try:
        n_matched = matched.count()
        if n_matched == 0:
            return ds
        big = n_matched > cow_threshold_rows or (
            ds.count_rows() > 0
            and n_matched > cow_threshold_fraction * ds.count_rows()
        )
        if big and not ds.blob_columns:
            # Copy-on-write: anti-join against the (persisted) matched set so
            # NULL-predicate rows survive, exactly like MoR semantics.
            cols = [f.name for f in ds.schema.fields]
            survivors = scan.join(matched, ROW_ADDR_COL, "left_anti").select(*cols)
            staged = LanceDataset._stage_dataframe(survivors, ds.path)
            return ds.commit_overwrite(staged)
        deletions = _collect_deletions(matched)
        return ds.commit_update(deletions)
    finally:
        matched.unpersist()


def update(
    ds: LanceDataset,
    spark: SparkSession,
    set_exprs: dict[str, Column | str],
    predicate: str | Column | None = None,
) -> LanceDataset:
    """UPDATE t SET col = expr [WHERE predicate] — delete old row versions,
    append updated rows as new fragments, one commit."""
    _reject_blob_rewrite(ds, "UPDATE")
    scan = ds.to_df(spark, with_row_address=True)
    matched = scan.filter(predicate) if predicate is not None else scan
    # Two actions read `matched` (stage insert files + collect deletions) —
    # persist so the scan+filter runs once (reference does one pass through
    # the merge sink, `LanceMergeSink.java:86-144`).
    matched = matched.persist()
    try:
        cols = [f.name for f in ds.schema.fields]
        updated = matched
        for name, expr in set_exprs.items():
            if name not in cols:
                raise ValueError(f"unknown column {name!r}")
            updated = updated.withColumn(
                name, F.expr(expr) if isinstance(expr, str) else expr
            )
        new_rows = updated.select(*cols)
        staged = LanceDataset._stage_dataframe(new_rows, ds.path)
        deletions = _collect_deletions(matched.select(ROW_ADDR_COL))
        if not deletions and not staged:
            return ds
        return ds.commit_update(deletions, staged)
    finally:
        matched.unpersist()


def merge_multi(
    ds: LanceDataset,
    spark: SparkSession,
    source: DataFrame,
    on: str | list[str],
    matched_clauses: list[tuple[str | Column | None, dict | None]] = (),
    not_matched_insert: bool = False,
    not_matched_condition: str | Column | None = None,
) -> LanceDataset:
    """MERGE with multiple ordered WHEN MATCHED clauses — full reference
    surface (docs/src/operations/dml/merge.md "Conditional update or
    delete"): each clause is `(condition, set_map)` where condition may be
    None (always true) and set_map None means DELETE. Per SQL MERGE
    semantics the FIRST clause whose condition holds wins for each row;
    source columns are referenced as `_src_<name>` in conditions/sets.

    Scale shape identical to `merge`: one persisted join, one deletion
    union, one insert staging pass, one Update commit.
    """
    _reject_blob_rewrite(ds, "MERGE")
    keys = [on] if isinstance(on, str) else list(on)
    cols = [f.name for f in ds.schema.fields]
    target = ds.to_df(spark, with_row_address=True)
    src = source.select(*[F.col(c).alias(f"_src_{c}") for c in source.columns])
    cond = None
    for k in keys:
        c = F.col(k) == F.col(f"_src_{k}")
        cond = c if cond is None else (cond & c)
    joined = target.join(src, cond, "inner").persist()
    try:
        dup = (
            joined.groupBy(ROW_ADDR_COL)
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise MergeError("MERGE: a target row matches more than one source row")

        # first-match-wins clause index per row
        clause_col = F.lit(None).cast("int")
        chain = None
        for i, (mc, _action) in enumerate(matched_clauses):
            c = (
                F.lit(True)
                if mc is None
                else (F.expr(mc) if isinstance(mc, str) else mc)
            )
            chain = F.when(c, i) if chain is None else chain.when(c, i)
        if chain is not None:
            clause_col = chain.otherwise(F.lit(None).cast("int"))
        affected = joined.withColumn("_clause", clause_col).filter(
            F.col("_clause").isNotNull()
        )

        # every affected row's old version is deleted; update clauses
        # re-insert the rewritten row
        deletions = _collect_deletions(affected.select(ROW_ADDR_COL))
        inserts: DataFrame | None = None
        for i, (_mc, set_map) in enumerate(matched_clauses):
            if set_map is None:
                continue  # DELETE clause
            upd = affected.filter(F.col("_clause") == i)
            for name, expr in set_map.items():
                upd = upd.withColumn(
                    name, F.expr(expr) if isinstance(expr, str) else expr
                )
            part = upd.select(*cols)
            inserts = part if inserts is None else inserts.unionByName(part)

        if not_matched_insert:
            missing = [c for c in cols if c not in source.columns]
            if missing:
                raise MergeError(f"MERGE INSERT requires source columns for {missing}")
            anti = source.join(target.select(*keys), keys, "left_anti")
            if not_matched_condition is not None:
                nmc = (
                    F.expr(not_matched_condition)
                    if isinstance(not_matched_condition, str)
                    else not_matched_condition
                )
                anti = anti.filter(nmc)
            anti = anti.select(*cols)
            inserts = anti if inserts is None else inserts.unionByName(anti)

        staged = (
            LanceDataset._stage_dataframe(inserts, ds.path)
            if inserts is not None
            else []
        )
        if not deletions and not staged:
            return ds
        return ds.commit_update(deletions, staged)
    finally:
        joined.unpersist()


def merge(
    ds: LanceDataset,
    spark: SparkSession,
    source: DataFrame,
    on: str | list[str],
    matched_update: dict[str, Column | str] | None = None,
    matched_delete: bool = False,
    matched_condition: str | Column | None = None,
    insert_not_matched: bool = True,
) -> LanceDataset:
    """MERGE INTO target USING source ON keys — semantics per the reference's
    docs/src/operations/dml/merge.md: WHEN MATCHED [AND cond] THEN
    UPDATE/DELETE, WHEN NOT MATCHED THEN INSERT; a target row matching more
    than one source row is an error.
    """
    _reject_blob_rewrite(ds, "MERGE")
    keys = [on] if isinstance(on, str) else list(on)
    cols = [f.name for f in ds.schema.fields]
    target = ds.to_df(spark, with_row_address=True)

    src = source.select(
        *[F.col(c).alias(f"_src_{c}") for c in source.columns]
    )
    cond = None
    for k in keys:
        c = F.col(k) == F.col(f"_src_{k}")
        cond = c if cond is None else (cond & c)
    # Three consumers read the join (dup check, deletion collect, insert
    # staging) — persist so it is computed once, not three times.
    joined = cached_join = target.join(src, cond, "inner").persist()
    try:
        # Target row matched by >1 source row → reject (merge.md "source must
        # match at most one target row" family of errors).
        dup = (
            joined.groupBy(ROW_ADDR_COL)
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise MergeError("MERGE: a target row matches more than one source row")

        if matched_condition is not None:
            mc = (
                F.expr(matched_condition)
                if isinstance(matched_condition, str)
                else matched_condition
            )
            joined = joined.filter(mc)

        # WHEN MATCHED: every matched row's old version is deleted; unless
        # this is a MATCHED DELETE, the updated row is re-inserted.
        deletions = _collect_deletions(joined.select(ROW_ADDR_COL))
        inserts: DataFrame | None = None
        if matched_update and not matched_delete:
            upd = joined
            for name, expr in matched_update.items():
                upd = upd.withColumn(
                    name, F.expr(expr) if isinstance(expr, str) else expr
                )
            inserts = upd.select(*cols)

        if insert_not_matched:
            missing = [c for c in cols if c not in source.columns]
            if missing:
                raise MergeError(
                    f"MERGE INSERT requires source columns for {missing}"
                )
            anti = source.join(target.select(*keys), keys, "left_anti").select(*cols)
            inserts = anti if inserts is None else inserts.unionByName(anti)

        staged = (
            LanceDataset._stage_dataframe(inserts, ds.path)
            if inserts is not None
            else []
        )
        if not deletions and not staged:
            return ds
        return ds.commit_update(deletions, staged)
    finally:
        cached_join.unpersist()
