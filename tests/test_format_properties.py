"""Property-based model check of the format layer (SURVEY §5 extension —
the reference has no randomized tests; this closes that gap Spark-side).

Hypothesis drives random sequences of append / MoR-delete / update /
compact against a LanceDataset while a plain-Python model applies the same
operations. After every step the dataset must agree with the model on:

  - scanned contents (exact multiset of rows),
  - the O(1) manifest count (A8) — never drifts from the scan,
  - snapshot isolation: every PRIOR version still replays its own model
    snapshot byte-for-byte (A10/A18 — versions are immutable).

Examples are kept small (Spark jobs per step), but each run explores a
different interleaving — exactly the class of bugs (deletion-union,
version-pinning, compaction rebasing) that example tests hard-code.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lance_trino_spark.format.dataset import LanceDataset
from lance_trino_spark.operators import dml

# One op per step: (kind, parameter)
_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(min_value=1, max_value=12)),
        st.tuples(st.just("delete_lt"), st.integers(min_value=0, max_value=100)),
        st.tuples(st.just("delete_mod"), st.integers(min_value=2, max_value=5)),
        st.tuples(st.just("update_add"), st.integers(min_value=1, max_value=9)),
        st.tuples(st.just("compact"), st.just(0)),
    ),
    min_size=1,
    max_size=6,
)


def _rows_of(ds: LanceDataset, spark) -> set[tuple[int, int]]:
    return {(r["id"], r["val"]) for r in ds.to_df(spark).collect()}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=_OPS, seed=st.integers(min_value=0, max_value=10_000))
def test_random_dml_sequences_match_model(spark, tmp_path_factory, ops, seed):
    root = str(tmp_path_factory.mktemp("prop") / "t.lance")
    next_id = seed  # distinct id ranges across examples

    def batch(n: int):
        nonlocal next_id
        rows = [(next_id + i, (next_id + i) * 7 % 101) for i in range(n)]
        next_id += n
        return rows

    model: dict[int, int] = dict(batch(5))
    ds = LanceDataset.create(
        root,
        spark.createDataFrame(list(model.items()), "id long, val long"),
        max_rows_per_file=3,  # force multiple fragments
    )
    snapshots: dict[int, dict[int, int]] = {ds.version: dict(model)}

    for kind, p in ops:
        if kind == "append":
            rows = batch(p)
            model.update(rows)
            ds = ds.append(
                spark.createDataFrame(rows, "id long, val long"),
                max_rows_per_file=3,
            )
        elif kind == "delete_lt":
            model = {i: v for i, v in model.items() if not v < p}
            ds = dml.delete(ds, spark, f"val < {p}")
        elif kind == "delete_mod":
            model = {i: v for i, v in model.items() if not i % p == 0}
            ds = dml.delete(ds, spark, f"id % {p} = 0")
        elif kind == "update_add":
            model = {
                i: (v + p if i % 3 == 1 else v) for i, v in model.items()
            }
            ds = dml.update(
                ds, spark, {"val": f"val + {p}"}, predicate="id % 3 = 1"
            )
        elif kind == "compact":
            ds = ds.compact(spark, target_rows_per_file=50)
        snapshots[ds.version] = dict(model)

        # live contents + O(1) count agree with the model
        assert _rows_of(ds, spark) == set(model.items())
        assert ds.count_rows() == len(model)

    # every historical version still replays its own snapshot (immutability
    # + snapshot isolation), including across compactions
    for v, snap in snapshots.items():
        old = LanceDataset.open(ds.path, version=v)
        assert _rows_of(old, spark) == set(snap.items()), f"version {v} drifted"
        assert old.count_rows() == len(snap)
    assert os.path.isdir(ds.path)


# ---------------------------------------------------------------------------
# Schema-evolution model check: random add-column / drop-column / append /
# delete / restore sequences. The model tracks both the schema (ordered
# column list) and per-row values; NULL-fill of pre-add fragments, retired-
# name enforcement, restore's snapshot semantics, and historical replay all
# fall out of the comparison.
# ---------------------------------------------------------------------------
_EVO_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(min_value=1, max_value=8)),
        st.tuples(st.just("add_col"), st.integers(min_value=0, max_value=3)),
        st.tuples(st.just("drop_col"), st.integers(min_value=0, max_value=3)),
        st.tuples(st.just("delete_mod"), st.integers(min_value=2, max_value=4)),
        st.tuples(st.just("restore"), st.integers(min_value=0, max_value=5)),
    ),
    min_size=2,
    max_size=7,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=_EVO_OPS, seed=st.integers(min_value=0, max_value=10_000))
def test_random_evolution_sequences_match_model(
    spark, tmp_path_factory, ops, seed
):
    root = str(tmp_path_factory.mktemp("evoprop") / "t.lance")
    next_id = seed

    def rows_df(rows, cols):
        schema = ", ".join(f"{c} long" for c in cols)
        return spark.createDataFrame(rows, schema)

    cols = ["id", "val"]
    retired: set[str] = set()
    model: dict[int, dict] = {}

    def batch(n):
        nonlocal next_id
        out = []
        for i in range(n):
            rid = next_id + i
            out.append({c: (rid if c == "id" else rid * 7 % 101 if c == "val"
                            else rid % 13) for c in cols})
        next_id += n
        return out

    first = batch(4)
    model = {r["id"]: r for r in first}
    ds = LanceDataset.create(
        root,
        rows_df([tuple(r[c] for c in cols) for r in first], cols),
        max_rows_per_file=3,
    )
    snapshots = {ds.version: ({i: dict(r) for i, r in model.items()}, list(cols))}

    def check(ds, model, cols):
        got = {
            r["id"]: {c: r[c] for c in cols}
            for r in ds.to_df(spark).collect()
        }
        assert set(ds.to_df(spark).columns) == set(cols)
        assert got == model
        assert ds.count_rows() == len(model)

    for kind, p in ops:
        if kind == "append":
            rows = batch(p)
            for r in rows:
                model[r["id"]] = dict(r)
            ds = ds.append(
                rows_df([tuple(r[c] for c in cols) for r in rows], cols),
                max_rows_per_file=3,
            )
        elif kind == "add_col":
            name = f"c{p}"
            if name in cols or name in retired:
                continue
            ds = ds.add_column(name, "bigint")
            cols.append(name)
            for r in model.values():
                r[name] = None
        elif kind == "drop_col":
            name = f"c{p}"
            if name not in cols:
                continue
            ds = ds.drop_column(name)
            cols.remove(name)
            retired.add(name)
            for r in model.values():
                r.pop(name, None)
        elif kind == "delete_mod":
            victims = [i for i in model if i % p == 0]
            for i in victims:
                del model[i]
            ds = dml.delete(ds, spark, f"id % {p} = 0")
        elif kind == "restore":
            versions = sorted(snapshots)
            target = versions[p % len(versions)]
            snap_model, snap_cols = snapshots[target]
            ds = ds.restore(target)
            model = {i: dict(r) for i, r in snap_model.items()}
            cols = list(snap_cols)
        snapshots[ds.version] = (
            {i: dict(r) for i, r in model.items()}, list(cols)
        )
        check(ds, model, cols)

    # historical replay incl. schema history
    for v, (snap, snap_cols) in snapshots.items():
        old = LanceDataset.open(ds.path, version=v)
        assert [f.name for f in old.schema.fields] == snap_cols
        got = {
            r["id"]: {c: r[c] for c in snap_cols}
            for r in old.to_df(spark).collect()
        }
        assert got == snap, f"version {v} drifted"
