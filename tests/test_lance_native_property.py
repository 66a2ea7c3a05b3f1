"""Property-based round-trip tests for the native `.lance` writer/reader
pair (hypothesis): ARBITRARY typed columns — NULLs included, in every
type (the reference's NULLs-everywhere write contract,
BaseLanceConnectorTest.java:118, carried by the repo's leaf-validity
pages) — written with write_native_dataset must come back cell-exact
through read_native_fragment, for both the v1 legacy layout and FILE-v2,
with and without dictionary encoding on var-width columns. The example-based
tests pin the fixture byte layouts; this pins the WHOLE value space the
writer claims (no driver or Spark session involved — the codec pair is
plain Python, so hundreds of cases run in seconds)."""
from __future__ import annotations

import datetime as dt
import itertools
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lance_trino_spark.format.lance_native import (
    LanceNativeDataset,
    read_native_fragment,
    read_native_manifest,
    write_native_dataset,
)

_SEQ = itertools.count()  # unique dataset dir per hypothesis example

# exactly-representable value strategies per pinned logical type
_EPOCH = dt.date(1970, 1, 1)
_TYPED = {
    "int64": st.integers(-(2**63), 2**63 - 1),
    "int32": st.integers(-(2**31), 2**31 - 1),
    "int16": st.integers(-(2**15), 2**15 - 1),
    "int8": st.integers(-128, 127),
    "uint8": st.integers(0, 255),
    "double": st.floats(allow_nan=False, width=64),
    "float": st.floats(allow_nan=False, width=32),
    "bool": st.booleans(),
    "string": st.text(max_size=40),
    "binary": st.binary(max_size=40),
    "date32:day": st.integers(-300_000, 300_000).map(
        lambda d: _EPOCH + dt.timedelta(days=d)
    ),
    "timestamp:us:-": st.integers(-(2**50), 2**50).map(
        lambda us: dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=us)
    ),
}
# FILE-v2's writer covers the flat scalar/var-width family too
_V2_TYPES = ("int64", "int32", "double", "float", "string", "binary")


def _norm(lt: str, v):
    """Writer-input -> reader-output normalization: the reader hands back
    pyarrow-converted Python values (date/datetime objects, floats)."""
    if v is None:
        return None
    if lt == "float":
        # f32 page: compare through the f32 grid (inputs are width-32
        # floats already, so this is the identity — belt and braces)
        import struct as _s

        return _s.unpack("<f", _s.pack("<f", v))[0]
    return v


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_v1_typed_roundtrip_property(tmp_path, data):
    n = data.draw(st.integers(1, 40), label="rows")
    lts = data.draw(
        st.lists(
            st.sampled_from(sorted(_TYPED)), min_size=1, max_size=4
        ),
        label="types",
    )
    cols, types = {}, {}
    for i, lt in enumerate(lts):
        name = f"c{i}"
        cols[name] = data.draw(
            st.lists(
                st.one_of(st.none(), _TYPED[lt]), min_size=n, max_size=n
            ),
            label=name,
        )
        types[name] = lt
    root = str(tmp_path / f"prop-{next(_SEQ)}")
    write_native_dataset(root, cols, types=types)

    m = read_native_manifest(root)
    t = read_native_fragment(root, m.fragments[0], m)
    assert t.num_rows == n
    for i, lt in enumerate(lts):
        got = t.column(f"c{i}").to_pylist()
        want = [_norm(lt, v) for v in cols[f"c{i}"]]
        if lt in ("double", "float"):
            for g, w in zip(got, want):
                assert (g == w) or (
                    g is not None and w is not None
                    and math.isnan(g) and math.isnan(w)
                ), (lt, g, w)
        else:
            assert got == want, lt
    # count_rows agrees without decoding
    assert LanceNativeDataset(root).count_rows() == n


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_v2_and_dictionary_roundtrip_property(tmp_path, data):
    n = data.draw(st.integers(1, 40), label="rows")
    v2 = data.draw(st.booleans(), label="file_v2")
    lts = data.draw(
        st.lists(st.sampled_from(_V2_TYPES), min_size=1, max_size=3),
        label="types",
    )
    cols, types = {}, {}
    for i, lt in enumerate(lts):
        cols[f"c{i}"] = data.draw(
            st.lists(
                st.one_of(st.none(), _TYPED[lt]), min_size=n, max_size=n
            ),
            label=f"c{i}",
        )
        types[f"c{i}"] = lt
    dict_cols = (
        frozenset(
            f"c{i}" for i, lt in enumerate(lts) if lt in ("string", "binary")
        )
        if (not v2 and data.draw(st.booleans(), label="dict"))
        else frozenset()
    )
    root = str(tmp_path / f"prop2-{next(_SEQ)}")
    write_native_dataset(
        root, cols, types=types, file_version=2 if v2 else 1,
        dictionary_columns=dict_cols,
    )
    m = read_native_manifest(root)
    t = read_native_fragment(root, m.fragments[0], m)
    for i, lt in enumerate(lts):
        got = t.column(f"c{i}").to_pylist()
        want = [_norm(lt, v) for v in cols[f"c{i}"]]
        if lt in ("double", "float"):
            for g, w in zip(got, want):
                assert (g == w) or (
                    g is not None and w is not None
                    and math.isnan(g) and math.isnan(w)
                )
        else:
            assert got == want, (lt, v2, bool(dict_cols))
    # (encoding=3 is a per-DATA-FILE property — the manifest keeps the
    # column's base var-binary encoding so files may mix freely; the
    # file-local proto is pinned by test_dictionary_encoded_v1_pages.
    # Here the property is the value round-trip through both layouts.)


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_v2_page_skip_selective_matches_full_property(tmp_path, data):
    """For ANY typed column (NULLs included), page size, and sorted
    selection, the v2 page-skip selective decode must equal the full
    decode taken at those positions."""
    import numpy as np

    from lance_trino_spark.format.lance_native import (
        NativeDataFile,
        NativeField,
        NativeManifest,
        _v1_field_specs,
        _write_v2_data_file,
        read_file_column,
    )

    n = data.draw(st.integers(1, 300), label="rows")
    page_rows = data.draw(st.integers(1, 64), label="page_rows")
    lt = data.draw(st.sampled_from(_V2_TYPES + ("bool",)), label="type")
    vals = data.draw(
        st.lists(
            st.one_of(st.none(), _TYPED[lt]), min_size=n, max_size=n
        ),
        label="vals",
    )
    sel = sorted(data.draw(
        st.sets(st.integers(0, n - 1), max_size=min(n, 20)), label="sel"
    ))

    root = str(tmp_path / f"sel-{next(_SEQ)}")
    import os
    os.makedirs(root, exist_ok=True)
    specs = _v1_field_specs(["c"], {"c": vals}, {"c": lt})
    fn, _ = _write_v2_data_file(root, specs, page_rows=page_rows)
    fields = [NativeField("c", 0, (1 << 64) - 1, lt, True, 0)]
    mani = NativeManifest(fields, [], 1, None)
    dfile = NativeDataFile(fn, [0])

    full = read_file_column(root, dfile, 0, fields[0], mani)
    part = read_file_column(
        root, dfile, 0, fields[0], mani,
        indices=np.asarray(sel, dtype=np.int64))
    want = [full[i].as_py() for i in sel]
    got = part.to_pylist()
    if lt in ("double", "float"):
        for g, w in zip(got, want):
            assert (g == w) or (
                g is not None and w is not None
                and math.isnan(g) and math.isnan(w))
    else:
        assert got == want, (lt, page_rows, sel[:5])


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_v2_nullable_list_roundtrip_property(tmp_path, data):
    """list<T> columns with NULL ROWS (parent validity buffer, zero-length
    extents), empty lists, and NULL ELEMENTS (child leaf validity) must
    round-trip cell-exact through FILE-v2, across page boundaries."""
    from lance_trino_spark.format.lance_native import (
        _v1_field_specs, _write_v1_manifest, _write_v2_data_file)

    elem = data.draw(st.sampled_from(["int64", "double", "string"]))
    rows = data.draw(st.lists(
        st.one_of(
            st.none(),
            st.lists(st.one_of(st.none(), _TYPED[elem]), max_size=5),
        ),
        min_size=1, max_size=25,
    ))
    # the child type is inferred from elements — guarantee one non-null
    if not any(e is not None for r in rows if r for e in r):
        rows = rows + [[data.draw(_TYPED[elem])]]
    page_rows = data.draw(st.sampled_from([None, 3, 7]))

    root = str(tmp_path / f"pl{next(_SEQ)}.lance")
    cols = {"k": list(range(len(rows))), "a": rows}
    specs = _v1_field_specs(["k", "a"], cols, types={"a": "list"})
    import os

    os.makedirs(root, exist_ok=True)
    fn, nr = _write_v2_data_file(root, specs, page_rows=page_rows)
    _write_v1_manifest(
        root, [(s[0], s[1], s[2], s[3]) for s in specs], [(0, fn, nr)], 1)
    got = LanceNativeDataset(root).to_arrow().to_pydict()["a"]
    want = [None if r is None else [_norm(elem, e) for e in r]
            for r in rows]
    assert got == want


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_v2_nested_tree_roundtrip_property(tmp_path, data):
    """ARBITRARY nested type trees (struct/list over scalars, depth <= 3)
    with NULLs at every level must round-trip cell-exact through FILE-v2
    across page boundaries — the recursive writer/reader pair pinned over
    the whole shape space, not just the lf40 example."""
    from lance_trino_spark.format.lance_native import (
        _v1_field_specs, _write_v1_manifest, _write_v2_data_file)

    def type_tree(depth):
        scalars = st.sampled_from(["int64", "double", "string"])
        if depth <= 0:
            return scalars
        return st.one_of(
            scalars,
            st.fixed_dictionaries({}).flatmap(lambda _: st.tuples(
                st.just("struct"),
                st.lists(type_tree(depth - 1), min_size=1, max_size=3))),
            type_tree(depth - 1).map(lambda t: ("list", t)),
        )

    def value_for(t, d, allow_null=True):
        if allow_null and d.draw(st.booleans(), label="null?") and \
                d.draw(st.integers(0, 3)) == 0:
            return None
        if t == "int64":
            return d.draw(st.integers(-(2**40), 2**40))
        if t == "double":
            return d.draw(st.floats(allow_nan=False, width=32))
        if t == "string":
            return d.draw(st.text(max_size=8))
        if isinstance(t, tuple) and t[0] == "struct":
            return {f"f{i}": value_for(ct, d)
                    for i, ct in enumerate(t[1])}
        if isinstance(t, tuple) and t[0] == "list":
            return [value_for(t[1], d)
                    for _ in range(d.draw(st.integers(0, 3)))]
        raise AssertionError(t)

    tree = data.draw(type_tree(3), label="tree")
    n = data.draw(st.integers(1, 12), label="rows")
    page_rows = data.draw(st.sampled_from([None, 4]), label="page_rows")
    rows = [value_for(tree, data) for _ in range(n)]
    # type inference needs a non-null prototype everywhere: retry-free
    # fallback — force row 0 fully non-null
    def force(t, d):
        if t == "int64":
            return 1
        if t == "double":
            return 1.5
        if t == "string":
            return "z"
        if isinstance(t, tuple) and t[0] == "struct":
            return {f"f{i}": force(ct, d) for i, ct in enumerate(t[1])}
        return [force(t[1], d)]
    rows[0] = force(tree, data)

    cols = {"k": list(range(n)), "c": rows}
    lt_hint = ("struct" if isinstance(tree, tuple) and tree[0] == "struct"
               else "list" if isinstance(tree, tuple) else None)
    root = str(tmp_path / f"nt{next(_SEQ)}.lance")
    import os

    os.makedirs(root, exist_ok=True)
    try:
        specs = _v1_field_specs(
            ["k", "c"], cols,
            types={"c": lt_hint} if lt_hint else None)
    except Exception as e:
        # a child with no non-null values anywhere refuses loudly —
        # that IS the contract for inference-driven writes
        assert "no non-null" in str(e) or "cannot infer" in str(e)
        return
    fn, nr = _write_v2_data_file(root, specs, page_rows=page_rows)
    _write_v1_manifest(
        root, [(s[0], s[1], s[2], s[3]) for s in specs], [(0, fn, nr)], 1)
    got = LanceNativeDataset(root).to_arrow().to_pydict()["c"]

    def norm(t, v):
        if v is None:
            return None
        if isinstance(t, tuple) and t[0] == "struct":
            return {f"f{i}": norm(ct, v[f"f{i}"])
                    for i, ct in enumerate(t[1])}
        if isinstance(t, tuple) and t[0] == "list":
            return [norm(t[1], e) for e in v]
        return v

    assert got == [norm(tree, r) for r in rows]


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_fragment_stats_pruning_never_loses_rows_property(tmp_path, data):
    """THE pruning invariant: for random multi-fragment datasets (ints,
    strings, NULLs, duplicate values) and random pushed filters, the
    stats-admitted fragment subset contains every row the full scan's
    filter keeps — pruning may over-admit, never under-admit."""
    from pyspark.sql.datasource import (
        EqualTo, GreaterThan, GreaterThanOrEqual, In, IsNull,
        LessThan, LessThanOrEqual, Not)

    from lance_trino_spark.format.lance_native import (
        append_native_rows, fragment_stats_for_scan,
        read_native_fragment, read_native_manifest, write_native_dataset)
    from lance_trino_spark.sources.lance_datasource import _stats_admit

    n_frags = data.draw(st.integers(2, 4), label="frags")
    root = str(tmp_path / f"ps{next(_SEQ)}.lance")
    ints = st.one_of(st.none(), st.integers(-50, 50))
    strs = st.one_of(st.none(), st.sampled_from(["a", "bb", "c", "dd"]))
    frag_rows = []
    for i in range(n_frags):
        n = data.draw(st.integers(1, 8), label=f"rows{i}")
        cols = {
            "k": [data.draw(ints) for _ in range(n)],
            "s": [data.draw(strs) for _ in range(n)],
        }
        if any(v is not None for v in cols["k"]) or True:
            pass
        frag_rows.append(cols)
    # inference needs one non-null per column somewhere; pin fragment 0
    frag_rows[0]["k"][0] = 0
    frag_rows[0]["s"][0] = "a"
    write_native_dataset(root, frag_rows[0],
                         types={"k": "int64", "s": "string"})
    for cols in frag_rows[1:]:
        append_native_rows(root, cols)

    col = data.draw(st.sampled_from(["k", "s"]), label="col")
    if col == "k":
        v = data.draw(st.integers(-55, 55), label="v")
    else:
        v = data.draw(st.sampled_from(["a", "bb", "c", "dd", "zz"]),
                      label="v")
    f = data.draw(st.sampled_from([
        EqualTo((col,), v),
        GreaterThan((col,), v),
        GreaterThanOrEqual((col,), v),
        LessThan((col,), v),
        LessThanOrEqual((col,), v),
        In((col,), (v,)),
        IsNull((col,)),
        Not(EqualTo((col,), v)),
    ]), label="filter")

    m = read_native_manifest(root)

    def matches(row_v):
        if isinstance(f, IsNull):
            return row_v is None
        if row_v is None:
            return False
        if isinstance(f, Not):
            return row_v != v
        if isinstance(f, EqualTo):
            return row_v == v
        if isinstance(f, In):
            return row_v in f.value
        if isinstance(f, GreaterThan):
            return row_v > v
        if isinstance(f, GreaterThanOrEqual):
            return row_v >= v
        if isinstance(f, LessThan):
            return row_v < v
        return row_v <= v

    for frag in m.fragments:
        stats, rows = fragment_stats_for_scan(root, m, frag)
        admitted = (not stats or not rows
                    or _stats_admit(stats, f, rows))
        if admitted:
            continue
        # a REFUSED fragment must contain zero matching rows
        t = read_native_fragment(root, frag, m)
        vals = t.column(col).to_pylist()
        losers = [x for x in vals if matches(x)]
        assert not losers, (
            f"pruning lost rows: filter={f!r} fragment={frag.id} "
            f"stats={stats} lost={losers[:5]}")


@settings(
    max_examples=60,
    deadline=None,
    # too_slow: a 3000-element list draw can exceed hypothesis's draw
    # budget under full-suite CPU contention — a harness flake, not a
    # codec property
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(data=st.data())
def test_v2_miniblock_roundtrip_property(tmp_path, data):
    """MINIBLOCK pages (FOR + byte-width chunks, MINIBLOCK_LAYOUT) must
    round-trip cell-exact over the whole fixed-width value space, NULLs
    and width extremes included, at any chunk-boundary-straddling row
    count — and the selective (chunk-bounded) decode must agree with the
    full decode at every selected position."""
    import numpy as np

    _MB_TYPES = ("int64", "int32", "int16", "int8", "uint8", "double",
                 "float")
    n = data.draw(st.integers(1, 3000), label="rows")
    lts = data.draw(
        st.lists(st.sampled_from(_MB_TYPES), min_size=1, max_size=2),
        label="types",
    )
    cols, types = {}, {}
    for i, lt in enumerate(lts):
        cols[f"c{i}"] = data.draw(
            st.lists(
                st.one_of(st.none(), _TYPED[lt]), min_size=n, max_size=n
            ),
            label=f"c{i}",
        )
        types[f"c{i}"] = lt
    root = str(tmp_path / f"propmb-{next(_SEQ)}")
    write_native_dataset(
        root, cols, types=types, file_version=2,
        miniblock_columns=frozenset(cols),
    )
    m = read_native_manifest(root)
    t = read_native_fragment(root, m.fragments[0], m)
    sel = data.draw(
        st.lists(st.integers(0, n - 1), min_size=1, max_size=8,
                 unique=True).map(sorted),
        label="sel",
    )
    t_sel = read_native_fragment(
        root, m.fragments[0], m, preselected=np.asarray(sel, np.int64))
    for i, lt in enumerate(lts):
        got = t.column(f"c{i}").to_pylist()
        want = [_norm(lt, v) for v in cols[f"c{i}"]]
        if lt in ("double", "float"):
            for g, w in zip(got, want):
                assert (g == w) or (
                    g is not None and w is not None
                    and math.isnan(g) and math.isnan(w))
        else:
            assert got == want, lt
        got_sel = t_sel.column(f"c{i}").to_pylist()
        assert len(got_sel) == len(sel)
        for g, j in zip(got_sel, sel):
            w = got[j]
            assert (g == w) or (
                g is not None and w is not None
                and isinstance(g, float) and math.isnan(g) and math.isnan(w))


@settings(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(data=st.data())
def test_v2_fullzip_roundtrip_property(tmp_path, data):
    """FULL-ZIP pages (length-prefixed zipped values + repetition index,
    FULLZIP_LAYOUT) must round-trip cell-exact over arbitrary var-width
    values — NULLs, empties, block-boundary-straddling row counts — and
    the selective (block-bounded) decode must agree with the full decode
    at every selected position."""
    import numpy as np

    n = data.draw(st.integers(1, 400), label="rows")
    lts = data.draw(
        st.lists(st.sampled_from(("string", "binary")), min_size=1,
                 max_size=2),
        label="types",
    )
    cols, types = {}, {}
    for i, lt in enumerate(lts):
        cols[f"c{i}"] = data.draw(
            st.lists(
                st.one_of(st.none(), _TYPED[lt]), min_size=n, max_size=n
            ),
            label=f"c{i}",
        )
        types[f"c{i}"] = lt
    root = str(tmp_path / f"propfz-{next(_SEQ)}")
    write_native_dataset(
        root, cols, types=types, file_version=2,
        fullzip_columns=frozenset(cols),
    )
    m = read_native_manifest(root)
    t = read_native_fragment(root, m.fragments[0], m)
    sel = data.draw(
        st.lists(st.integers(0, n - 1), min_size=1, max_size=6,
                 unique=True).map(sorted),
        label="sel",
    )
    t_sel = read_native_fragment(
        root, m.fragments[0], m, preselected=np.asarray(sel, np.int64))
    for i, lt in enumerate(lts):
        got = t.column(f"c{i}").to_pylist()
        want = [_norm(lt, v) for v in cols[f"c{i}"]]
        assert got == want, lt
        got_sel = t_sel.column(f"c{i}").to_pylist()
        assert got_sel == [got[j] for j in sel]


@settings(max_examples=300, deadline=None)
@given(
    prefix=st.text(min_size=0, max_size=6),
    values=st.lists(st.text(min_size=0, max_size=12), min_size=1,
                    max_size=20),
)
def test_prefix_bump_and_zonemap_soundness(prefix, values):
    """`_prefix_bump` upper-bounds EVERY prefix-match, and the zone-map
    admit for StringStartsWith never rejects a fragment that contains a
    match (soundness — rejects may only be false-positives the residual
    filter cleans up, never false-negatives)."""
    from lance_trino_spark.sources.lance_datasource import (
        StringStartsWith,
        _prefix_bump,
        _stats_admit,
    )

    bump = _prefix_bump(prefix)
    for s in values:
        if s.startswith(prefix):
            assert s >= prefix
            if bump is not None:
                assert s < bump

    stats = {"c": {
        "min": min(values), "max": max(values), "nulls": 0}}
    f = StringStartsWith(("c",), prefix)
    if any(s.startswith(prefix) for s in values):
        assert _stats_admit(stats, f, len(values))
