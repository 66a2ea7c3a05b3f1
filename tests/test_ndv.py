"""NDV hash family (format/ndv.py) — the shared vectorized fold behind
both stats planes (own-format manifest zone maps, native sidecars)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lance_trino_spark.format import ndv
from lance_trino_spark.format.fragments import (
    _hll_numeric_update, _hll_string_update)
from lance_trino_spark.format.lance_native import _hll_hex, hll_ndv_from_hex


def test_numeric_fold_parity_with_r10_registers():
    """The ndv.py refactor must keep the OWN-FORMAT registers
    bit-identical to the r10 in-line splitmix64 fold — existing tables'
    zone-map registers keep merging losslessly with new writes. The hex
    pins were captured from the pre-refactor code on fixed corpora."""
    pins = {
        "ints": (pa.array(list(range(1000)) + [None, 7, 7],
                          type=pa.int64()), pa.int64(),
                 "040403060504010302030202040302020003040503050103020201"),
        "floats": (pa.array([float(x) / 3.0 for x in range(500)] + [None],
                            type=pa.float64()), pa.float64(),
                   "010204010303030002030804030308050101050201020002010302"),
        "bools": (pa.array([True, False, None, True]), pa.bool_(),
                  "000000000000000000000000000000000000000000000000000000"),
    }
    for name, (col, t, prefix) in pins.items():
        regs = np.zeros(256, np.uint8)
        _hll_numeric_update(regs, col, t)
        assert regs.tobytes().hex().startswith(prefix), name
    # full pin for the bool corpus (tiny): only two registers set
    regs = np.zeros(256, np.uint8)
    _hll_numeric_update(regs, pins["bools"][0], pa.bool_())
    nz = {i: int(r) for i, r in enumerate(regs) if r}
    assert nz == {145: 5, 226: 3}


def test_string_hash_vectorized_properties():
    """hash64_strings: stable across calls and chunk layouts, respects
    slices, distinguishes permutations/case/length, empty string is a
    value (not a skip), and NO per-value Python in the hot path (the
    function never calls to_pylist/as_py)."""
    vals = ["", "a", "b", "ab", "ba", "A", "hello world",
            "hello worle", "x" * 5000, "x" * 5001, "αβγ", "βαγ", "end", ""]
    h1 = ndv.hash64_strings(pa.array(vals, type=pa.string()))
    h2 = ndv.hash64_strings(pa.array(vals, type=pa.large_string()))
    assert np.array_equal(h1, h2)  # layout-independent
    # trailing "" (hypothesis-found: reduceat index == len(terms)) must
    # hash like any other empty string, and never drop the previous
    # segment's last byte
    assert h1[-1] == h1[0]
    assert len(set(h1.tolist())) == len(vals) - 1  # one dup: the two ""s
    # sliced array (nonzero offset) hashes the same values
    arr = pa.array(["pad1", "pad2"] + vals)
    h3 = ndv.hash64_strings(arr.slice(2))
    assert np.array_equal(h3, h1)
    # chunked input
    ch = pa.chunked_array([vals[:5], vals[5:]])
    assert np.array_equal(ndv.hash64_strings(ch), h1)
    import inspect

    src = inspect.getsource(ndv.hash64_strings)
    assert "to_pylist" not in src and "as_py" not in src


def test_string_ndv_accuracy_and_lossless_union():
    """String registers estimate NDV within the p=8 error bars, and the
    union of per-chunk registers equals the one-pass registers."""
    corpus = [f"user-{i % 700}@example.com" for i in range(5000)]
    one = np.zeros(256, np.uint8)
    _hll_string_update(one, pa.array(corpus))
    est = hll_ndv_from_hex([one.tobytes().hex()])
    assert abs(est - 700) <= 700 * 0.15
    parts = []
    for lo in range(0, 5000, 1250):
        regs = np.zeros(256, np.uint8)
        _hll_string_update(regs, pa.array(corpus[lo:lo + 1250]))
        parts.append(regs.tobytes().hex())
    assert hll_ndv_from_hex(parts) == est  # lossless register union


def test_native_sidecar_hll_matches_family():
    """Native _hll_hex and the own-format fold are ONE hash family: the
    same logical values produce identical registers on both planes (so a
    cross-plane comparison of NDV estimates agrees exactly)."""
    ints = list(range(1234))
    regs = np.zeros(256, np.uint8)
    _hll_numeric_update(regs, pa.array(ints, type=pa.int64()), pa.int64())
    assert _hll_hex("int64", ints) == regs.tobytes().hex()

    strs = [f"s{i}" for i in range(321)]
    regs2 = np.zeros(256, np.uint8)
    _hll_string_update(regs2, pa.array(strs))
    assert _hll_hex("string", strs) == regs2.tobytes().hex()

    floats = [i / 7.0 for i in range(500)]
    regs3 = np.zeros(256, np.uint8)
    _hll_numeric_update(
        regs3, pa.array(floats, type=pa.float64()), pa.float64())
    assert _hll_hex("double", floats) == regs3.tobytes().hex()


def test_native_string_ndv_in_show_stats_sidecar(tmp_path):
    """Native sidecars now carry string registers under the v2 layout;
    a v1-layout sidecar (old hash family) is ignored wholesale."""
    import json
    import os

    from lance_trino_spark.format import lance_native as ln

    root = str(tmp_path / "t.lance")
    ln.write_native_dataset(root, {
        "k": list(range(400)),
        "tag": [f"t{i % 11}" for i in range(400)]})
    sdir = os.path.join(root, ln.FRAGSTATS_DIR)
    fn = [n for n in os.listdir(sdir) if n.endswith(".json")][0]
    st = json.load(open(os.path.join(sdir, fn)))
    assert st["layout"] == "lance-repo:fragstats=minmax-v2"
    by_name = {f.name: f for f in ln.read_native_manifest(
        root).top_level_fields()}
    tag_ent = st["fields"][str(by_name["tag"].id)]
    assert "hll" in tag_ent
    # linear counting at tiny cardinality: two values sharing a bucket
    # round the estimate down by one — tolerance, not exactness
    assert abs(hll_ndv_from_hex([tag_ent["hll"]]) - 11) <= 1
    # v1 layout (old family) refuses to serve
    st["layout"] = "lance-repo:fragstats=minmax-v1"
    json.dump(st, open(os.path.join(sdir, fn), "w"))
    assert ln.load_file_stats(root, fn[:-len(".json")]) is None
