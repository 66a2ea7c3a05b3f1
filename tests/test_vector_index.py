"""Persisted IVF vector index (format/vector_index.py): build, search,
recall vs the exact baseline, deletion masking, PQ parity, maintenance
rebuild after compaction, bounded index IO, and the SQL DDL route."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
SCRATCH = os.path.join(os.path.dirname(__file__), os.pardir, ".scratch")


def _fresh(name: str) -> str:
    path = os.path.abspath(os.path.join(SCRATCH, f"test-{name}.lance"))
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    return path


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))


@pytest.fixture(scope="module")
def indexed(spark, emb):
    from lance_trino_spark.format.dataset import LanceDataset

    path = _fresh("vidx")
    ds = LanceDataset.create(
        path,
        emb.select("vec_id", "label", "embedding").orderBy("vec_id").coalesce(1),
        max_rows_per_file=150,
    )
    return ds.create_vector_index(spark, "embedding", n_cells=16, sample=2048)


def _exact_topk(spark, emb, n_queries=8, k=5):
    from lance_trino_spark.operators.similarity import cosine_topk

    q = emb.filter(F.col("vec_id") < n_queries)
    return {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, q, k=k).collect()
    }


def _search_pairs(spark, ds, emb, n_queries=8, k=5, **kw):
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hits = ds.vector_search(
        spark, "embedding", q, k=k + 1, nprobe=2, id_columns=["vec_id"], **kw
    )
    out = {}
    rows = [r for r in hits.collect() if r["vec_id"] != r["query_id"]]
    rows.sort(key=lambda r: (r["query_id"], -r["cosine"], r["vec_id"]))
    for r in rows:
        out.setdefault(r["query_id"], [])
        if len(out[r["query_id"]]) < k:
            out[r["query_id"]].append(r["vec_id"])
    return {(qid, n) for qid, ns in out.items() for n in ns}


def test_layout_on_disk(indexed):
    root = indexed.path
    assert os.path.exists(os.path.join(root, "_indices/embedding.ivf/index.json"))
    assert os.path.exists(
        os.path.join(root, "_indices/embedding.ivf/centroids.parquet")
    )
    frags_dir = os.path.join(root, "_indices/embedding.ivf/frags")
    assert len(os.listdir(frags_dir)) == len(indexed.manifest.fragments)
    assert "embedding" in indexed.manifest.properties["vector_indexes"]


def test_recall_vs_exact(spark, emb, indexed):
    exact = _exact_topk(spark, emb)
    ann = _search_pairs(spark, indexed, emb)
    recall = len(ann & exact) / len(exact)
    assert recall >= 0.6, recall


def test_pq_matches_flat_after_refine(spark, emb):
    from lance_trino_spark.format.dataset import LanceDataset

    path = _fresh("vidx-pq")
    ds = LanceDataset.create(
        path,
        emb.select("vec_id", "embedding").orderBy("vec_id").coalesce(1),
        max_rows_per_file=200,
    )
    flat = ds.create_vector_index(spark, "embedding", n_cells=16, sample=2048)
    flat_pairs = _search_pairs(spark, flat, emb)
    pq = flat.create_vector_index(
        spark, "embedding", n_cells=16, sample=2048,
        index_type="IVF_PQ", pq_m=8,
    )
    # refine re-scores the ADC shortlist exactly, so with a generous
    # shortlist PQ converges to the FLAT result
    pq_pairs = _search_pairs(spark, pq, emb, refine=100)
    assert len(pq_pairs & flat_pairs) / len(flat_pairs) >= 0.9


def test_deletion_masks_neighbors(spark, emb, indexed):
    from lance_trino_spark.operators.dml import delete

    # vec 0's top neighbor at k=1 (excluding self)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    before = indexed.vector_search(
        spark, "embedding", q, k=2, nprobe=2, id_columns=["vec_id"]
    ).collect()
    top = [r["vec_id"] for r in before if r["vec_id"] != 0][0]
    after_ds = delete(indexed, spark, F.col("vec_id") == top)
    after = after_ds.vector_search(
        spark, "embedding", q, k=2, nprobe=2, id_columns=["vec_id"]
    ).collect()
    assert top not in {r["vec_id"] for r in after}


def test_bounded_postings_io(spark, emb, indexed):
    q = emb.filter(F.col("vec_id") == 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hits = indexed.vector_search(
        spark, "embedding", q, k=5, nprobe=2, id_columns=["vec_id"],
        with_io_stats=True,
    ).collect()
    total = sum(f.physical_rows for f in indexed.manifest.fragments)
    # one query probing 2/16 cells must not decode anywhere near the corpus
    by_frag = {r["postings_read"] for r in hits}
    assert sum(by_frag) < total / 2


def test_compaction_rebuilds_postings(spark, emb):
    from lance_trino_spark.format.dataset import LanceDataset
    from lance_trino_spark.format.vector_index import postings_rel

    path = _fresh("vidx-compact")
    ds = LanceDataset.create(
        path,
        emb.select("vec_id", "embedding").orderBy("vec_id").coalesce(1),
        max_rows_per_file=100,
    )
    ds = ds.create_vector_index(spark, "embedding", n_cells=8, sample=512)
    out = ds.compact(spark, target_rows_per_file=1000)
    assert len(out.manifest.fragments) < len(ds.manifest.fragments)
    for f in out.manifest.fragments:
        assert os.path.exists(os.path.join(path, postings_rel("embedding", f.path)))
    # index survives the rewrite: search still agrees with exact baseline
    exact = _exact_topk(spark, emb, n_queries=4)
    ann = _search_pairs(spark, out, emb, n_queries=4)
    assert len(ann & exact) / len(exact) >= 0.6


def test_query_cap_fails_loudly(spark, emb, indexed):
    q = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError, match="max_queries"):
        indexed.vector_search(
            spark, "embedding", q, k=5, id_columns=["vec_id"], max_queries=10
        )


def test_sql_create_vector_index_route(spark, emb):
    from lance_trino_spark.catalog import LanceCatalog

    root = os.path.abspath(os.path.join(SCRATCH, "test-vidx-cat"))
    shutil.rmtree(root, ignore_errors=True)
    cat = LanceCatalog(spark, root)
    cat.sql("CREATE SCHEMA vx")
    emb.select("vec_id", "embedding").limit(200).createOrReplaceTempView(
        "_vidx_src"
    )
    cat.sql("CREATE TABLE vx.e AS SELECT * FROM _vidx_src")
    status = cat.sql(
        "CREATE VECTOR INDEX ON vx.e (embedding) USING IVF_FLAT "
        "WITH (n_cells = 8)"
    ).collect()
    assert "vector-indexed" in status[0][0]
    ds = cat.load("vx", "e")
    assert ds.manifest.properties["vector_indexes"]["embedding"]["n_cells"] == 8


def test_sql_vector_search_route(spark, emb):
    from lance_trino_spark.catalog import LanceCatalog

    root = os.path.abspath(os.path.join(SCRATCH, "test-vsearch-cat"))
    shutil.rmtree(root, ignore_errors=True)
    cat = LanceCatalog(spark, root)
    cat.sql("CREATE SCHEMA vq")
    emb.select("vec_id", "embedding").limit(300).createOrReplaceTempView(
        "_vsearch_src"
    )
    cat.sql("CREATE TABLE vq.c AS SELECT * FROM _vsearch_src")
    cat.sql(
        "CREATE TABLE vq.q AS SELECT vec_id AS query_id, embedding "
        "FROM _vsearch_src WHERE vec_id < 5"
    )
    # searching before the index exists fails loudly
    with pytest.raises(ValueError, match="no vector index"):
        cat.sql("VECTOR SEARCH vq.c (embedding) USING vq.q TOP 3")
    cat.sql("CREATE VECTOR INDEX ON vq.c (embedding) WITH (n_cells = 8)")
    hits = cat.sql(
        "VECTOR SEARCH vq.c (embedding) USING vq.q TOP 3 NPROBE 2"
    ).collect()
    assert len(hits) == 15
    by_q = {}
    for r in hits:
        by_q.setdefault(r["query_id"], []).append(r)
    # top-1 is always the query vector itself
    for qid, rows in by_q.items():
        best = max(rows, key=lambda r: r["cosine"])
        assert best["vec_id"] == qid


def test_filtered_search_prefilter_semantics(spark, emb):
    from lance_trino_spark.format.dataset import LanceDataset
    from lance_trino_spark.operators.similarity import cosine_topk

    path = _fresh("vidx-filter")
    ds = LanceDataset.create(
        path,
        emb.select("vec_id", "label", "embedding").orderBy("vec_id").coalesce(1),
        max_rows_per_file=150,
    )
    ds = ds.create_scalar_index(spark, "label")
    ds = ds.create_vector_index(spark, "embedding", n_cells=16, sample=2048)
    q = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hits = ds.vector_search(
        spark, "embedding", q, k=4, nprobe=2,
        id_columns=["vec_id", "label"], prefilter=("label", [2]),
    ).collect()
    # every result passes the predicate
    assert hits and all(r["label"] == 2 for r in hits)
    # prefilter recall: agree with the exact top-k over the label-2 subset
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(
            emb.filter(F.col("label") == 2),
            emb.filter(F.col("vec_id") < 6), k=4,
        ).collect()
    }
    got = {(r["query_id"], r["vec_id"]) for r in hits}
    assert len(got & exact) / len(exact) >= 0.5
    # a filter on a column with NO scalar index falls back and still works
    hits2 = ds.vector_search(
        spark, "embedding", q, k=2, nprobe=2,
        id_columns=["vec_id", "label"], prefilter=("vec_id", [10, 20, 30]),
    ).collect()
    assert hits2 and all(r["vec_id"] in (10, 20, 30) for r in hits2)
    with pytest.raises(ValueError, match="no such prefilter column"):
        ds.vector_search(
            spark, "embedding", q, k=2, id_columns=["vec_id"],
            prefilter=("nope", [1]),
        )


def test_drop_indexes_and_vacuum_reclaims_orphans(spark, emb):
    from lance_trino_spark.catalog import LanceCatalog
    from lance_trino_spark.format.dataset import LanceDataset

    root = os.path.abspath(os.path.join(SCRATCH, "test-dropidx-cat"))
    shutil.rmtree(root, ignore_errors=True)
    cat = LanceCatalog(spark, root)
    cat.sql("CREATE SCHEMA di")
    emb.select("vec_id", "label", "embedding").limit(300).createOrReplaceTempView(
        "_dropidx_src"
    )
    cat.sql("CREATE TABLE di.t AS SELECT * FROM _dropidx_src")
    cat.sql("CREATE INDEX ON di.t (label)")
    cat.sql("CREATE VECTOR INDEX ON di.t (embedding) WITH (n_cells = 8)")
    tpath = cat.table_path("di", "t")
    assert os.path.isdir(os.path.join(tpath, "_indices/label"))
    assert os.path.isdir(os.path.join(tpath, "_indices/embedding.ivf"))
    assert "dropped index" in cat.sql(
        "DROP INDEX ON di.t (label)"
    ).collect()[0][0]
    assert not os.path.isdir(os.path.join(tpath, "_indices/label"))
    assert "dropped vector index" in cat.sql(
        "DROP VECTOR INDEX ON di.t (embedding)"
    ).collect()[0][0]
    assert not os.path.isdir(os.path.join(tpath, "_indices/embedding.ivf"))
    # negative: double drop fails loudly
    import pytest as _pt
    with _pt.raises(ValueError, match="no scalar index"):
        cat.sql("DROP INDEX ON di.t (label)")

    # orphan reclamation: compaction rewrites data files; the OLD files'
    # sidecars become orphans once vacuum drops the old versions
    ds = cat.load("di", "t")
    ds = ds.create_vector_index(spark, "embedding", n_cells=8, sample=256)
    old_postings = set(
        os.listdir(os.path.join(tpath, "_indices/embedding.ivf/frags"))
    )
    ds.compact(spark, target_rows_per_file=1000, sort_by="vec_id")  # rewrites all
    out = LanceDataset.vacuum(tpath, keep_versions=1)
    left = set(
        os.listdir(os.path.join(tpath, "_indices/embedding.ivf/frags"))
    )
    assert not (left & old_postings)  # orphaned postings reclaimed
    assert out["removed_files"] > 0
    # index still serves after compact+vacuum
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hits = LanceDataset.open(tpath).vector_search(
        spark, "embedding", q, k=1, id_columns=["vec_id"]
    ).collect()
    assert {r["vec_id"] for r in hits} == {0, 1, 2}


def test_hnsw_build_search_and_lifecycle(spark, emb):
    from lance_trino_spark.catalog import LanceCatalog
    from lance_trino_spark.format.dataset import LanceDataset
    from lance_trino_spark.operators.dml import delete

    path = _fresh("hnsw")
    ds = LanceDataset.create(
        path,
        emb.select("vec_id", "label", "embedding").orderBy("vec_id").coalesce(1),
        max_rows_per_file=150,
    )
    ds = ds.create_vector_index(
        spark, "embedding", index_type="HNSW", hnsw_m=8,
        hnsw_ef_construction=48,
    )
    assert ds.manifest.properties["vector_indexes"]["embedding"][
        "index_type"] == "HNSW"
    exact = _exact_topk(spark, emb)
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hits = ds.vector_search(
        spark, "embedding", q, k=6, id_columns=["vec_id"]
    ).collect()
    ann = {}
    for r in sorted(hits, key=lambda r: (r["query_id"], -r["cosine"], r["vec_id"])):
        if r["vec_id"] != r["query_id"]:
            ann.setdefault(r["query_id"], [])
            if len(ann[r["query_id"]]) < 5:
                ann[r["query_id"]].append(r["vec_id"])
    pairs = {(qk, n) for qk, ns in ann.items() for n in ns}
    assert len(pairs & exact) / len(exact) >= 0.6
    # deterministic across runs
    hits2 = ds.vector_search(
        spark, "embedding", q, k=6, id_columns=["vec_id"]
    ).collect()
    assert sorted(map(tuple, hits)) == sorted(map(tuple, hits2))
    # deletion masking: the deleted node routes but never lands in results
    top = ann[0][0]
    after = delete(ds, spark, F.col("vec_id") == top)
    hits3 = after.vector_search(
        spark, "embedding",
        emb.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        k=3, id_columns=["vec_id"],
    ).collect()
    assert top not in {r["vec_id"] for r in hits3}
    # prefilter composes with the graph search
    hf = after.vector_search(
        spark, "embedding", q, k=3, id_columns=["vec_id", "label"],
        prefilter=("label", [1]),
    ).collect()
    assert hf and all(r["label"] == 1 for r in hf)
    # compaction rebuild from the registered meta (no codebooks needed)
    out = after.compact(spark, target_rows_per_file=2000, sort_by="vec_id")
    from lance_trino_spark.format.vector_index import hnsw_shard_files

    for f in out.manifest.fragments:
        assert hnsw_shard_files(path, "embedding", f.path)
    # drop removes the graph dir
    dropped = out.drop_vector_index(spark, "embedding")
    assert not os.path.isdir(os.path.join(path, "_indices/embedding.hnsw"))
    assert "embedding" not in dropped.manifest.properties["vector_indexes"]


def test_hnsw_sql_route(spark, emb):
    from lance_trino_spark.catalog import LanceCatalog

    root = os.path.abspath(os.path.join(SCRATCH, "test-hnsw-cat"))
    shutil.rmtree(root, ignore_errors=True)
    cat = LanceCatalog(spark, root)
    cat.sql("CREATE SCHEMA h")
    emb.select("vec_id", "embedding").limit(200).createOrReplaceTempView(
        "_hnsw_src"
    )
    cat.sql("CREATE TABLE h.c AS SELECT * FROM _hnsw_src")
    cat.sql(
        "CREATE TABLE h.q AS SELECT vec_id AS query_id, embedding "
        "FROM _hnsw_src WHERE vec_id < 3"
    )
    status = cat.sql("CREATE VECTOR INDEX ON h.c (embedding) USING HNSW")
    assert "HNSW" in status.collect()[0][0]
    hits = cat.sql(
        "VECTOR SEARCH h.c (embedding) USING h.q TOP 1"
    ).collect()
    assert {r["vec_id"] for r in hits} == {0, 1, 2}  # top-1 self-match


def test_null_vectors_are_unindexed_not_fatal(spark, emb):
    """NULL embeddings are legal (enforce_vector_columns allows them): the
    index build must skip them — keeping ORIGINAL row indices for the
    non-null rows — and searches must never return a null-vector row.
    Regression: np.array over a pylist with None raised 'inhomogeneous
    shape' and broke create_vector_index / maintain_indexes entirely."""
    from lance_trino_spark.format.dataset import LanceDataset

    src = emb.select(
        "vec_id",
        "label",
        F.when(F.col("vec_id") % 7 == 3, None)
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    ).orderBy("vec_id").coalesce(1)
    nulls = {r["vec_id"] for r in src.filter(F.col("embedding").isNull())
             .select("vec_id").collect()}
    assert nulls  # fixture really has null rows

    for itype in ("IVF_FLAT", "HNSW"):
        path = _fresh(f"vidx-nulls-{itype.lower()}")
        ds = LanceDataset.create(path, src, max_rows_per_file=150)
        ds = (
            ds.create_vector_index(spark, "embedding", index_type="HNSW",
                                   hnsw_m=8, hnsw_ef_construction=48)
            if itype == "HNSW"
            else ds.create_vector_index(spark, "embedding", n_cells=8,
                                        sample=2048)
        )
        q = emb.filter(F.col("vec_id") < 6).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        hits = ds.vector_search(
            spark, "embedding", q, k=5, nprobe=4, id_columns=["vec_id"]
        ).collect()
        assert hits, itype
        assert not ({r["vec_id"] for r in hits} & nulls), itype
        # incremental maintenance over a null-bearing append also survives
        extra = src.filter(F.col("vec_id") < 20)
        ds2 = ds.append(extra, maintain_indexes=True, spark=spark)
        assert ds2.count_rows() == ds.count_rows() + extra.count()


def test_hnsw_selective_prefilter_returns_k(spark, emb):
    """A selective prefilter must not starve the beam: the allowed-only
    result beam (plus the exact fallback for tiny allowed sets) returns
    the true top-k over the filtered population."""
    from lance_trino_spark.format.dataset import LanceDataset
    from lance_trino_spark.operators.similarity import cosine_topk

    path = _fresh("hnsw-selective")
    ds = LanceDataset.create(
        path,
        emb.select("vec_id", "label", "embedding").orderBy("vec_id").coalesce(1),
        max_rows_per_file=150,
    )
    ds = ds.create_vector_index(
        spark, "embedding", index_type="HNSW", hnsw_m=8,
        hnsw_ef_construction=48,
    )
    # ~1/30 of rows allowed — far fewer than ef_search per fragment;
    # offset 7 keeps query ids (<5) out so no self-match asymmetry vs
    # cosine_topk (which excludes self; vector_search does not)
    allowed = [int(v * 30 + 7) for v in range(40)]
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hits = ds.vector_search(
        spark, "embedding", q, k=3, id_columns=["vec_id"],
        prefilter=("vec_id", allowed),
    ).collect()
    per_q = {}
    for r in hits:
        per_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert set(per_q) == {0, 1, 2, 3, 4}
    assert all(len(v) == 3 for v in per_q.values())
    assert all(v in allowed for vs in per_q.values() for v in vs)
    # exact over the allowed subset agrees (fallback is exact per fragment,
    # so global top-3 must match the brute-force answer exactly)
    exact = cosine_topk(
        emb.filter(F.col("vec_id").isin(allowed)),
        emb.filter(F.col("vec_id") < 5), k=3,
    ).collect()
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
    got_pairs = {(qk, v) for qk, vs in per_q.items() for v in vs}
    assert got_pairs == exact_pairs


def test_hnsw_sharded_build_and_merge(spark, emb, monkeypatch):
    """Shards are the HNSW scale unit (graph insertion is sequential per
    graph): with a shard size smaller than the fragment, the build writes
    one .sK-of-N graph per row range, searches merge across shards with
    recall equal to the single-graph build, and maintenance rebuilds only
    absent shards. An incomplete shard set counts as unindexed."""
    import glob

    import lance_trino_spark.format.vector_index as VI
    from lance_trino_spark.format.dataset import LanceDataset
    from lance_trino_spark.format.vector_index import hnsw_shard_files

    monkeypatch.setattr(VI, "HNSW_SHARD_ROWS", 64)
    path = _fresh("hnsw-shards")
    ds = LanceDataset.create(
        path,
        emb.select("vec_id", "label", "embedding").orderBy("vec_id").coalesce(1),
        max_rows_per_file=150,
    )
    ds = ds.create_vector_index(
        spark, "embedding", index_type="HNSW", hnsw_m=8,
        hnsw_ef_construction=48,
    )
    # every fragment produced ceil(150/64) = 3 shard files
    for f in ds.manifest.fragments:
        files = hnsw_shard_files(path, "embedding", f.path)
        expect = -(-f.physical_rows // 64)
        assert len(files) == expect
        assert all("-of-%04d" % expect in p for p in files)
    exact = _exact_topk(spark, emb)
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hits = ds.vector_search(
        spark, "embedding", q, k=6, id_columns=["vec_id"]
    ).collect()
    ann = {}
    for r in sorted(hits, key=lambda r: (r["query_id"], -r["cosine"], r["vec_id"])):
        if r["vec_id"] != r["query_id"]:
            ann.setdefault(r["query_id"], [])
            if len(ann[r["query_id"]]) < 5:
                ann[r["query_id"]].append(r["vec_id"])
    pairs = {(qk, n) for qk, ns in ann.items() for n in ns}
    # small shard graphs searched exhaustively-ish: recall should be HIGH
    assert len(pairs & exact) / len(exact) >= 0.7
    # torn shard set = unindexed (never silently search half a fragment)
    f0 = ds.manifest.fragments[0]
    victim = hnsw_shard_files(path, "embedding", f0.path)[1]
    os.unlink(victim)
    assert hnsw_shard_files(path, "embedding", f0.path) == []
    # maintenance rebuilds ONLY the missing shard
    before = set(glob.glob(os.path.join(path, "_indices/embedding.hnsw/*")))
    n_built = ds.ensure_vector_index_files(spark)
    assert n_built == 1
    assert os.path.exists(victim)
    after_files = set(glob.glob(os.path.join(path, "_indices/embedding.hnsw/*")))
    assert after_files == before | {victim}


def test_hnsw_exact_duplicate_short_circuit(spark):
    """Byte-identical twins are findable WITHOUT graph routing (the
    fingerprint join): on a duplicate-dense corpus, every exact copy of
    the query vector must appear in the top-k even at a degenerate beam
    width — the inherent HNSW stranding mode the sf1 sweep measured
    (1-2/15 self-match misses at ef_search=256) can no longer hide a
    byte-equal duplicate."""
    import numpy as np

    from lance_trino_spark.format.dataset import LanceDataset

    rng = np.random.default_rng(11)
    n, dim, copies = 600, 16, 24
    base = rng.normal(size=(n, dim)).astype(np.float32)
    twin = rng.normal(size=dim).astype(np.float32)
    rows = []
    twin_ids = set()
    for i in range(n):
        if i % (n // copies) == 0 and len(twin_ids) < copies:
            rows.append((i, [float(x) for x in twin]))
            twin_ids.add(i)
        else:
            rows.append((i, [float(x) for x in base[i]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = _fresh("hnsw-dup")
    ds = LanceDataset.create(path, df.coalesce(1))
    # tiny beam: routing alone cannot collect two dozen scattered twins
    ds = ds.create_vector_index(
        spark, "embedding", index_type="HNSW", hnsw_m=4,
        hnsw_ef_construction=16,
    )
    q = df.filter(F.col("vec_id") == min(twin_ids)).select(
        F.col("vec_id").alias("query_id"), "embedding")
    hits = ds.vector_search(
        spark, "embedding", q, k=copies, id_columns=["vec_id"],
        ef_search=4,
    ).collect()
    got = {r["vec_id"] for r in hits}
    assert got == twin_ids  # every byte-identical copy surfaced
    assert all(abs(r["cosine"] - 1.0) < 1e-6 for r in hits)
