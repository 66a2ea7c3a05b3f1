"""Vector column table property: FixedSizeList dimension enforcement."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lance_trino_spark.format.dataset import LanceDataset
from lance_trino_spark.format.vector import parse_vector_columns


@pytest.fixture(scope="module")
def scratch_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("vector"))


def _vec_df(spark, dim=4, n=50):
    return spark.range(0, n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (F.col("id") + i).cast("float"),
        ).alias("embedding"),
    )


def test_parse_spec():
    assert parse_vector_columns("embedding:64") == {"embedding": 64}
    assert parse_vector_columns("a:8, b:16") == {"a": 8, "b": 16}
    with pytest.raises(ValueError):
        parse_vector_columns("embedding:-1")
    with pytest.raises(ValueError):
        parse_vector_columns("embedding")


def test_vector_roundtrip(spark, scratch_dir):
    path = os.path.join(scratch_dir, "vec_ok.lance")
    ds = LanceDataset.create(
        path, _vec_df(spark), properties={"vector_columns": "embedding:4"}
    )
    assert ds.manifest.properties["vector_columns"] == "embedding:4"
    rows = ds.to_df(spark).collect()
    assert len(rows) == 50
    assert all(len(r["embedding"]) == 4 for r in rows)


def test_vector_wrong_dim_fails_write(spark, scratch_dir):
    path = os.path.join(scratch_dir, "vec_bad.lance")
    with pytest.raises(Exception, match="dimension 8"):
        LanceDataset.create(
            path, _vec_df(spark, dim=4),
            properties={"vector_columns": "embedding:8"},
        )


def test_vector_wrong_type_rejected(spark, scratch_dir):
    path = os.path.join(scratch_dir, "vec_type.lance")
    df = spark.range(0, 5).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1), F.lit(2)).alias("embedding"),  # array<int>
    )
    with pytest.raises(ValueError, match="array<float>"):
        LanceDataset.create(
            path, df, properties={"vector_columns": "embedding:2"}
        )


def test_vector_append_enforced(spark, scratch_dir):
    path = os.path.join(scratch_dir, "vec_append.lance")
    ds = LanceDataset.create(
        path, _vec_df(spark), properties={"vector_columns": "embedding:4"}
    )
    ds = ds.append(_vec_df(spark, n=10))
    assert ds.count_rows() == 60
    with pytest.raises(Exception, match="dimension 4"):
        ds.append(_vec_df(spark, dim=3, n=5))


def test_mmr_topk_matches_numpy_reference(spark):
    """mmr_topk's distributed two-stage plan (exact top-pool, per-query
    Arrow-batched MMR) must reproduce a straight numpy MMR over the full
    corpus exactly — same selections, same order — and actually diversify
    (the MMR set's max pairwise cosine must not exceed the plain top-k
    set's)."""
    import numpy as np

    from lance_trino_spark.operators.similarity import cosine_topk, mmr_topk

    rng = np.random.default_rng(11)
    n, dim, k, pool, lam = 80, 12, 6, 30, 0.7
    base = rng.normal(size=(n // 4, dim))
    # clustered corpus: near-duplicate groups make diversity measurable
    vecs = np.concatenate([
        base + rng.normal(0, 0.05, size=(n // 4, dim)) for _ in range(4)
    ])
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    queries = corpus.filter("vec_id < 3")
    got = {
        (r.query_id, r.mmr_rank): r.neighbor_id
        for r in mmr_topk(corpus, queries, k=k, pool=pool, lam=lam).collect()
    }

    unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    for q in range(3):
        sims = unit @ unit[q]
        cand = np.lexsort((np.arange(n), -sims))
        cand = [c for c in cand if c != q][:pool]
        rel = sims[np.array(cand)]
        ids = np.array(cand)
        selected = [0]
        max_sim = unit[ids] @ unit[ids[0]]
        while len(selected) < k:
            score = lam * rel - (1 - lam) * max_sim
            score[selected] = -np.inf
            best = int(np.lexsort((ids, -score))[0])
            selected.append(best)
            max_sim = np.maximum(max_sim, unit[ids] @ unit[ids[best]])
        expect = ids[selected]
        for rank, nid in enumerate(expect, start=1):
            assert got[(q, rank)] == nid, (q, rank, got[(q, rank)], nid)
        # diversity: MMR's max pairwise sim <= plain top-k's
        plain = ids[:k]
        def max_pair(sel):
            u = unit[np.array(sel)]
            s = u @ u.T
            np.fill_diagonal(s, -1)
            return s.max()
        assert max_pair(expect) <= max_pair(plain) + 1e-12


def test_kmeans_lattice_matches_integer_reference(spark):
    """kmeans_lattice's distributed Lloyd pass (literal-array assignment,
    map-side-combinable per-dim sum update, round-half-up integer
    centroid division) must reproduce a straight integer-arithmetic
    numpy reference exactly — assignments AND distances — because every
    step is exact lattice math with no float summation order."""
    import numpy as np

    from lance_trino_spark.operators.similarity import kmeans_lattice

    rng = np.random.default_rng(7)
    n, dim, k, iters, scale, offset = 120, 8, 4, 2, 1000, 2000
    vecs = rng.normal(0, 0.4, size=(n, dim))
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.vec_id: (r.cid, r.dist)
        for r in kmeans_lattice(
            corpus, k=k, iters=iters, dim=dim,
            scale=scale, offset=offset).collect()
    }

    q = np.floor(vecs * scale + 0.5).astype(np.int64) + offset
    cents = q[:k].copy()
    for _ in range(iters):
        d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)  # np argmin breaks ties on first == min cid
        new = []
        for c in sorted(set(assign.tolist())):
            members = q[assign == c]
            s, cnt = members.sum(0), len(members)
            new.append((2 * s + cnt) // (2 * cnt))
        cents = np.array(new, dtype=np.int64)
    d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    # cid space may have been renumbered by dropped-empty compaction in
    # the reference loop only when a cluster empties; with this seed all
    # k survive — assert that premise so the comparison stays honest
    assert cents.shape[0] == k
    ref_assign, ref_dist = d.argmin(1), d.min(1)
    for i in range(n):
        assert got[i] == (int(ref_assign[i]), int(ref_dist[i])), i

    with pytest.raises(ValueError, match="fewer than k"):
        kmeans_lattice(corpus.limit(2), k=4, dim=dim)
    with pytest.raises(ValueError, match="dimensional"):
        kmeans_lattice(corpus, k=4, dim=dim + 1)


def test_kmeans_lattice_refuses_ivf_scale_k(spark):
    """kmeans_lattice compiles k*dim centroid literals into the plan;
    IVF-scale k must refuse loudly (pointing at train_ivf_centroids)
    instead of exploding the Catalyst plan."""
    import pytest

    from lance_trino_spark.operators.similarity import kmeans_lattice

    df = spark.range(10).selectExpr(
        "id AS vec_id", "array(CAST(id AS float)) AS embedding")
    with pytest.raises(ValueError, match="train_ivf_centroids"):
        kmeans_lattice(df, k=2000, dim=64)
