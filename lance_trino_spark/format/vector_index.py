"""Persisted IVF vector-index sidecars — the Lance vector-index analogue.

Lance's flagship capability is persisted ANN indexes (IVF_FLAT / IVF_PQ)
stored under `_indices/` and opened through the session index cache the
reference sizes explicitly (`docs/src/performance.md:21-58` "Index Cache:
Caches opened vector indices"; fixture `example_db/test_table4.lance/
_indices/`). The reference connector consumes those indexes below its scan;
this module re-expresses them Spark-first:

    <table>.lance/_indices/<column>.ivf/
      index.json                     # {index_type, n_cells, dim, pq_m, ...}
      centroids.parquet              # coarse codebook (cell, centroid)
      pq_codebooks.parquet           # IVF_PQ only: (sub, code, centroid)
      frags/<data-file-basename>     # per-fragment postings, SORTED BY cell

Each per-fragment postings file holds `(cell, row_index, vec | pq_code)`
sorted by cell and written with small row groups, so probing `nprobe` of
`n_cells` cells is a row-group-stats-pruned read of ~nprobe/n_cells of the
index bytes — the IO shape of Lance's IVF partitions (the index stores its
own copy of the vectors/codes precisely so a probe never rescans the data
file). IVF_PQ stores 8-bit product-quantization codes (m bytes/vector
instead of 4·dim) and refines the ADC shortlist against exact vectors with
a bounded `read_rows_by_index` on the data file.

Scale shape:
  * train: driver k-means over a bounded, deterministic sample (the
    standard IVF recipe — FAISS/Lance train on samples too); cost is
    independent of corpus size.
  * build: one Spark task per fragment (mapInPandas over the fragment
    list) — each task sorts only its own fragment's assignments, no
    shuffle, exactly like the scalar-index build (`index.py`).
  * search: fragment-parallel tasks read only probed-cell row groups of
    the postings files, score locally, emit per-fragment top-k; the global
    merge is a tiny (fragments x queries x k)-row window. Deletion vectors
    mask postings at read time, so MoR deletes never resurrect neighbors.
  * maintenance: compaction writes fresh fragment files; missing postings
    are rebuilt from the PERSISTED codebooks (ensure_vector_index_files) —
    centroids are never retrained behind the user's back.
"""

from __future__ import annotations

import json
import os
import uuid

from .index import INDICES_DIR

VINDEX_PROP = "vector_indexes"  # manifest.properties: {column: meta dict}
VINDEX_ROW_GROUP = 1024


def vindex_dir(column: str) -> str:
    return os.path.join(INDICES_DIR, f"{column}.ivf")


def vindex_meta_rel(column: str) -> str:
    return os.path.join(vindex_dir(column), "index.json")


def centroids_rel(column: str) -> str:
    return os.path.join(vindex_dir(column), "centroids.parquet")


def pq_codebooks_rel(column: str) -> str:
    return os.path.join(vindex_dir(column), "pq_codebooks.parquet")


def postings_rel(column: str, frag_rel_path: str) -> str:
    return os.path.join(vindex_dir(column), "frags",
                        os.path.basename(frag_rel_path))


def _atomic_write_table(tbl, out_path: str, row_group_size: int) -> None:
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tmp = os.path.join(os.path.dirname(out_path), f".tmp-{uuid.uuid4().hex}")
    pq.write_table(tbl, tmp, row_group_size=row_group_size)
    os.replace(tmp, out_path)


def kmeans_deterministic(x, n_cells: int, iters: int):
    """Deterministic k-means: first-n init, fixed iteration count — the
    same contract as `operators/similarity.train_ivf_centroids`, shared by
    the coarse quantizer and every PQ sub-quantizer so an index built twice
    from the same sample is byte-identical."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    if len(x) < n_cells:
        raise ValueError(f"sample ({len(x)}) smaller than n_cells ({n_cells})")
    centroids = x[:n_cells].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(n_cells):
            members = x[assign == j]
            if len(members):
                centroids[j] = members.mean(0)
    return centroids


def nearest_cells(vecs, centroids, n: int = 1):
    """(len(vecs), n) int32 matrix of the n nearest centroid ids."""
    import numpy as np

    m = np.asarray(vecs, dtype=np.float64)
    d = ((m[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
    if n == 1:
        return d.argmin(1).astype("int32")[:, None]
    return np.argsort(d, axis=1)[:, :n].astype("int32")


# --------------------------------------------------------------------- train
def train_index(
    sample_vecs,
    n_cells: int,
    iters: int = 5,
    index_type: str = "IVF_FLAT",
    pq_m: int = 8,
    pq_iters: int = 5,
):
    """Driver-side training on a bounded sample. Returns
    (centroids, pq_codebooks | None); pq_codebooks has shape
    (pq_m, 256, dim/pq_m) — each sub-quantizer trained on the RESIDUAL of
    the sample to its coarse centroid, the standard IVF_PQ formulation."""
    import numpy as np

    x = np.asarray(sample_vecs, dtype=np.float64)
    centroids = kmeans_deterministic(x, n_cells, iters)
    if index_type == "IVF_FLAT":
        return centroids, None
    if index_type != "IVF_PQ":
        raise ValueError(f"unknown index_type {index_type!r}")
    dim = x.shape[1]
    if dim % pq_m:
        raise ValueError(f"dim {dim} not divisible by pq_m {pq_m}")
    sub = dim // pq_m
    resid = x - centroids[nearest_cells(x, centroids)[:, 0]]
    n_codes = min(256, len(x))
    books = np.stack([
        kmeans_deterministic(resid[:, i * sub:(i + 1) * sub], n_codes, pq_iters)
        for i in range(pq_m)
    ])
    return centroids, books


def write_index_meta(
    root: str, column: str, centroids, pq_books, index_type: str
) -> dict:
    """Persist codebooks + metadata; returns the meta dict recorded in the
    manifest property (small scalars only — codebooks live in parquet)."""
    import numpy as np
    import pyarrow as pa

    n_cells, dim = centroids.shape
    _atomic_write_table(
        pa.table({
            "cell": pa.array(range(n_cells), type=pa.int32()),
            "centroid": pa.array([c.tolist() for c in centroids],
                                 type=pa.list_(pa.float64())),
        }),
        os.path.join(root, centroids_rel(column)), VINDEX_ROW_GROUP,
    )
    meta = {"index_type": index_type, "n_cells": int(n_cells),
            "dim": int(dim), "metric": "cosine"}
    if pq_books is not None:
        pq_m, n_codes, sub = pq_books.shape
        rows = [(i, j, pq_books[i, j].tolist())
                for i in range(pq_m) for j in range(n_codes)]
        _atomic_write_table(
            pa.table({
                "sub": pa.array([r[0] for r in rows], type=pa.int32()),
                "code": pa.array([r[1] for r in rows], type=pa.int32()),
                "centroid": pa.array([r[2] for r in rows],
                                     type=pa.list_(pa.float64())),
            }),
            os.path.join(root, pq_codebooks_rel(column)), VINDEX_ROW_GROUP,
        )
        meta.update(pq_m=int(pq_m), pq_codes=int(n_codes), pq_sub=int(sub))
    out = os.path.join(root, vindex_meta_rel(column))
    os.makedirs(os.path.dirname(out), exist_ok=True)
    tmp = out + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, out)
    return meta


def load_index_meta(root: str, column: str) -> dict:
    with open(os.path.join(root, vindex_meta_rel(column))) as f:
        return json.load(f)


def load_centroids(root: str, column: str):
    """(n_cells, dim) float64 matrix, row i = centroid of cell i."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(root, centroids_rel(column)))
    cells = t.column("cell").to_numpy()
    vecs = t.column("centroid").to_pylist()
    return np.stack([
        np.asarray(vecs[i], dtype=np.float64) for i in cells.argsort()
    ])


def load_pq_codebooks(root: str, column: str, meta: dict):
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(root, pq_codebooks_rel(column)))
    books = np.zeros((meta["pq_m"], meta["pq_codes"], meta["pq_sub"]))
    subs = t.column("sub").to_numpy()
    codes = t.column("code").to_numpy()
    cents = t.column("centroid").to_pylist()
    for s, c, v in zip(subs, codes, cents):
        books[s, c] = v
    return books


# --------------------------------------------------------------------- build
def build_fragment_postings(
    root: str,
    frag_rel_path: str,
    column: str,
    centroids,
    pq_books=None,
    row_group_size: int = VINDEX_ROW_GROUP,
) -> str:
    """Executor-side: one fragment's postings file — (cell, row_index,
    vec | pq_code) sorted by cell. Atomic + idempotent under task retries,
    same contract as `index.build_fragment_index`."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(os.path.join(root, frag_rel_path))
    if column not in pf.schema_arrow.names:
        # fragment predates a metadata-only ADD COLUMN — no postings; the
        # search treats absent postings as an empty cell set
        return None
    data = pq.read_table(os.path.join(root, frag_rel_path), columns=[column])
    raw = data.column(column).to_pylist()
    # NULL vectors are legal (enforce_vector_columns allows them); they are
    # simply unindexed — keep the ORIGINAL row indices for the non-null
    # rows so postings row_index still addresses the fragment file.
    row_idx = np.array(
        [i for i, v in enumerate(raw) if v is not None], dtype=np.int64
    )
    vecs = (
        np.array([np.asarray(raw[i], dtype=np.float64) for i in row_idx])
        if len(row_idx)
        else np.zeros((0, centroids.shape[1]), dtype=np.float64)
    )
    n = len(row_idx)
    if n == 0:
        cells = np.zeros(0, dtype=np.int32)
    else:
        cells = nearest_cells(vecs, centroids)[:, 0]
    order = np.argsort(cells, kind="stable")
    cols = {
        "cell": pa.array(cells[order], type=pa.int32()),
        "row_index": pa.array(row_idx[order]),
    }
    if pq_books is None:
        cols["vec"] = pa.array(
            [vecs[i].astype(np.float32).tolist() for i in order]
            if n else [],
            type=pa.list_(pa.float32()),
        )
    else:
        pq_m = pq_books.shape[0]
        sub = pq_books.shape[2]
        resid = vecs - centroids[cells] if n else vecs.reshape(0, 0)
        codes = np.zeros((n, pq_m), dtype=np.uint8)
        for i in range(pq_m):
            seg = resid[:, i * sub:(i + 1) * sub] if n else resid
            d = ((seg[:, None, :] - pq_books[i][None, :, :]) ** 2).sum(-1)
            codes[:, i] = d.argmin(1).astype(np.uint8)
        cols["pq_code"] = pa.array(
            [codes[i].tobytes() for i in order] if n else [],
            type=pa.binary(),
        )
    rel = postings_rel(column, frag_rel_path)
    _atomic_write_table(pa.table(cols), os.path.join(root, rel), row_group_size)
    return rel


# -------------------------------------------------------------------- search
def probe_postings(postings_path: str, cells):
    """Row-group-stats-pruned read of the probed cells from one postings
    file (sorted by cell, so each cell spans O(1) contiguous row groups)."""
    import pyarrow.dataset as pads

    ds = pads.dataset(postings_path, format="parquet")
    return ds.to_table(filter=pads.field("cell").isin([int(c) for c in cells]))


def search_fragment(
    root: str,
    frag_rel_path: str,
    column: str,
    centroids,
    pq_books,
    query_ids,
    query_vecs,
    query_cells,
    k: int,
    id_columns: list[str],
    deletion_indices=None,
    refine: int = 0,
    allowed_indices=None,
):
    """One fragment's local top-k per query. Returns a list of python rows
    (query_id, *id_column values, cosine, row_index) plus the count of
    postings rows actually decoded (the bounded-IO proof).

    IVF_FLAT scores exact cosine straight from the postings (the index
    carries the vectors). IVF_PQ scores by asymmetric distance (per-query
    lookup tables over the residual codebooks), keeps `refine` candidates,
    and re-scores those exactly with a bounded read of the data file."""
    import numpy as np

    from .index import read_rows_by_index

    union_cells = sorted({int(c) for row in query_cells for c in row})
    postings_path = os.path.join(root, postings_rel(column, frag_rel_path))
    if not os.path.exists(postings_path):
        # consult-if-present: fragments that predate the column (or whose
        # maintenance rebuild hasn't run) contribute no candidates
        return [], 0
    t = probe_postings(postings_path, union_cells)
    postings_read = len(t)
    if postings_read == 0:
        return [], 0
    cells = t.column("cell").to_numpy()
    row_idx = t.column("row_index").to_numpy()
    if allowed_indices is not None:
        # PREFILTER (filtered ANN): only rows passing the metadata predicate
        # compete for top-k — recall over the filtered population is the
        # same as unfiltered recall, unlike post-filtering a shortlist
        ok = np.isin(row_idx, np.asarray(allowed_indices, dtype=np.int64))
        cells, row_idx = cells[ok], row_idx[ok]
        t = t.take(np.flatnonzero(ok))
        if len(row_idx) == 0:
            return [], postings_read
    if deletion_indices is not None and len(deletion_indices):
        live = ~np.isin(row_idx, np.asarray(deletion_indices, dtype=np.int64))
        cells, row_idx = cells[live], row_idx[live]
        t = t.take(np.flatnonzero(live))
    if len(row_idx) == 0:
        return [], postings_read
    qm = np.asarray(query_vecs, dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1)
    out_rows = []

    if pq_books is None:
        vecs = np.array([np.asarray(v, np.float64)
                         for v in t.column("vec").to_pylist()])
        vn = np.linalg.norm(vecs, axis=1)
        per_query_hits = []
        for qi in range(len(qm)):
            mask = np.isin(cells, np.asarray(query_cells[qi], dtype=np.int32))
            idx = np.flatnonzero(mask)
            if not idx.size:
                per_query_hits.append((np.empty(0, np.int64), np.empty(0)))
                continue
            cos = (vecs[idx] @ qm[qi]) / (vn[idx] * qn[qi])
            top = np.argsort(-cos, kind="stable")[:k]
            per_query_hits.append((row_idx[idx[top]], cos[top]))
        need = np.unique(np.concatenate(
            [h[0] for h in per_query_hits if h[0].size] or
            [np.empty(0, np.int64)]))
    else:
        pq_m, _, sub = pq_books.shape
        codes = np.frombuffer(
            b"".join(t.column("pq_code").to_pylist()), dtype=np.uint8
        ).reshape(len(row_idx), pq_m)
        per_query_short = []
        for qi in range(len(qm)):
            mask = np.isin(cells, np.asarray(query_cells[qi], dtype=np.int32))
            idx = np.flatnonzero(mask)
            if not idx.size:
                per_query_short.append(np.empty(0, np.int64))
                continue
            # ADC: approx dot(q, v) = dot(q, centroid[cell]) + LUT over the
            # residual codes; enough to rank a shortlist for exact refine
            approx = qm[qi] @ centroids[cells[idx]].T
            for i in range(pq_m):
                lut = pq_books[i] @ qm[qi][i * sub:(i + 1) * sub]
                approx = approx + lut[codes[idx, i]]
            keep = np.argsort(-approx, kind="stable")[:max(refine, k)]
            per_query_short.append(row_idx[idx[keep]])
        need = np.unique(np.concatenate(
            [s for s in per_query_short if s.size] or [np.empty(0, np.int64)]))

    if not need.size:
        return [], postings_read
    # bounded refinement / id fetch: only the row groups holding shortlisted
    # rows are decoded from the data file
    fetch_cols = list(dict.fromkeys(list(id_columns) + [column]))
    tbl, _ = read_rows_by_index(
        os.path.join(root, frag_rel_path), need.tolist(), columns=fetch_cols
    )
    pos_of = {int(r): i for i, r in enumerate(need)}
    exact = np.array([np.asarray(v, np.float64)
                      for v in tbl.column(column).to_pylist()])
    en = np.linalg.norm(exact, axis=1)
    id_arrays = [tbl.column(c).to_pylist() for c in id_columns]

    if pq_books is None:
        for qi in range(len(qm)):
            hits_idx, hits_cos = per_query_hits[qi]
            for r, cos in zip(hits_idx, hits_cos):
                p = pos_of[int(r)]
                out_rows.append(
                    (query_ids[qi], *(a[p] for a in id_arrays),
                     float(cos), int(r))
                )
    else:
        for qi in range(len(qm)):
            short = per_query_short[qi]
            if not short.size:
                continue
            p = np.array([pos_of[int(r)] for r in short])
            cos = (exact[p] @ qm[qi]) / (en[p] * qn[qi])
            top = np.argsort(-cos, kind="stable")[:k]
            for j in top:
                out_rows.append(
                    (query_ids[qi], *(a[p[j]] for a in id_arrays),
                     float(cos[j]), int(short[j]))
                )
    return out_rows, postings_read


# --------------------------------------------------------------------- HNSW
# Per-fragment HNSW graphs — the latency-optimal ANN index family,
# complementing IVF (which is IO-optimal: it reads ~nprobe/n_cells of the
# index; HNSW loads a whole fragment's graph but computes far fewer
# distances). Deterministic construction: insertion in row order, levels
# from a hash-derived uniform (no RNG), greedy+beam search identical on
# every run — so recall gates replay exactly. The sidecar serializes graph
# + float32 vectors per fragment; search is fragment-parallel with a tiny
# global top-k merge, the disk-ANN-style sharded-graph layout.

HNSW_M = 8           # neighbors per node per level
HNSW_EF_CONSTRUCTION = 64
HNSW_EF_SEARCH = 48


def _hash_uniform(i: int) -> float:
    """Deterministic pseudo-uniform in (0, 1) from a row index (md5-based,
    same provenance as h32) — replaces HNSW's RNG level draw."""
    import hashlib

    h = int(hashlib.md5(f"hnsw:{i}".encode()).hexdigest()[:8], 16)
    return (h + 1) / (0xFFFFFFFF + 2)


def build_hnsw(vecs, m: int = HNSW_M, ef: int = HNSW_EF_CONSTRUCTION):
    """Construct the layered graph for one fragment's vectors (cosine via
    normalized dot). Returns (levels, neighbors, entry): levels[i] = top
    level of node i; neighbors = dict[(level, i)] -> list[int]."""
    import math

    import numpy as np

    n = len(vecs)
    x = np.asarray(vecs, dtype=np.float32)
    norms = np.linalg.norm(x, axis=1)
    norms[norms == 0] = 1.0
    xn = x / norms[:, None]
    ml = 1.0 / math.log(max(2, m))
    levels = [int(-math.log(_hash_uniform(i)) * ml) for i in range(n)]
    neighbors: dict[tuple[int, int], list[int]] = {}
    entry = 0
    max_level = -1

    def _search_layer(q, ep, level, width):
        """Beam search on one layer from entry points `ep`; returns up to
        `width` (sim, node) best, sorted desc. Deterministic: ties broken
        by node id via the sort key."""
        import heapq

        visited = set(ep)
        cand = [(-float(xn[e] @ q), e) for e in ep]
        heapq.heapify(cand)
        best = sorted([(-s, e) for s, e in cand], reverse=True)[:width]
        while cand:
            negs, c = heapq.heappop(cand)
            if -negs < best[-1][0] and len(best) >= width:
                break
            for nb in neighbors.get((level, c), ()):
                if nb in visited:
                    continue
                visited.add(nb)
                sim = float(xn[nb] @ q)
                if len(best) < width or sim > best[-1][0]:
                    heapq.heappush(cand, (-sim, nb))
                    best.append((sim, nb))
                    best.sort(key=lambda t: (-t[0], t[1]))
                    del best[width:]
        return best

    for i in range(n):
        li = levels[i]
        if max_level < 0:  # first node
            for lvl in range(li + 1):
                neighbors[(lvl, i)] = []
            entry, max_level = i, li
            continue
        q = xn[i]
        ep = [entry]
        for lvl in range(max_level, li, -1):
            ep = [_search_layer(q, ep, lvl, 1)[0][1]]
        for lvl in range(min(max_level, li), -1, -1):
            found = _search_layer(q, ep, lvl, ef)
            chosen = [e for _, e in found[:m]]
            neighbors[(lvl, i)] = list(chosen)
            for e in chosen:  # bidirectional, pruned to m by similarity
                lst = neighbors.setdefault((lvl, e), [])
                if i not in lst:
                    lst.append(i)
                    if len(lst) > m:
                        lst.sort(
                            key=lambda j: (-float(xn[e] @ xn[j]), j)
                        )
                        del lst[m:]
            ep = [e for _, e in found]
        if li > max_level:
            for lvl in range(max_level + 1, li + 1):
                neighbors.setdefault((lvl, i), [])
            entry, max_level = i, li
    return levels, neighbors, entry


def hnsw_rel(column: str, frag_rel_path: str) -> str:
    return os.path.join(
        INDICES_DIR, f"{column}.hnsw", os.path.basename(frag_rel_path)
    )


def build_fragment_hnsw(
    root: str, frag_rel_path: str, column: str,
    m: int = HNSW_M, ef: int = HNSW_EF_CONSTRUCTION,
) -> str | None:
    """Executor-side: one fragment's HNSW sidecar — (row_index, vec,
    level, neighbors flattened as 'lvl:id,lvl:id,...'). Atomic, idempotent,
    consult-if-present (None when the column predates the fragment file)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(os.path.join(root, frag_rel_path))
    if column not in pf.schema_arrow.names:
        return None
    data = pq.read_table(os.path.join(root, frag_rel_path), columns=[column])
    raw = data.column(column).to_pylist()
    # NULL vectors are legal and simply unindexed; graph node ids are
    # positions in the non-null subset, and the sidecar's row_index column
    # carries the ORIGINAL fragment row index per node.
    row_idx = [i for i, v in enumerate(raw) if v is not None]
    vecs = np.array([np.asarray(raw[i], dtype=np.float32) for i in row_idx])
    n = len(row_idx)
    if n == 0:
        levels, neighbors, entry = [], {}, -1
    else:
        levels, neighbors, entry = build_hnsw(vecs, m, ef)
    adj = [
        ",".join(
            f"{lvl}:{nb}"
            for lvl in range(levels[i] + 1)
            for nb in neighbors.get((lvl, i), ())
        )
        for i in range(n)
    ]
    tbl = pa.table({
        "row_index": pa.array(row_idx, type=pa.int64()),
        "vec": pa.array([v.tolist() for v in vecs] if n else [],
                        type=pa.list_(pa.float32())),
        "level": pa.array(levels, type=pa.int32()),
        "adj": pa.array(adj, type=pa.string()),
        "is_entry": pa.array([i == entry for i in range(n)]),
    })
    rel = hnsw_rel(column, frag_rel_path)
    _atomic_write_table(tbl, os.path.join(root, rel), VINDEX_ROW_GROUP)
    return rel


def search_fragment_hnsw(
    root: str,
    frag_rel_path: str,
    column: str,
    query_ids,
    query_vecs,
    k: int,
    id_columns: list[str],
    deletion_indices=None,
    ef_search: int = HNSW_EF_SEARCH,
    allowed_indices=None,
):
    """One fragment's HNSW top-k per query: load the graph sidecar, beam-
    search each query, exact-cosine results (the sidecar carries the
    vectors). Deleted/filtered-out nodes still ROUTE (the graph stays
    connected) but never land in results, and the RESULT beam counts only
    ALLOWED candidates (standard filtered-HNSW — the search keeps
    expanding until ef_search allowed candidates are held, so a selective
    prefilter cannot starve the beam with blocked nodes). When the allowed
    set is small enough that an exact scan is cheaper than graph routing,
    the search falls back to exact cosine over the allowed nodes — recall
    over the filtered population then EQUALS unfiltered recall exactly."""
    import heapq

    import numpy as np

    from .index import read_rows_by_index

    path = os.path.join(root, hnsw_rel(column, frag_rel_path))
    if not os.path.exists(path):
        return [], 0
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    n = len(t)
    if n == 0:
        return [], 0
    xn = np.array([np.asarray(v, np.float32) for v in t.column("vec").to_pylist()])
    norms = np.linalg.norm(xn, axis=1)
    norms[norms == 0] = 1.0
    xn = xn / norms[:, None]
    levels = t.column("level").to_numpy()
    entry = int(np.flatnonzero(t.column("is_entry").to_numpy())[0])
    neighbors: dict[tuple[int, int], list[int]] = {}
    for i, s in enumerate(t.column("adj").to_pylist()):
        if not s:
            continue
        for part in s.split(","):
            lvl, nb = part.split(":")
            neighbors.setdefault((int(lvl), i), []).append(int(nb))
    # Node ids are positions in the (non-null) indexed subset; the sidecar's
    # row_index column maps node id -> ORIGINAL fragment row index.
    # deletion_indices / allowed_indices speak in fragment row indices.
    ridx = t.column("row_index").to_numpy()
    blocked = set()
    if deletion_indices is not None:
        dset = {int(r) for r in deletion_indices}
        blocked |= {i for i in range(n) if int(ridx[i]) in dset}
    if allowed_indices is not None:
        aset = {int(r) for r in allowed_indices}
        blocked |= {i for i in range(n) if int(ridx[i]) not in aset}
    allowed_nodes = (
        np.array([i for i in range(n) if i not in blocked], dtype=np.int64)
        if blocked
        else np.arange(n, dtype=np.int64)
    )
    if len(allowed_nodes) == 0:
        return [], n
    qm = np.asarray(query_vecs, dtype=np.float64)
    qnorm = np.linalg.norm(qm, axis=1)
    qnorm[qnorm == 0] = 1.0
    out_rows = []
    hits_per_query = []
    # Selective-filter fallback: when few nodes remain allowed, one
    # vectorized matmul over them beats graph routing AND is exact.
    exact_fallback = len(allowed_nodes) <= max(4 * ef_search, 4 * k)
    for qi in range(len(qm)):
        q = (qm[qi] / qnorm[qi]).astype(np.float32)
        if exact_fallback:
            sims = xn[allowed_nodes] @ q
            order = np.lexsort((allowed_nodes, -sims))[:k]
            hits = [(float(sims[j]), int(allowed_nodes[j])) for j in order]
            hits_per_query.append(hits)
            continue
        ep = entry
        for lvl in range(int(levels.max()), 0, -1):
            improved = True
            while improved:
                improved = False
                for nb in neighbors.get((lvl, ep), ()):
                    if float(xn[nb] @ q) > float(xn[ep] @ q):
                        ep, improved = nb, True
        # level-0 beam: `best` holds ALLOWED candidates only (the result
        # beam); blocked nodes still enter `cand` and route. Termination
        # requires a full allowed beam — a selective filter therefore
        # widens exploration instead of silently returning < k hits.
        visited = {ep}
        ep_sim = float(xn[ep] @ q)
        cand = [(-ep_sim, ep)]
        best = [(ep_sim, ep)] if ep not in blocked else []
        while cand:
            negs, c = heapq.heappop(cand)
            if len(best) >= ef_search and -negs < best[-1][0]:
                break
            for nb in neighbors.get((0, c), ()):
                if nb in visited:
                    continue
                visited.add(nb)
                sim = float(xn[nb] @ q)
                if len(best) < ef_search or sim > best[-1][0]:
                    heapq.heappush(cand, (-sim, nb))
                    if nb not in blocked:
                        best.append((sim, nb))
                        best.sort(key=lambda x: (-x[0], x[1]))
                        del best[ef_search:]
        hits_per_query.append(best[:k])
    need_nodes = sorted({i for hits in hits_per_query for _, i in hits})
    if not need_nodes:
        return [], n
    need = sorted({int(ridx[i]) for i in need_nodes})
    tbl, _ = read_rows_by_index(
        os.path.join(root, frag_rel_path), need, columns=list(id_columns)
    )
    pos_of = {r: j for j, r in enumerate(need)}
    id_arrays = [tbl.column(c).to_pylist() for c in id_columns]
    for qi, hits in enumerate(hits_per_query):
        for sim, i in hits:
            p = pos_of[int(ridx[i])]
            out_rows.append(
                (query_ids[qi], *(a[p] for a in id_arrays),
                 float(sim), int(ridx[i]))
            )
    return out_rows, n
