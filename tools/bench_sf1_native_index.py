"""sf1 anchor for the NATIVE `.lance` vector-index interop (VERDICT r7
#8): build a persisted IVF_PQ index over the 20k-row sf1 embeddings with
write_native_vector_index (the exact binary layout test_table4's
fixtures carry), then search it via native_index_search — pinning build
seconds and per-query search milliseconds next to the existing
s09/s11/s12 index-family rows. Appends a markdown section to
BENCH_SF1.md.

Usage: python3 tools/bench_sf1_native_index.py [sf_dir]
       (default .scratch/sf1 — run tools/gen_sf1.py first)."""
from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import numpy as np
    import pyarrow.parquet as pq

    from lance_trino_spark.format.lance_native import (
        list_native_vector_indices,
        native_index_search,
        write_native_dataset,
        write_native_vector_index,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scratch", "sf1")
    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.num_rows
    vecs = [list(map(float, v)) for v in emb.column("embedding").to_pylist()]
    ids = emb.column("vec_id").to_pylist()

    root = os.path.join(REPO, ".scratch", "sf1-native-index")
    shutil.rmtree(root, ignore_errors=True)
    t0 = time.time()
    write_native_dataset(root, {"vec_id": ids, "vector": vecs})
    t_write = time.time() - t0

    t0 = time.time()
    write_native_vector_index(root, "vector", n_cells=16, nsub=8)
    t_build = time.time() - t0
    idx = list_native_vector_indices(root)[-1]

    rng = np.random.default_rng(7)
    qidx = rng.choice(n, size=16, replace=False)
    queries = np.asarray([vecs[i] for i in qidx], dtype=np.float32)

    # warm (np caches, file page cache), then timed
    native_index_search(root, idx, queries[:2], k=10, nprobe=4)
    t0 = time.time()
    res = native_index_search(root, idx, queries, k=10, nprobe=4)
    t_search = time.time() - t0
    per_q_ms = 1000.0 * t_search / len(queries)

    # shortlist variant (refine_factor caps exact refines)
    t0 = time.time()
    res_rf = native_index_search(
        root, idx, queries, k=10, nprobe=4, refine_factor=4)
    t_search_rf = time.time() - t0
    per_q_rf_ms = 1000.0 * t_search_rf / len(queries)

    # sanity: a self-query's top-1 must sit at exact distance 0. (The sf1
    # embeddings are key-shifted replicas, so exact DUPLICATES of the
    # query exist and legitimately tie for top-1 — pin the distance, not
    # the row address.)
    ok = sum(1 for r in res if r["distances"][0] == 0.0)
    mean_cand = sum(r["n_candidates"] for r in res) / len(res)
    mean_refined_rf = sum(r["n_refined"] for r in res_rf) / len(res_rf)

    stamp = time.strftime("%Y-%m-%d %H:%M")
    lines = [
        "",
        f"## sf1 native `.lance` index interop anchor ({stamp}, driver-side; "
        f"{n} x 64d vectors, IVF_PQ 16 cells / 8 subq)",
        "",
        "| step | value |",
        "|---|---|",
        f"| native dataset write ({n} rows) | {t_write:.2f} s |",
        f"| index build (train+encode+persist) | {t_build:.2f} s |",
        f"| search, nprobe=4, exact refine | {per_q_ms:.1f} ms/query "
        f"({mean_cand:.0f} candidates avg) |",
        f"| search, nprobe=4, refine_factor=4 | {per_q_rf_ms:.1f} ms/query "
        f"({mean_refined_rf:.0f} refined avg) |",
        f"| self-query top-1 at exact distance 0 | {ok}/{len(queries)} |",
        "",
        "Note: build and search run driver-side here (the anchor pins the",
        "binary-format codec cost); the suite's lf17 shape distributes",
        "search one task per probed (cell, fragment) pair.",
    ]
    with open(os.path.join(REPO, "BENCH_SF1.md"), "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
