"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design (the point of each implementation):

- **exact**: one hash-groupBy on a 32-byte fingerprint — a single shuffle
  keyed by md5, skew-free by construction.
- **minhash_lsh**: shingle → 32-bit hash → k affine permutations → min per
  perm → band keys → candidate pairs via an equi-join *on band key* — never
  an all-pairs comparison. At 100 TB the only shuffles are (doc→shingle
  explode is narrow), groupBy(doc) for signatures, and the band-key join
  whose fan-in per key is bounded by collision rate; banding parameters
  (b bands × r rows) tune recall vs join fan-in.
- **simhash**: 32-bit signature split into 4 8-bit bands; by pigeonhole any
  pair within Hamming distance 3 shares ≥1 exact band → equi-join per band,
  then exact Hamming verify with bit_count. No quadratic step.
- **ngram_jaccard**: distinct-shingle inverted-index join (shingle →
  candidate pair) with |A∩B| counted per pair, then Jaccard filter. Join
  fan-in bounded by dropping ultra-frequent shingles (df cap) — the standard
  scale guard.
- **embedding near-dup**: cosine over a blocked join (block = `label`, the
  coarse IVF-cell stand-in) — never the full cross product.

All arithmetic is engine-portable (see functions/__init__.py): md5-derived
hashes, BIGINT-safe modular products, left-fold double sums — the DuckDB
oracles in suite/dedup.py replicate each step exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from ..functions import MINHASH_PRIME, h32, minhash_perms, normalize_text, tokens

DEFAULT_NUM_PERM = 16
DEFAULT_BANDS = 4  # → rows-per-band r = num_perm // bands = 4


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group documents by normalized-text fingerprint; keep the minimum id as
    canonical. Returns (fingerprint, n_copies, keeper)."""
    return (
        df.select(F.col(id_col), F.md5(normalize_text(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_copies"), F.min(id_col).alias("keeper"))
    )


def shingle_hashes(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Distinct word-k-gram shingle *hashes* per document (32-bit md5-derived).

    The shingle string is hashed inside the projection and never leaves the
    map side — the distinct shuffles only (id, int64) pairs, ~5× narrower
    than shuffling shingle text. Distinctness is on the hash (not the
    string): under 32-bit collisions a document's set can be smaller by a
    hair, which is the standard trade — and the suite oracles replicate
    hash-distinctness exactly."""
    # Small-input parallelization guard: a corpus that arrives as fewer
    # input splits than the cluster has slots (e.g. one small parquet file),
    # or one AQE coalesced to byte-sized partitions, would run the whole
    # CPU-heavy shingle+hash projection in very few tasks. Repartition only
    # in that case — the shuffle moves just the raw text, which is by
    # definition small here; at real scale input splits already saturate
    # the cluster and this is a no-op. The decision MUST NOT execute the
    # plan: the old `df.rdd.getNumPartitions()` probe materializes every
    # upstream query stage under AQE (an entire wasted pass per call — at
    # sf0.1 it alone re-ran the canonicalization join). Instead decide
    # from the leaf input files (no job): few files AND small known bytes
    # means the tokenize would under-parallelize; many files or large /
    # unknown-scheme inputs already split well past slots.
    spark = df.sparkSession
    slots = spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if len(files) < max(2, slots // 2):
        import os as _os
        from urllib.parse import unquote, urlparse

        total: int | None = 0
        for u in files:
            p = urlparse(u)
            if p.scheme in ("file", ""):
                try:
                    total += _os.path.getsize(unquote(p.path))
                except OSError:
                    total = None
                    break
            else:  # remote store: sizes unknown without data I/O
                total = None
                break
        # unknown sizes on few files: a 1-2 file input is the exact shape
        # this guard exists for (one small object-store file would run the
        # CPU-heavy shingle projection in one task), and the repartition
        # shuffle is cheap precisely when the "small" verdict is wrong by
        # a little — so treat <=2 unknown-size files as small instead of
        # assuming big for any non-local scheme. 32 MiB/slot on known
        # sizes is well under one scan split.
        if (total is not None and total < slots * (32 << 20)) or (
                total is None and len(files) <= 2):
            df = df.repartition(slots)
    # Tokenize ONCE in its own projection: referencing split() inside the
    # transform() lambda would re-evaluate it per shingle (Spark does no CSE
    # inside higher-order functions) — O(tokens²) per document.
    toks = df.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks")
    )
    elems = ", ".join(f"_toks[i + {d} - 1]" for d in range(k))
    # CASE guard: Spark's sequence(1, 0) is a DESCENDING sequence [1, 0],
    # not empty (DuckDB's generate_series(1, 0) IS empty) — short docs must
    # yield zero shingles in both engines.
    shingled = toks.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"CASE WHEN size(_toks) >= {k} THEN "
                f"transform(sequence(1, size(_toks) - {k - 1}),"
                f" i -> concat_ws(' ', {elems})) "
                f"ELSE array() END"
            )
        ).alias("shingle"),
    )
    return shingled.select(
        F.col(id_col), h32(F.col("shingle")).alias("h")
    ).dropDuplicates([id_col, "h"])


def minhash_signatures(
    sh: DataFrame, id_col: str = "doc_id", num_perm: int = DEFAULT_NUM_PERM
) -> DataFrame:
    """MinHash signature per document as `num_perm` columns mh0..mh{k-1}:
    one groupBy(doc) with k MIN aggregates — no permutation explode, so the
    shuffle carries each shingle hash once (k small aggregate buffers per
    group) instead of k exploded copies. Map-side partial aggregation does
    most of the min-ing before the exchange."""
    perms = minhash_perms(num_perm)
    aggs = [
        F.min(
            (F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_PRIME)
        ).alias(f"mh{j}")
        for j, (a, b) in enumerate(perms)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    _release: list | None = None,
) -> DataFrame:
    """Band the signature and equi-join on (band, band_key). Returns distinct
    (id_a < id_b) candidate pairs (lazy). The banded frame stays persisted
    until the caller consumes the result; pass ``_release`` to receive the
    handle for unpersisting afterwards (minhash_lsh_dedup does)."""
    r = num_perm // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",", *[F.col(f"mh{b * r + i}").cast("string") for i in range(r)]
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    # banded feeds both sides of the self-join; persist so the signature
    # aggregation runs once (it is tiny: bands × n_docs rows).
    banded = sig.select(F.col(id_col), F.explode(band_structs).alias("bk")).select(
        F.col(id_col), F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    ).persist()
    banded.count()  # materialize BEFORE the self-join: a lazy persist lets
    # both join branches race and compute the signature subtree twice
    left = banded.select(
        F.col(id_col).alias("id_a"), F.col("band"), F.col("band_key")
    )
    right = banded.select(
        F.col(id_col).alias("id_b"), F.col("band").alias("band_r"), F.col("band_key").alias("key_r")
    )
    if _release is not None:
        _release.append(banded)
    return (
        left.join(
            right,
            (F.col("band") == F.col("band_r"))
            & (F.col("band_key") == F.col("key_r"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, sh: DataFrame, id_col: str = "doc_id", threshold: float = 0.5
) -> DataFrame:
    """Exact Jaccard over distinct shingle sets for candidate pairs only.

    PRECONDITION: ``threshold`` must be > 0. At threshold <= 0 a candidate
    pair with a shingle-less member survives with jaccard 0.0, where the
    pre-r14 inner size-join dropped such pairs unconditionally (see the
    note at the end of this docstring). No in-repo caller goes below 0.5,
    and shingle-less docs never become LSH candidates.

    ONE join + ONE aggregation (r14, guide §2.4 — the old shape was four
    joins and two aggregations over the same shingle frame, each reference
    its own exchange pipeline): every candidate pair explodes into its two
    member ids; joining that tagged frame with the per-doc DISTINCT
    shingle hashes by id yields |A| + |B| rows per pair, of which the
    duplicated hashes are exactly the intersection. So with n = |A| + |B|
    and u = |A ∪ B| = countDistinct(h):

        inter = n - u,   union = u,   jaccard = inter / union

    bitwise identical to the old inter / (sz_a + sz_b - inter) form (same
    two int64 operands of the one double division). The join also acts as
    the guide §3.2 semi-join: only candidate docs' shingles flow into the
    aggregation. Note: a pair whose member has NO shingle rows survives
    the join with jaccard 0 and is dropped by any threshold > 0 (the old
    inner size-join dropped it unconditionally) — all callers use
    threshold >= 0.5."""
    tagged = pairs.select(
        "id_a", "id_b",
        F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias(id_col),
    )
    return (
        tagged.join(sh, id_col)
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("_n"), F.countDistinct("h").alias("_u"))
        .withColumn(
            "jaccard",
            (F.col("_n") - F.col("_u")).cast("double")
            / F.col("_u").cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    bits: int = 32,
    max_hamming: int = 3,
) -> DataFrame:
    """Full SimHash near-dup pipeline -> (id_a, id_b, hamming), with the
    same EXACT-CONTENT CANONICALIZATION as minhash_lsh_dedup /
    ngram_jaccard_pairs: signatures and Hamming distances are content
    functions, so the banded join + verify run over one representative
    per identical-text group and survivors expand to member pairs
    (identical members pair at Hamming 0 — always within max_hamming —
    provided the content has at least one shingle)."""
    fpd = df.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("_fp"), F.col(text_col)
    )
    # same proxy-table caching as minhash_lsh_dedup: mem feeds the group
    # aggregation and four expansion branches — one corpus pass, cached
    mem = fpd.select("_fp", F.col(id_col)).persist()
    groups = mem.groupBy("_fp").agg(
        F.min(id_col).alias("rep"), F.count("*").alias("gsize")
    ).persist()
    # no explicit materialize: the shingle materialization below scans
    # through reps -> groups -> mem and fills both caches in that pass
    reps = fpd.join(
        groups.select(F.col("rep").alias(id_col)), id_col
    ).select(id_col, text_col)

    sh = shingle_hashes(reps, id_col, text_col, k).persist()
    sh.count()
    sig = simhash_signatures(sh, id_col, bits)
    rep_pairs = simhash_near_dup_pairs(
        sig, id_col, max_hamming
    ).select(
        F.col("id_a").alias("rep_a"), F.col("id_b").alias("rep_b"),
        "hamming",
    )
    has_sh = sh.select(F.col(id_col).alias("rep")).distinct()
    selfj = (
        groups.filter(F.col("gsize") >= 2)
        .join(has_sh, "rep")
        .select("_fp", F.lit(0).cast("long").alias("hamming"))
    )
    out = _expand_rep_pairs(
        rep_pairs, groups, mem, id_col, selfj, value_col="hamming")
    sh.unpersist()
    groups.unpersist()
    mem.unpersist()
    return out


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline → verified (id_a, id_b, jaccard).

    EXACT-CONTENT CANONICALIZATION first (same recipe as
    ngram_jaccard_pairs, same exactness argument): signatures, band
    buckets and Jaccard are all functions of content, so the LSH +
    verify stages run over one representative per identical-text group
    and the surviving pairs expand back to member pairs. Identical
    members pair with each other at exactly 1.0 (their full shingle
    sets coincide), PROVIDED the content has at least one shingle —
    shingle-less docs never enter a band, matching the naive pass. The
    candidate-verify volume — the quadratic-in-duplication term —
    shrinks by the duplication factor squared.

    The shingle frame feeds both the signature and the verify stage — persist
    it so the explode+distinct runs once (at cluster scale: a checkpoint to
    fast storage). The big intermediates (shingle set, candidate pairs) are
    RELEASED before returning: the verified pair list is materialized with
    localCheckpoint (it is orders of magnitude smaller than the corpus), so
    the caches don't accumulate across queries in a long-lived session."""
    fpd = df.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("_fp"), F.col(text_col)
    )
    # mem is the §8 proxy table — (_fp, id) per doc, no text. It is
    # referenced by the group aggregation AND four branches of the final
    # expansion; cached it is computed in ONE corpus pass (text pruned at
    # the scan) instead of once per plan branch.
    mem = fpd.select("_fp", F.col(id_col)).persist()
    groups = mem.groupBy("_fp").agg(
        F.min(id_col).alias("rep"), F.count("*").alias("gsize")
    ).persist()
    # no explicit materialize: the shingle materialization below scans
    # through reps -> groups -> mem and fills both caches in that pass
    reps = fpd.join(
        groups.select(F.col("rep").alias(id_col)), id_col
    ).select(id_col, text_col)

    sh = shingle_hashes(reps, id_col, text_col, k).persist()
    sh.count()  # materialize once; feeds both signatures and verify
    sig = minhash_signatures(sh, id_col, num_perm)
    # candidate pairs are the tiny decision table on a DEEP plan (band
    # explode + self-join over the whole signature subtree); materialize
    # them so the verify plan starts from the pair list instead of
    # re-deriving the LSH subtree per branch
    release: list = []
    pairs = lsh_candidate_pairs(
        sig, id_col, num_perm, bands, _release=release
    ).localCheckpoint()
    rep_pairs = jaccard_verify(pairs, sh, id_col, threshold).select(
        F.col("id_a").alias("rep_a"), F.col("id_b").alias("rep_b"), "jaccard"
    )
    # intra-group pairs: identical shingle sets -> jaccard exactly 1.0,
    # always >= threshold; groups of shingle-less docs emit nothing
    has_sh = sh.select(F.col(id_col).alias("rep")).distinct()
    selfj = (
        groups.filter(F.col("gsize") >= 2)
        .join(has_sh, "rep")
        .select("_fp", F.lit(1.0).alias("jaccard"))
    )
    verified = _expand_rep_pairs(rep_pairs, groups, mem, id_col, selfj)
    for frame in (*release, sh, groups, mem):
        frame.unpersist()
    return verified


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
    driver_edge_limit: int = 2_000_000,
) -> DataFrame:
    """Transitive near-dup clusters from a pair list: (doc_id, cluster) where
    cluster is the minimum doc id of the component — the canonical
    representative.

    Two-level strategy, picked by edge count:

    - **≤ driver_edge_limit edges**: collect the pair list and run union-find
      with path compression on the driver. The verified near-dup pair graph
      is orders of magnitude smaller than the corpus (it holds only documents
      with at least one duplicate partner), so even a 100 TB corpus usually
      lands here; a single collect of (id, id) pairs replaces dozens of
      shuffle stages.
    - **above the limit**: distributed min-label propagation until fixpoint —
      one shuffle per iteration, iterations bounded by component diameter
      (near-dup clusters are shallow stars/chains, so typically 2-4); the
      same algorithm GraphX/GraphFrames use for CC. Each iteration's label
      frame is persisted and the previous one released, so peak storage is
      two label sets, each one row per distinct doc in the pair list.
    """
    pairs = pairs.persist()
    # One action decides the strategy AND feeds the fast path: collect up to
    # limit+1 edges. The verified near-dup pair graph is tiny relative to the
    # corpus, so the common case pays a single job here instead of a count
    # job followed by a collect job (per-job overhead dominates small runs;
    # at cluster scale one fewer stage wave).
    edge_rows = pairs.select(id_a, id_b).limit(driver_edge_limit + 1).collect()
    if len(edge_rows) <= driver_edge_limit:
        id_type = pairs.schema[id_a].dataType
        parent: dict = {}
        cmin: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        # Single collect (≤ driver_edge_limit rows, two ids each) — NOT
        # toLocalIterator, which runs one sequential job per partition and
        # dominates wall-clock when the pair list is spread thin over many
        # partitions.
        for a, b in edge_rows:
            for v in (a, b):
                if v not in parent:
                    parent[v] = v
                    cmin[v] = v
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
                cmin[ra] = min(cmin[ra], cmin[rb])
        rows = [(v, cmin[find(v)]) for v in parent]
        pairs.unpersist()
        spark = pairs.sparkSession
        schema = StructType(
            [StructField("doc_id", id_type), StructField("cluster", id_type)]
        )
        return spark.createDataFrame(rows, schema)
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .persist()
    )
    for _ in range(max_iterations):
        neigh = edges.join(labels, edges["dst"] == labels["id"]).select(
            edges["src"].alias("id"), "label"
        )
        new_labels = (
            labels.unionByName(neigh)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .persist()
        )
        old = labels.select("id", F.col("label").alias("old_label"))
        changed = (
            new_labels.join(old, "id")
            .filter(F.col("label") != F.col("old_label"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    out = labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster"))
    out.count()  # materialize the cached fixpoint before releasing the edges
    edges.unpersist()
    pairs.unpersist()
    return out


def simhash_signatures(
    sh: DataFrame, id_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """32-bit SimHash: bit j of the signature is 1 iff more than half of the
    document's shingle hashes have bit j set.

    One groupBy(doc) with `bits` conditional-SUM aggregates — no per-bit
    explode, so the shuffle moves each shingle hash once and map-side partial
    aggregation collapses most rows before the exchange."""
    aggs = [
        F.sum(F.expr(f"shiftright(h, {j}) & 1")).alias(f"ones{j}")
        for j in range(bits)
    ] + [F.count("*").alias("n")]
    votes = sh.groupBy(id_col).agg(*aggs)
    # 1 << j as BIGINT (an INT shiftleft(1, 31) would wrap negative and
    # diverge from DuckDB's 1::BIGINT << 31).
    sig = None
    for j in range(bits):
        term = F.when(
            F.col(f"ones{j}") * 2 > F.col("n"), F.lit(1 << j).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
        sig = term if sig is None else sig + term
    return votes.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_dup_pairs(
    sig: DataFrame, id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Banded SimHash join: 4 bytes per signature; Hamming ≤ 3 ⇒ at least one
    byte matches exactly (pigeonhole), so candidates come from 4 equi-joins,
    then bit_count verifies."""
    sig = sig.persist()  # feeds both sides of the band self-join
    sig.count()  # materialize so the signature pipeline runs exactly once
    banded = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(F.expr("sequence(0, 3)")).alias("band"),
    ).withColumn("band_val", F.expr("shiftright(simhash, band * 8) & 255"))
    left = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "band", "band_val"
    )
    right = banded.select(
        F.col(id_col).alias("id_b"),
        F.col("simhash").alias("sh_b"),
        F.col("band").alias("band_r"),
        F.col("band_val").alias("val_r"),
    )
    out = (
        left.join(
            right,
            (F.col("band") == F.col("band_r"))
            & (F.col("band_val") == F.col("val_r"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b", F.expr("bit_count(sh_a ^ sh_b)").alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
        .localCheckpoint()  # tiny near-dup pair list; releases the cache below
    )
    sig.unpersist()
    return out


def _expand_rep_pairs(
    rep_pairs: DataFrame,
    groups: DataFrame,
    mem: DataFrame,
    id_col: str,
    selfj: DataFrame,
    value_col: str = "jaccard",
) -> DataFrame:
    """Expand representative-level near-dup results back to ALL member
    pairs after exact-content canonicalization. ``rep_pairs`` is
    (rep_a, rep_b, jaccard) for cross-group survivors; ``selfj`` is
    (_fp, jaccard) for groups whose identical members pair with each
    other. Similarity is a function of content, so every member pair of
    a surviving (group_a, group_b) combination carries the
    representative pair's exact value — the expansion is pure equi-join
    bookkeeping sized by the TRUE OUTPUT (least/greatest restores the
    id_a < id_b contract). Returns a localCheckpoint'd pair list so
    callers can release their upstream caches.

    ``rep_pairs`` is materialized (localCheckpoint) BEFORE the expansion
    joins: it is the tiny decision table (survivor pairs only), while its
    lineage is the whole banded-join + verify pipeline. Composing that
    lineage into the 6-join expansion used to build one enormous physical
    plan (measured at sf0.1: 224k chars, 53 BroadcastExchange / 189
    Exchange nodes, every broadcast branch re-executing uncached
    subtrees — d02 oscillated 6-65 s). Cutting the lineage at the small
    table keeps the final plan six shallow joins over materialized
    inputs (guide §3.3/§8: decide with small rows, truncate deep plans
    before re-attaching)."""
    rep_pairs = rep_pairs.localCheckpoint()
    r2f = groups.select("rep", "_fp")
    cross = (
        rep_pairs
        .join(
            r2f.select(F.col("rep").alias("rep_a"), F.col("_fp").alias("fa")),
            "rep_a",
        )
        .join(
            r2f.select(F.col("rep").alias("rep_b"), F.col("_fp").alias("fb")),
            "rep_b",
        )
        .join(mem.select(F.col("_fp").alias("fa"), F.col(id_col).alias("ma")), "fa")
        .join(mem.select(F.col("_fp").alias("fb"), F.col(id_col).alias("mb")), "fb")
        .select(
            F.least("ma", "mb").alias("id_a"),
            F.greatest("ma", "mb").alias("id_b"),
            value_col,
        )
    )
    ma = mem.select("_fp", F.col(id_col).alias("ma"))
    mb = mem.select(F.col("_fp").alias("_fpb"), F.col(id_col).alias("mb"))
    intra = (
        selfj.join(ma, "_fp")
        .join(mb, F.col("_fp") == F.col("_fpb"))
        .filter(F.col("ma") < F.col("mb"))
        .select(
            F.col("ma").alias("id_a"), F.col("mb").alias("id_b"), value_col
        )
    )
    return cross.unionAll(intra).localCheckpoint()


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """Inverted-index n-gram Jaccard: explode distinct shingles, drop
    shingles appearing in > max_doc_freq docs (frequency cap = the scale
    guard against quadratic hot keys), self-join on shingle, count
    intersections, Jaccard-filter.

    EXACT-CONTENT CANONICALIZATION first (the production near-dup
    recipe): documents are grouped by an exact text fingerprint, the
    quadratic inverted-index pass runs over one REPRESENTATIVE per
    group, and surviving representative pairs expand back to all member
    pairs at the end. Output is IDENTICAL to the naive all-docs pass
    (Jaccard is a function of content; the frequency cap is applied on
    DOC-level frequencies by weighting each representative's shingles
    with its group size) — but the co-occurrence volume shrinks by the
    mean duplication factor SQUARED, which is exactly the regime this
    operator hunts: a boilerplate page duplicated 1000x at 100 TB costs
    1 representative here, not 10^6 co-occurrence rows (measured at
    sf1: 215M -> ~2M rows, 148 s -> seconds)."""
    fpd = df.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("_fp"), F.col(text_col)
    )
    # same proxy-table caching as minhash_lsh_dedup: mem feeds the group
    # aggregation and four expansion branches — one corpus pass, cached
    mem = fpd.select("_fp", F.col(id_col)).persist()
    groups = mem.groupBy("_fp").agg(
        F.min(id_col).alias("rep"), F.count("*").alias("gsize")
    ).persist()
    # no explicit materialize: the shingle materialization below scans
    # through reps -> groups -> mem and fills both caches in that pass
    reps = fpd.join(
        groups.select(F.col("rep").alias(id_col)), id_col
    ).select(id_col, text_col)

    sh = shingle_hashes(reps, id_col, text_col, k).persist()
    sh.count()  # materialize: feeds the index, both join sides, and sizes
    # DOC-level document frequency = sum of group sizes per shingle, so
    # the cap means exactly what it meant over raw documents
    gsz = groups.select(F.col("rep").alias(id_col), "gsize")
    df_freq = sh.join(gsz, id_col).groupBy("h").agg(
        F.sum("gsize").alias("df_")
    )
    # rare feeds both sides of the co-occurrence self-join AND the
    # intra-group rare_cnt — cache it so the frequency-cap join runs once
    rare = sh.join(df_freq.filter(F.col("df_") <= max_doc_freq), "h").persist()
    # sizes feeds both sides of the pair join AND the intra-group arm —
    # cache the tiny per-doc counts so the aggregation runs once
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz")).persist()
    a = rare.select(F.col(id_col).alias("id_a"), "h")
    b = rare.select(F.col(id_col).alias("id_b"), F.col("h").alias("hb"))
    inter = (
        a.join(b, (F.col("h") == F.col("hb")) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    rep_pairs = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("id_a").alias("rep_a"), F.col("id_b").alias("rep_b"),
            "jaccard",
        )
    )

    # intra-group pairs carry jaccard rare_cnt / (2*sz - rare_cnt) (the
    # cap keeps the same numerator-vs-denominator asymmetry the naive
    # pass has); a group whose representative has NO uncapped shingles
    # generates no pairs, exactly like the naive co-occurrence join
    rare_cnt = rare.groupBy(id_col).agg(F.count("*").alias("rc"))
    selfj = (
        groups.filter(F.col("gsize") >= 2)
        .join(rare_cnt.withColumnRenamed(id_col, "rep"), "rep")
        .join(sizes.withColumnRenamed(id_col, "rep"), "rep")
        .withColumn(
            "jaccard",
            F.col("rc").cast("double")
            / (F.col("sz") + F.col("sz") - F.col("rc")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("_fp", "jaccard")
    )
    out = _expand_rep_pairs(rep_pairs, groups, mem, id_col, selfj)
    sh.unpersist()
    groups.unpersist()
    mem.unpersist()
    rare.unpersist()
    sizes.unpersist()
    return out


def content_fingerprint(text_col: str = "text"):
    """Order-insensitive content fingerprint: md5 over the sorted token
    multiset. Catches syndicated / token-shuffled copies that byte-exact
    hashing misses, while staying a pure JVM expression (no Python)."""
    from ..functions import tokens

    return F.md5(F.array_join(F.array_sort(tokens(text_col)), " "))


def cross_source_duplicate_groups(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Duplicate-content groups across sources, keyed by the
    order-insensitive fingerprint.

    Scale shape: the text reduces to a 32-char fingerprint in the map stage,
    so the single hash shuffle moves (fingerprint, id, source) — never the
    document bodies; group stats are partial-aggregated map-side. The output
    is only the duplicated groups (n_docs > 1), which is the small tail by
    construction."""
    fps = docs.select(
        content_fingerprint(text_col).alias("fingerprint"),
        F.col(id_col).alias("_id"),
        F.col(source_col).alias("_source"),
    )
    return (
        fps.groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("_source").alias("n_sources"),
            F.min("_id").alias("min_doc_id"),
            F.max("_id").alias("max_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """Embedding-space (semantic) deduplication — the composition the other
    operators exist for: cell-blocked cosine near-dup pairs
    (`similarity.embedding_neardup_pairs`) → transitive clusters
    (`connected_components`) → keeper = the cluster's minimum id. Returns
    every input row as (id_col, cluster, is_keeper); singletons are their
    own cluster and keeper.

    Scale shape inherits from the parts: pair generation never leaves its
    coarse cell (no all-pairs), the component graph holds only near-dup
    members (orders of magnitude smaller than the corpus), and the final
    assignment is one broadcast-sized left join back onto the corpus scan.
    """
    from .similarity import embedding_neardup_pairs

    pairs = embedding_neardup_pairs(
        df, threshold=threshold, id_col=id_col, vec_col=vec_col,
        cell_col=cell_col,
    ).select("id_a", "id_b")
    cc = connected_components(pairs).withColumnRenamed("doc_id", "_cc_id")
    out = (
        df.select(id_col)
        .join(cc, F.col(id_col) == F.col("_cc_id"), "left")
        .select(
            id_col,
            F.coalesce(F.col("cluster"), F.col(id_col)).alias("cluster"),
        )
    )
    return out.withColumn("is_keeper", F.col(id_col) == F.col("cluster"))


def url_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """URL-level duplicate detection — the crawl-dedup primitive that runs
    BEFORE content hashing at corpus scale: documents citing the same URL
    are re-crawl / mirror candidates. Extracts URLs with the same JVM-side
    regexp as url_domain_stats (no UDF), groups by exact URL, and reports
    every URL cited by >= 2 distinct documents with the canonical keeper
    (min id) — the dedup decision list a crawl pipeline consumes.

    Scale shape: regexp_extract_all + explode is a narrow projection; the
    only shuffle is one groupBy(url) with map-side distinct combine. URLs
    are a heavy-hitter-friendly key; no all-pairs step exists."""
    from .text import URL_PATTERN

    urls = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 0)
        ).alias("url"),
    ).dropDuplicates([id_col, "url"])
    return (
        urls.groupBy("url")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keeper"),
            F.sum(id_col).alias("id_sum"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def passage_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 25,
) -> DataFrame:
    """Passage-level (sub-document) deduplication — the RefinedWeb/CCNet
    recipe step that removes repeated boilerplate PASSAGES across a corpus
    rather than whole near-duplicate documents: each document is chunked
    into non-overlapping ``window``-word passages, passages are exact-
    deduped globally (first occurrence by (doc id, passage index) wins),
    and each document reports how much of it survives.

    Returns one row per document: n_passages, n_kept, retained (double in
    [0,1]). A wholly-duplicated document retains 0.0; boilerplate-heavy
    documents retain partially — the signal a pipeline thresholds on.

    Scale shape: split + posexplode is a narrow projection (passage rows ~
    corpus words / window); the global dedup is a ``groupBy(phash).agg(
    min(struct(doc_id, chunk_idx)))`` — a hash aggregate with MAP-SIDE
    partial aggregation, so every occurrence of a heavy-hitter passage
    (boilerplate IS the hot key — a cookie banner in 10% of a 100 TB
    corpus) collapses to one row per task before the exchange. This
    replaces an earlier ``row_number() OVER (PARTITION BY phash)`` window,
    which funnelled all occurrences of the hottest passage into a single
    reducer task; a window function cannot partially aggregate. No join
    back by phash either (that shuffle re-skews): winners are attributed
    to their first-occurrence DOCUMENT and counted per doc, then joined
    to the per-doc passage counts on the doc id — a uniformly-distributed
    key. All JVM-side built-ins, no UDFs."""
    words = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("w")
    )
    passages = words.select(
        id_col,
        F.posexplode(F.expr(
            "transform("
            f"sequence(0L, CAST(ceil(size(w) / {window}.0) AS BIGINT) - 1), "
            f"i -> concat_ws(' ', slice(w, int(i) * {window} + 1, {window})))"
        )).alias("chunk_idx", "passage"),
    ).withColumn("phash", F.md5(F.col("passage")))
    # First occurrence per passage = min (doc id, chunk idx) — struct min
    # orders lexicographically, matching the old window's ORDER BY. The
    # aggregate is partial-aggregatable (partial_min in the plan), so the
    # hottest boilerplate passage never lands in one task: every task
    # pre-collapses its local occurrences before the exchange.
    winners = passages.groupBy("phash").agg(
        F.min(F.struct(F.col(id_col), F.col("chunk_idx"))).alias("first_occ")
    )
    # One winner row per DISTINCT passage; count them per first-occurrence
    # document. n_kept(D) = #distinct passages whose global first
    # occurrence lies in D — identical to summing the old window's
    # row_number()==1 marks per doc.
    kept_per_doc = winners.groupBy(
        F.col(f"first_occ.{id_col}").alias(id_col)
    ).agg(F.count("*").alias("n_kept"))
    totals = passages.groupBy(id_col).agg(
        F.count("*").alias("n_passages")
    )
    return (
        totals.join(kept_per_doc, id_col, "left")
        .withColumn("n_kept", F.coalesce(F.col("n_kept"), F.lit(0)))
        .withColumn(
            "retained",
            F.col("n_kept").cast("double") / F.col("n_passages").cast("double"),
        )
        .select(id_col, "n_passages", "n_kept", "retained")
    )


def exact_substring_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    hash_windows: bool = True,
) -> DataFrame:
    """Exact-substring duplication detection (the suffix-array method of
    "Deduplicating Training Data Makes Language Models Better", Lee et
    al. 2022, re-expressed as a shuffle-on-window-key groupBy): two
    documents are exact-substring duplicates when they share ANY
    verbatim run of >= ``window`` characters. Every stride-1 window of
    each document becomes a key; a key held by >= 2 distinct documents
    marks a shared run. Returns one row per document that shares at
    least one run: (id_col, n_dup_windows) where n_dup_windows counts
    the document's distinct windows that also appear verbatim elsewhere
    — the document's duplicated-span mass, the quantity the Lee et al.
    recipe cuts.

    Scale shape: the explode is the honest cost of exact-substring
    matching (O(total characters) rows — what a distributed suffix
    array also materializes); everything after is a map-side-combinable
    groupBy + a semi-join, never an all-pairs join. With
    ``hash_windows`` (the 100 TB default) only a 64-bit xxhash64 of
    each window rides the shuffle instead of the window bytes —
    oracle-gated suite runs pass False so DuckDB can reproduce the keys
    exactly (no xxhash64 there)."""
    win = F.explode(F.expr(
        f"transform(sequence(1, greatest(length({text_col}) - {window} + 1,"
        f" 0)), i -> substring({text_col}, i, {window}))")).alias("win")
    w = (
        docs.where(F.length(text_col) >= window)
        .select(F.col(id_col), win)
        .withColumn("key", F.xxhash64("win") if hash_windows
                    else F.col("win"))
        .select(id_col, "key")
        .distinct()
    )
    shared = (
        w.groupBy("key").agg(F.count("*").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("key")
    )
    return (
        w.join(shared, "key")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_dup_windows"))
    )
