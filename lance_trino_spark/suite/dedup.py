"""Deduplication suite entries.

The driver corpus has no natural duplicates (500 unique texts at sf0.01), so
each query builds a *deterministically augmented corpus* inside the query:
exact copies of every doc_id % 7 == 0 (id + 2000000) and near-copies (one
appended token) of every doc_id % 10 == 0 (id + 1000000). Both engines build
the same corpus in SQL/DataFrame terms, so dedup outputs are non-trivial and
hash-comparable.

Oracle SQL is generated from the SAME constants as the Spark operators
(minhash permutation table, shingle k, band layout) — single source of truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import MINHASH_PRIME, minhash_perms
from ..operators.dedup import (
    DEFAULT_BANDS,
    DEFAULT_NUM_PERM,
    connected_components,
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    shingle_hashes,
    simhash_dedup,
    simhash_near_dup_pairs,
    simhash_signatures,
    passage_dedup,
)
from ..tables import load_table
from . import register

# --- shared augmented-corpus construction ---------------------------------

_CORPUS_SQL = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000,
           text || ' dupword' || CAST(doc_id % 5 AS VARCHAR)
    FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id + 2000000, text
    FROM documents WHERE doc_id % 7 = 0
"""


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    near = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" dupword"), (F.col("doc_id") % 5).cast("string")
        ).alias("text"),
    )
    exact = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text"
    )
    return docs.unionAll(near).unionAll(exact)


# DuckDB CTEs shared by the shingle-based oracles (k=3 word shingles,
# 32-bit md5-derived hashes, distinct per (doc, hash) — mirrors
# operators/dedup.py:shingle_hashes).
_SHINGLE_CTES = f"""
    corpus AS ({_CORPUS_SQL}),
    tok AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM corpus),
    pos AS (SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i
            FROM tok),
    sh0 AS (SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle FROM pos),
    sh AS (SELECT DISTINCT doc_id,
                  ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh0)
"""


# ---------------------------------------------------------------------------
# d01 — exact dedup via normalized-text fingerprint groupBy.
# ---------------------------------------------------------------------------
@register(
    "d01_exact_dedup",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL})
    SELECT fingerprint, COUNT(*) AS n_copies, MIN(doc_id) AS keeper
    FROM (SELECT doc_id,
                 md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
          FROM corpus) t
    GROUP BY fingerprint
    HAVING COUNT(*) > 1
    ORDER BY fingerprint
    """,
    doc="exact dedup: hash-groupBy on normalized-text md5",
    tags=("dedup", "exact"),
)
def d01(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        exact_dedup(_corpus(spark, sf_dir))
        .filter(F.col("n_copies") > 1)
        .orderBy("fingerprint")
    )


# ---------------------------------------------------------------------------
# d02 — MinHash + LSH near-dup detection with exact-Jaccard verification.
# ---------------------------------------------------------------------------
def _minhash_pairs_ctes() -> str:
    """CTE chain ending in `verified(id_a, id_b, jaccard)` — shared by the
    d02 pair oracle and the d05 connected-components oracle."""
    perms = minhash_perms(DEFAULT_NUM_PERM)
    r = DEFAULT_NUM_PERM // DEFAULT_BANDS
    min_aggs = ",\n                ".join(
        f"MIN(({a} * h + {b}) % {MINHASH_PRIME}) AS mh{j}"
        for j, (a, b) in enumerate(perms)
    )
    band_selects = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, {b} AS band, "
        + " || ',' || ".join(f"CAST(mh{b * r + i} AS VARCHAR)" for i in range(r))
        + " AS band_key FROM sig"
        for b in range(DEFAULT_BANDS)
    )
    return f"""{_SHINGLE_CTES},
    sig AS (SELECT doc_id,
                {min_aggs}
            FROM sh GROUP BY doc_id),
    banded AS (
      {band_selects}),
    cand AS (SELECT DISTINCT l.doc_id AS id_a, r2.doc_id AS id_b
             FROM banded l JOIN banded r2
               ON l.band = r2.band AND l.band_key = r2.band_key
              AND l.doc_id < r2.doc_id),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
              FROM cand c
              JOIN sh a ON a.doc_id = c.id_a
              JOIN sh b ON b.doc_id = c.id_b AND a.h = b.h
              GROUP BY c.id_a, c.id_b),
    verified AS (
      SELECT c.id_a, c.id_b,
             CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
               / (sa.sz + sb.sz - COALESCE(i.n_inter, 0)) AS jaccard
      FROM cand c
      LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
      JOIN sizes sa ON sa.doc_id = c.id_a
      JOIN sizes sb ON sb.doc_id = c.id_b
      WHERE CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
              / (sa.sz + sb.sz - COALESCE(i.n_inter, 0)) >= 0.5)"""


def _minhash_oracle() -> str:
    return f"""
    WITH {_minhash_pairs_ctes()}
    SELECT id_a, id_b, jaccard FROM verified
    ORDER BY id_a, id_b
    """


@register(
    "d02_minhash_lsh_dedup",
    oracle=_minhash_oracle(),
    doc="MinHash(16 perms) + LSH(4 bands) near-dup pairs, Jaccard>=0.5",
    tags=("dedup", "minhash", "lsh"),
)
def d02(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no trailing global sort: its range-sampling pass would re-execute
    # the LSH-verify subtree (the driver/checker compare is
    # order-insensitive; see s03 for the measured cost of the sort)
    return minhash_lsh_dedup(_corpus(spark, sf_dir), threshold=0.5)


# ---------------------------------------------------------------------------
# d03 — SimHash near-dup pairs via banded signature join.
# ---------------------------------------------------------------------------
def _simhash_oracle() -> str:
    ones_aggs = ",\n                   ".join(
        f"SUM((h >> {j}) & 1) AS ones{j}" for j in range(32)
    )
    sig_terms = "\n                 + ".join(
        f"(CASE WHEN ones{j} * 2 > n THEN (1::BIGINT << {j}) ELSE 0 END)"
        for j in range(32)
    )
    return f"""
    WITH {_SHINGLE_CTES},
    votes AS (SELECT doc_id, COUNT(*) AS n,
                   {ones_aggs}
              FROM sh GROUP BY doc_id),
    sig AS (SELECT doc_id,
                   CAST({sig_terms} AS BIGINT) AS simhash
            FROM votes),
    banded AS (SELECT doc_id, simhash, unnest(generate_series(0, 3)) AS band FROM sig),
    b2 AS (SELECT doc_id, simhash, band, (simhash >> (band * 8)) & 255 AS band_val
           FROM banded)
    SELECT DISTINCT l.doc_id AS id_a, r2.doc_id AS id_b,
           CAST(bit_count(xor(l.simhash, r2.simhash)) AS INT) AS hamming
    FROM b2 l JOIN b2 r2
      ON l.band = r2.band AND l.band_val = r2.band_val AND l.doc_id < r2.doc_id
    WHERE bit_count(xor(l.simhash, r2.simhash)) <= 3
    ORDER BY id_a, id_b
    """


@register(
    "d03_simhash_near_dup",
    oracle=_simhash_oracle(),
    doc="SimHash(32-bit) near-dup pairs, Hamming<=3, banded join",
    tags=("dedup", "simhash"),
)
def d03(spark: SparkSession, sf_dir: str) -> DataFrame:
    # composed operator: exact-content canonicalization + banded simhash
    # (signatures are content functions; see operators/dedup.simhash_dedup)
    return (
        simhash_dedup(_corpus(spark, sf_dir), max_hamming=3)
        .select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
    )


# ---------------------------------------------------------------------------
# d04 — n-gram Jaccard near-dup via inverted-index join (no LSH).
# ---------------------------------------------------------------------------
@register(
    "d04_ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLE_CTES},
    freq AS (SELECT h, COUNT(*) AS df_ FROM sh GROUP BY h),
    rare AS (SELECT sh.doc_id, sh.h FROM sh JOIN freq ON sh.h = freq.h
             WHERE freq.df_ <= 1000),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              FROM rare a JOIN rare b ON a.h = b.h AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
    SELECT i.id_a, i.id_b,
           CAST(i.n_inter AS DOUBLE) / (sa.sz + sb.sz - i.n_inter) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE CAST(i.n_inter AS DOUBLE) / (sa.sz + sb.sz - i.n_inter) >= 0.5
    ORDER BY id_a, id_b
    """,
    doc="n-gram Jaccard near-dup pairs via inverted shingle index",
    tags=("dedup", "jaccard"),
)
def d04(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no trailing global sort — same rationale as d02/d03/s03
    return ngram_jaccard_pairs(_corpus(spark, sf_dir), threshold=0.5)


# ---------------------------------------------------------------------------
# d05 — transitive near-dup clusters: connected components over the verified
# MinHash-LSH pair graph (min-label propagation in Spark; the DuckDB oracle
# computes the same components with a recursive transitive-closure CTE).
# ---------------------------------------------------------------------------
def _cc_oracle() -> str:
    return f"""
    WITH RECURSIVE {_minhash_pairs_ctes()},
    edges AS (SELECT id_a AS src, id_b AS dst FROM verified
              UNION ALL
              SELECT id_b, id_a FROM verified),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(a, b) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    )
    SELECT a AS doc_id, MIN(b) AS cluster
    FROM reach GROUP BY a
    ORDER BY doc_id
    """


@register(
    "d05_dedup_clusters",
    oracle=_cc_oracle(),
    doc="connected components over near-dup pairs (canonical = min doc_id)",
    tags=("dedup", "graph"),
)
def d05(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = minhash_lsh_dedup(_corpus(spark, sf_dir), threshold=0.5).select(
        "id_a", "id_b"
    )
    return connected_components(pairs).orderBy("doc_id")


# ---------------------------------------------------------------------------
# d06 — training-data pipeline composition: near-dup clusters × quality
# scoring → keep the highest-quality document per cluster (tie-break lowest
# doc_id). The canonical "filter + dedup keeping the best copy" step of an
# LLM data pipeline, built entirely from the operators above.
# ---------------------------------------------------------------------------
def _keep_best_oracle() -> str:
    from .text import quality_ctes

    return f"""
    WITH RECURSIVE {_minhash_pairs_ctes()},
    edges AS (SELECT id_a AS src, id_b AS dst FROM verified
              UNION ALL
              SELECT id_b, id_a FROM verified),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(a, b) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    ),
    cc AS (SELECT a AS doc_id, MIN(b) AS cluster FROM reach GROUP BY a),
    {quality_ctes("corpus")},
    member AS (SELECT cc.cluster, cc.doc_id, q.quality_score
               FROM cc JOIN q ON q.doc_id = cc.doc_id),
    ranked AS (SELECT cluster, doc_id, quality_score,
                      ROW_NUMBER() OVER (PARTITION BY cluster
                          ORDER BY quality_score DESC, doc_id) AS rn
               FROM member)
    SELECT cluster,
           MAX(CASE WHEN rn = 1 THEN doc_id END) AS keeper,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MAX(CASE WHEN rn = 1 THEN quality_score END) AS kept_quality
    FROM ranked
    GROUP BY cluster
    ORDER BY cluster
    """


@register(
    "d06_quality_keep_best",
    oracle=_keep_best_oracle(),
    doc="pipeline: near-dup clusters keep the highest-quality copy per cluster",
    tags=("dedup", "quality", "pipeline"),
)
def d06(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from ..operators.text import quality_score

    corpus = _corpus(spark, sf_dir)
    pairs = minhash_lsh_dedup(corpus, threshold=0.5).select("id_a", "id_b")
    cc = connected_components(pairs)
    q = quality_score(corpus.select("doc_id", "text")).select(
        "doc_id", "quality_score"
    )
    member = cc.join(q, "doc_id")
    w = W.partitionBy("cluster").orderBy(F.col("quality_score").desc(), "doc_id")
    ranked = member.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("cluster")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("keeper"),
            F.count("*").cast("bigint").alias("n_members"),
            F.max(F.when(F.col("rn") == 1, F.col("quality_score"))).alias(
                "kept_quality"
            ),
        )
        .orderBy("cluster")
    )


# ---------------------------------------------------------------------------
# d07 — cross-source duplicate-content groups: the order-insensitive
# fingerprint (md5 of the sorted token multiset) catches syndicated copies
# whose token ORDER differs. The synthetic corpus has no natural multiset
# duplicates (verified), so every 17th document is mirrored into a
# 'syndicated' source with its tokens reversed — byte-different text, same
# multiset — and the operator must recover exactly those groups.
# ---------------------------------------------------------------------------
@register(
    "d07_cross_source_duplicates",
    oracle=r"""
    WITH corpus AS (
      SELECT doc_id, text, source FROM documents
      UNION ALL
      SELECT doc_id + 1000000,
             array_to_string(list_reverse(string_split_regex(trim(text), '\s+')), ' '),
             'syndicated'
      FROM documents WHERE doc_id % 17 = 0),
    fps AS (
      SELECT md5(array_to_string(list_sort(string_split_regex(trim(text), '\s+')), ' '))
               AS fingerprint,
             doc_id, source
      FROM corpus)
    SELECT fingerprint,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM fps
    GROUP BY fingerprint
    HAVING COUNT(*) > 1
    ORDER BY min_doc_id
    """,
    doc="cross-source duplicate groups via order-insensitive content "
        "fingerprint (sorted token multiset)",
    tags=("dedup", "fingerprint", "cross-source"),
)
def d07(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import tokens
    from ..operators.dedup import cross_source_duplicate_groups

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    mirrored = docs.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.array_join(F.reverse(tokens("text")), " ").alias("text"),
        F.lit("syndicated").alias("source"),
    )
    corpus = docs.unionByName(mirrored)
    return cross_source_duplicate_groups(corpus).orderBy("min_doc_id")


# ---------------------------------------------------------------------------
# d08 — semantic (embedding-space) dedup: the full composition — cell-
# blocked cosine near-dup pairs → connected components → keeper = cluster
# minimum — over the exact-copy-augmented corpus s03 uses, then rolled up
# per cluster. Singletons stay their own keeper, so the oracle's recursive
# reach CTE is joined back onto the whole corpus with COALESCE.
# ---------------------------------------------------------------------------
def _semantic_dedup_oracle() -> str:
    from .similarity import _cos_sql

    return f"""
    WITH RECURSIVE corpus AS (
      SELECT vec_id, embedding, label FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, embedding, label FROM embeddings
      WHERE vec_id % 20 = 0),
    a AS (SELECT vec_id AS id_a, embedding AS va, label AS cell_a FROM corpus),
    b AS (SELECT vec_id AS id_b, embedding AS vb, label AS cell_b FROM corpus),
    verified AS (
      SELECT id_a, id_b FROM a JOIN b ON cell_a = cell_b AND id_a < id_b
      WHERE {_cos_sql('va', 'vb')} >= 0.999),
    edges AS (SELECT id_a AS src, id_b AS dst FROM verified
              UNION ALL SELECT id_b, id_a FROM verified),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(x, y) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT r.x, e.dst FROM reach r JOIN edges e ON r.y = e.src),
    cc AS (SELECT x AS doc_id, MIN(y) AS cluster FROM reach GROUP BY x),
    assigned AS (
      SELECT corpus.vec_id,
             COALESCE(cc.cluster, corpus.vec_id) AS cluster
      FROM corpus LEFT JOIN cc ON cc.doc_id = corpus.vec_id)
    SELECT cluster,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(CASE WHEN vec_id = cluster THEN 1 ELSE 0 END) AS BIGINT)
             AS n_keepers,
           MAX(vec_id) AS max_member
    FROM assigned
    GROUP BY cluster
    ORDER BY cluster
    """


@register(
    "d08_semantic_dedup",
    oracle=_semantic_dedup_oracle(),
    doc="semantic dedup composition: embedding near-dup pairs -> connected "
        "components -> keeper per cluster, singletons self-kept",
    tags=("dedup", "similarity", "graph", "pipeline"),
)
def d08(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import semantic_dedup
    from ..tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    dup = emb.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.select("vec_id", "embedding", "label").unionAll(dup)
    assigned = semantic_dedup(corpus, threshold=0.999)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count("*").alias("n_members"),
            F.sum(F.col("is_keeper").cast("long")).alias("n_keepers"),
            F.max("vec_id").alias("max_member"),
        )
        .orderBy("cluster")
    )


# ---------------------------------------------------------------------------
# d09 — URL-level duplicate detection (operators/dedup.py url_dedup): the
# crawl-dedup primitive that runs BEFORE content hashing — documents
# citing the same URL are re-crawl/mirror candidates. Synthetic URLs are
# injected with t18's deterministic rule so mirror.net/xN repeats across
# many documents; the decision list is every URL cited by >= 2 distinct
# docs with its canonical keeper (min doc_id).
# ---------------------------------------------------------------------------
@register(
    "d09_url_dedup",
    oracle="""
    WITH docs2 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 9 = 0 THEN
               text || ' https://d' || CAST(doc_id % 5 AS VARCHAR)
                    || '.example.com/p/' || CAST(doc_id AS VARCHAR)
                    || ' see http://mirror.net/x' || CAST(doc_id % 7 AS VARCHAR)
             WHEN doc_id % 4 = 0 THEN
               text || ' http://mirror.net/x' || CAST(doc_id % 7 AS VARCHAR)
             ELSE text END AS text
      FROM documents),
    urls AS (
      SELECT DISTINCT doc_id,
             unnest(regexp_extract_all(text, 'https?://[^\\s]+')) AS url
      FROM docs2)
    SELECT url,
           COUNT(*) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS keeper,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM urls
    GROUP BY url
    HAVING COUNT(*) >= 2
    ORDER BY url
    """,
    doc="dedup: URL-level duplicate decision list (>=2 citing docs, "
        "canonical keeper), crawl-pipeline primitive",
    tags=("dedup", "url", "pipeline"),
)
def d09(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import url_dedup

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 9 == 0,
            F.concat(
                F.col("text"),
                F.lit(" https://d"), (F.col("doc_id") % 5).cast("string"),
                F.lit(".example.com/p/"), F.col("doc_id").cast("string"),
                F.lit(" see http://mirror.net/x"),
                (F.col("doc_id") % 7).cast("string"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.col("text"),
                F.lit(" http://mirror.net/x"),
                (F.col("doc_id") % 7).cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return url_dedup(docs).orderBy("url")


# ---------------------------------------------------------------------------
# d10 — passage-level (sub-document) dedup: the RefinedWeb/CCNet pipeline
# step that strips REPEATED PASSAGES across the corpus instead of whole
# near-duplicate documents. Documents chunk into non-overlapping 25-word
# passages; passages exact-dedup globally (first (doc_id, chunk) wins);
# each document reports its retained fraction — the threshold signal a
# boilerplate filter consumes. One narrow posexplode, ONE shuffle keyed by
# passage, one per-doc rollup; no UDF, no all-pairs step.
# ---------------------------------------------------------------------------
@register(
    "d10_passage_dedup",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    c AS (
      SELECT doc_id, CAST(t.i AS INT) AS chunk_idx,
             array_to_string(w[t.i*25+1 : t.i*25+25], ' ') AS passage
      FROM w, LATERAL (SELECT unnest(generate_series(0,
           CAST(ceil(len(w)/25.0) AS BIGINT) - 1)) AS i) t
    ),
    m AS (SELECT doc_id, chunk_idx,
            CASE WHEN ROW_NUMBER() OVER (PARTITION BY passage
                 ORDER BY doc_id, chunk_idx) = 1 THEN 1 ELSE 0 END AS kept
          FROM c)
    SELECT doc_id,
           COUNT(*) AS n_passages,
           CAST(SUM(kept) AS BIGINT) AS n_kept,
           CAST(SUM(kept) AS DOUBLE) / COUNT(*) AS retained
    FROM m GROUP BY doc_id ORDER BY doc_id
    """,
    doc="dedup: passage-level (25-word window) corpus dedup with per-doc "
        "retained fraction — the sub-document boilerplate-strip recipe",
    tags=("dedup", "passage", "pipeline"),
)
def d10(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return passage_dedup(docs, "doc_id", "text", window=25).orderBy("doc_id")


# ---------------------------------------------------------------------------
# d11 — INCREMENTAL dedup over the native version log: the 100 TB
# operational shape. The base corpus lives in a real `.lance` dataset; a
# new crawl batch appends (DSv2 write, executor-staged); classification
# then touches ONLY the delta — the appended fragments are read
# fragment-restricted (the CDC fan-out unit; parity with
# native_table_changes asserted as a proof column) and joined against the
# base snapshot's fingerprint state (VERSION AS OF the pre-append commit).
# Nothing rescans the base per batch beyond the state build, and in
# steady state that state is the persisted index this query derives.
# Batch docs classify as dup-of-base (fingerprint already in the corpus),
# dup-in-batch (first occurrence wins inside the batch), or unique-new.
# ---------------------------------------------------------------------------
@register(
    "d11_incremental_cdf_dedup",
    oracle="""
    WITH batch_src AS (
      SELECT doc_id + 1000000 AS doc_id,
             text || ' dupword' || CAST(doc_id % 5 AS VARCHAR) AS text
      FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 7 = 0
      UNION ALL
      SELECT doc_id + 4000000,
             text || ' dupword' || CAST(doc_id % 5 AS VARCHAR)
      FROM documents WHERE doc_id % 20 = 0
    ),
    basefp AS (
      SELECT DISTINCT
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
      FROM documents
    ),
    bfp AS (
      SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
      FROM batch_src
    ),
    cls AS (
      SELECT b.doc_id,
             CASE WHEN base.f IS NOT NULL THEN 'dup-of-base'
                  WHEN b.doc_id = MIN(b.doc_id) OVER (PARTITION BY b.f)
                       THEN 'unique-new'
                  ELSE 'dup-in-batch' END AS dup_kind
      FROM bfp b LEFT JOIN basefp base ON b.f = base.f
    )
    SELECT dup_kind,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           TRUE AS cdf_delta_only
    FROM cls GROUP BY dup_kind ORDER BY dup_kind
    """,
    doc="dedup: incremental batch classification over the native version "
        "log — appended fragments read delta-only (CDF parity proven), "
        "joined against the base snapshot's fingerprint state",
    tags=("dedup", "incremental", "cdc", "lance-native", "pipeline"),
)
def d11(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..format.lance_native import (
        create_native_dataset,
        native_table_changes,
        read_native_manifest,
    )
    from ..functions import normalize_text
    from ..sources.lance_datasource import register_lance_datasource
    from ..suite.lance_format import _fresh_path

    path = _fresh_path(sf_dir, "d11-incr")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    create_native_dataset(docs, path)
    v0 = read_native_manifest(path).version
    base_frags = {f.id for f in read_native_manifest(path).fragments}

    near = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" dupword"),
                 (F.col("doc_id") % 5).cast("string")).alias("text"))
    exact = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text")
    near2 = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 4000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" dupword"),
                 (F.col("doc_id") % 5).cast("string")).alias("text"))
    batch = near.unionAll(exact).unionAll(near2)
    register_lance_datasource(spark)
    batch.write.format("lance").mode("append").save(path)

    # the delta plan: ONLY fragments committed after v0 are scheduled
    m1 = read_native_manifest(path)
    new_frags = sorted(f.id for f in m1.fragments if f.id not in base_frags)
    delta = (
        spark.read.format("lance")
        .option("fragments", ",".join(str(i) for i in new_frags))
        .load(path)
    )
    # CDF parity: the version-log diff names exactly the appended rows
    cdf = native_table_changes(path, v0)
    n_batch = batch.count()
    cdf_ok = bool(
        cdf.num_rows == n_batch
        and set(cdf["_change_type"].to_pylist()) == {"insert"}
    )

    base_state = (
        spark.read.format("lance").option("version", str(v0)).load(path)
        .select(F.md5(normalize_text("text")).alias("f"))
        .distinct()
        .withColumn("in_base", F.lit(True))
    )
    d = delta.select("doc_id", F.md5(normalize_text("text")).alias("f"))
    w = Window.partitionBy("f")
    cls = d.join(base_state, "f", "left").withColumn(
        "dup_kind",
        F.when(F.col("in_base").isNotNull(), F.lit("dup-of-base"))
        .when(F.col("doc_id") == F.min("doc_id").over(w),
              F.lit("unique-new"))
        .otherwise(F.lit("dup-in-batch")),
    )
    return (
        cls.groupBy("dup_kind")
        .agg(F.count("*").alias("n"), F.sum("doc_id").alias("id_sum"))
        .withColumn("cdf_delta_only", F.lit(cdf_ok))
        .orderBy("dup_kind")
    )


# ---------------------------------------------------------------------------
# d12 — EXACT-SUBSTRING dedup (the suffix-array method of Lee et al.
# 2022, "Deduplicating Training Data Makes Language Models Better"): two
# documents are duplicates when they share ANY verbatim run of >= 64
# characters; n_dup_windows is the document's duplicated-span mass (the
# quantity the recipe removes). Spark-first: explode stride-1 windows
# (the honest O(total chars) cost a distributed suffix array also
# pays), map-side-combinable groupBy on the window key, semi-join back
# — never an all-pairs join; at scale only the window's xxhash64 rides
# the shuffle (hash_windows=True), the oracle-gated run keys on the raw
# window so DuckDB reproduces it exactly.
# ---------------------------------------------------------------------------
@register(
    "d12_exact_substring_dedup",
    oracle="""
    WITH w AS (
      SELECT DISTINCT doc_id, u.win
      FROM documents, LATERAL UNNEST(
        list_transform(range(1, GREATEST(length(text) - 63, 0) + 1),
                       i -> substr(text, i, 64))) AS u(win)
      WHERE length(text) >= 64
    ), g AS (SELECT win FROM w GROUP BY win HAVING COUNT(*) >= 2)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_windows
    FROM w JOIN g USING (win)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="dedup: exact-substring duplication (Lee et al. suffix-array "
        "recipe) — stride-1 64-char windows, shared-run mass per doc, "
        "groupBy + semi-join shape (no all-pairs)",
    tags=("dedup", "text", "exact-substring"),
)
def d12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import exact_substring_stats

    docs = load_table(spark, sf_dir, "documents")
    return exact_substring_stats(
        docs, "doc_id", "text", window=64, hash_windows=False
    ).orderBy("doc_id")
