"""Text-analysis suite entries: Spark operators from operators/text.py with
DuckDB oracles generated *from the same constants* (marker lists, weights),
so the two dialects cannot drift apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import (
    LANG_MARKERS,
    STOPWORDS,
    fingerprint,
    language_id,
    quality_score,
    token_count,
    token_count_bpe,
)
from ..tables import load_table
from . import register


def _in_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


# ---------------------------------------------------------------------------
# t01 — token statistics per source (whitespace tokenizer).
# ---------------------------------------------------------------------------
@register(
    "t01_token_stats",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(n_tok) AS DOUBLE) / COUNT(*) AS avg_tokens,
           CAST(MIN(n_tok) AS INT) AS min_tokens,
           CAST(MAX(n_tok) AS INT) AS max_tokens
    FROM (SELECT source,
                 len(string_split_regex(trim(text), '\\s+')) AS n_tok
          FROM documents) t
    GROUP BY source
    ORDER BY source
    """,
    doc="token counting: whitespace tokenizer + per-source stats",
    tags=("text", "tokens"),
)
def t01(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("n_tok", token_count("text"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            (F.sum("n_tok").cast("double") / F.count("*")).alias("avg_tokens"),
            F.min("n_tok").alias("min_tokens"),
            F.max("n_tok").alias("max_tokens"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# t02 — language identification (marker-word heuristic) vs labeled lang.
# ---------------------------------------------------------------------------
def _langid_oracle() -> str:
    langs = sorted(LANG_MARKERS)
    score_exprs = ",\n             ".join(
        f"len(list_filter(toks, t -> t IN ({_in_list(LANG_MARKERS[lang])}))) AS score_{lang}"
        for lang in langs
    )
    best = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    case_arms = "\n                ".join(
        f"WHEN score_{lang} = best THEN '{lang}'" for lang in langs
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents),
    scored AS (
      SELECT doc_id, lang,
             {score_exprs}
      FROM tok),
    best_t AS (SELECT *, {best} AS best FROM scored)
    SELECT lang,
           CASE WHEN best = 0 THEN 'und'
                {case_arms}
           END AS lang_pred,
           COUNT(*) AS n
    FROM best_t
    GROUP BY lang, lang_pred
    ORDER BY lang, lang_pred
    """


@register(
    "t02_language_id",
    oracle=_langid_oracle(),
    doc="marker-word language-ID heuristic, confusion counts vs labels",
    tags=("text", "langid"),
)
def t02(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pred = language_id(docs.select("doc_id", "lang", "text"))
    return (
        pred.groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "lang_pred")
    )


# ---------------------------------------------------------------------------
# t03 — per-document quality scores (pure-integer-derived doubles).
# ---------------------------------------------------------------------------
def quality_ctes(source: str = "documents") -> str:
    """CTE chain ending in `q(doc_id, n_tokens, n_stopwords, quality_score)`
    over any `(doc_id, text)` source — shared by t03 and the d06 keep-best
    dedup pipeline (same formula as operators/text.py:quality_score)."""
    stop = _in_list(STOPWORDS)
    return f"""feat AS (
      SELECT doc_id,
             length(text) AS n_chars_m,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             len(list_filter(string_split_regex(trim(text), '\\s+'),
                             t -> t IN ({stop}))) AS n_stopwords,
             length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS n_punct,
             length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha
      FROM {source}),
    q AS (
      SELECT doc_id, n_tokens, n_stopwords,
             0.3::DOUBLE * least(CAST(n_tokens AS DOUBLE) / 100.0::DOUBLE, 1.0::DOUBLE)
           + 0.3::DOUBLE * least(CAST(n_stopwords AS DOUBLE) / greatest(n_tokens, 1) * 5, 1.0::DOUBLE)
           + 0.3::DOUBLE * (CAST(n_alpha AS DOUBLE) / greatest(n_chars_m, 1))
           - 0.1::DOUBLE * least(CAST(n_punct AS DOUBLE) / greatest(n_chars_m, 1) * 10, 1.0::DOUBLE)
             AS quality_score
      FROM feat)"""


def _quality_oracle() -> str:
    return f"""
    WITH {quality_ctes("documents")}
    SELECT doc_id, n_tokens, n_stopwords, quality_score
    FROM q
    ORDER BY doc_id
    """


@register(
    "t03_quality_scores",
    oracle=_quality_oracle(),
    doc="document quality scoring from length/stopword/punct features",
    tags=("text", "quality"),
)
def t03(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        quality_score(docs.select("doc_id", "text"))
        .select("doc_id", "n_tokens", "n_stopwords", "quality_score")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# t04 — document fingerprinting (md5 of normalized text).
# ---------------------------------------------------------------------------
@register(
    "t04_fingerprints",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
    FROM documents
    ORDER BY doc_id
    """,
    doc="md5 fingerprint of whitespace-normalized lowercase text",
    tags=("text", "fingerprint"),
)
def t04(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return fingerprint(docs.select("doc_id", "text")).select("doc_id", "fingerprint").orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# t05 — benchmark decontamination: training docs sharing >= 2 distinct word
# 3-gram shingles with a "benchmark" set (every 97th document stands in for
# the eval prompts). Broadcast benchmark join — zero corpus shuffle.
# ---------------------------------------------------------------------------
@register(
    "t05_contamination",
    oracle="""
    WITH bench AS (
      SELECT doc_id AS bench_id, text FROM documents WHERE doc_id % 97 = 0
    ),
    dsh AS (
      SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i
            FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
                  FROM documents) t0) t1
    ),
    bsh AS (
      SELECT DISTINCT bench_id, array_to_string(toks[i:i+2], ' ') AS shingle
      FROM (SELECT bench_id, toks,
                   unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i
            FROM (SELECT bench_id, string_split_regex(trim(text), '\\s+') AS toks
                  FROM bench) t0) t1
    )
    SELECT d.doc_id, b.bench_id, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM dsh d JOIN bsh b ON d.shingle = b.shingle
    GROUP BY d.doc_id, b.bench_id
    HAVING COUNT(*) >= 2
    ORDER BY doc_id, bench_id
    """,
    doc="decontamination: word-shingle overlap vs broadcast benchmark set",
    tags=("text", "contamination", "pipeline"),
)
def t05(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import contamination_check

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return contamination_check(docs, bench, k=3, min_overlap=2).orderBy(
        "doc_id", "bench_id"
    )


# ---------------------------------------------------------------------------
# t06 — deterministic stratified sampling (data mixing): per-source keep
# fractions decided by a salted hash of the doc id — reproducible across
# runs and engines, no shuffle, no global count.
# ---------------------------------------------------------------------------
@register(
    "t06_stratified_sample",
    oracle="""
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM (
      SELECT source, doc_id,
             ('0x' || substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 10000 AS bucket
      FROM documents) t
    WHERE bucket < (CASE source
                    WHEN 'src0' THEN 2000
                    WHEN 'src1' THEN 8000
                    WHEN 'src2' THEN 5000
                    ELSE 1000 END)
    GROUP BY source
    ORDER BY source
    """,
    doc="data mixing: deterministic hash-bucket stratified sampling per source",
    tags=("text", "sampling", "pipeline"),
)
def t06(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents").select("source", "doc_id")
    kept = stratified_sample(
        docs,
        "source",
        {"src0": 0.2, "src1": 0.8, "src2": 0.5},
        id_col="doc_id",
        salt="mix",
        default_fraction=0.1,
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.min("doc_id").alias("first_doc"),
            F.sum("doc_id").alias("id_sum"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# t07 — PII redaction: emails/phones/IPv4 → placeholder tokens. Synthetic
# PII is injected deterministically into every 13th document (both dialects
# build the identical augmented corpus), then counts and the md5 of the
# redacted text must agree byte-for-byte.
# ---------------------------------------------------------------------------
def _pii_oracle() -> str:
    from ..operators.text import PII_PATTERNS

    email, phone, ip = (p for _, p, _ in PII_PATTERNS)
    tok = {k: t for k, _, t in PII_PATTERNS}
    return (
        """
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 13 = 0
                  THEN text || ' reach user' || CAST(doc_id AS VARCHAR)
                       || '@mail.com via 415-555-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       || ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
                  ELSE text END AS text
      FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '"""
        + email
        + """')) AS INT) AS n_email,
           CAST(len(regexp_extract_all(text, '"""
        + phone
        + """')) AS INT) AS n_phone,
           CAST(len(regexp_extract_all(text, '"""
        + ip
        + """')) AS INT) AS n_ipv4,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '"""
        + email
        + "', '"
        + tok["email"]
        + """', 'g'),
               '"""
        + phone
        + "', '"
        + tok["phone"]
        + """', 'g'),
               '"""
        + ip
        + "', '"
        + tok["ipv4"]
        + """', 'g')) AS redacted_md5
    FROM aug ORDER BY doc_id
    """
    )


@register(
    "t07_pii_redaction",
    oracle=_pii_oracle(),
    doc="PII scrub: email/phone/IPv4 redaction with per-kind counts",
    tags=("text", "pii", "pipeline"),
)
def t07(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import redact_pii

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 13 == 0,
            F.concat(
                F.col("text"),
                F.lit(" reach user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.com via 415-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                F.lit(" at 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".1"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return (
        redact_pii(docs)
        .select(
            "doc_id",
            "n_email",
            "n_phone",
            "n_ipv4",
            F.md5("redacted").alias("redacted_md5"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# t08 — context-window chunking: overlapping fixed-token windows (32 tokens,
# stride 24), the standard pre-tokenization packing prep. Chunk boundaries,
# counts, and chunk text md5s must agree exactly with the oracle.
# ---------------------------------------------------------------------------
@register(
    "t08_document_chunking",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents),
    n AS (
      SELECT doc_id, toks,
             greatest(CAST(ceil((len(toks) - 32) / 24.0) AS INT) + 1, 1)
               AS n_chunks
      FROM tok),
    ch AS (
      SELECT doc_id, toks,
             CAST(unnest(generate_series(0, n_chunks - 1)) AS INT) AS chunk_id
      FROM n)
    SELECT doc_id, chunk_id,
           CAST(len(toks[chunk_id*24+1 : chunk_id*24+32]) AS INT)
             AS chunk_n_tokens,
           md5(array_to_string(toks[chunk_id*24+1 : chunk_id*24+32], ' '))
             AS chunk_md5
    FROM ch
    ORDER BY doc_id, chunk_id
    """,
    doc="context-window chunking: overlapping token windows, exact boundaries",
    tags=("text", "chunking", "pipeline"),
)
def t08(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import chunk_documents

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        chunk_documents(docs, chunk_tokens=32, stride=24)
        .select(
            "doc_id",
            "chunk_id",
            "chunk_n_tokens",
            F.md5("chunk_text").alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_id")
    )


# ---------------------------------------------------------------------------
# t09 — repetition signals: duplicate word-3-gram ratio and top-token
# dominance per document (boilerplate / generation-loop filter signals).
# ---------------------------------------------------------------------------
@register(
    "t09_repetition_stats",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents),
    grams AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) >= 3
                  THEN [array_to_string(toks[i:i+2], ' ')
                        FOR i IN generate_series(1, len(toks) - 2)]
                  ELSE [] END AS sh
      FROM tok),
    top AS (
      SELECT doc_id,
             (SELECT MAX(cnt) FROM (
                SELECT COUNT(*) AS cnt FROM unnest(toks) AS u(t) GROUP BY t))
               AS top_count,
             len(toks) AS n_tok
      FROM tok)
    SELECT g.doc_id,
           CAST(len(g.sh) AS INT) AS n_grams,
           CAST(len(list_distinct(g.sh)) AS INT) AS n_distinct_grams,
           CASE WHEN len(g.sh) > 0
                THEN 1.0 - CAST(len(list_distinct(g.sh)) AS DOUBLE)
                           / CAST(len(g.sh) AS DOUBLE)
                ELSE 0.0 END AS dup_gram_ratio,
           CAST(t.top_count AS DOUBLE) / CAST(greatest(t.n_tok, 1) AS DOUBLE)
             AS top_token_ratio
    FROM grams g JOIN top t USING (doc_id)
    ORDER BY g.doc_id
    """,
    doc="repetition filter signals: dup-3gram ratio + top-token dominance",
    tags=("text", "quality", "pipeline"),
)
def t09(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import repetition_stats

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        repetition_stats(docs)
        .select(
            "doc_id",
            "n_grams",
            "n_distinct_grams",
            "dup_gram_ratio",
            "top_token_ratio",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# t10 — Gopher-style rule-based quality filtering: per-source counts of
# documents passing each rule (oracle generated from the same constants).
# ---------------------------------------------------------------------------
def _gopher_oracle() -> str:
    from ..operators.text import (
        GOPHER_MAX_SYMBOL_RATIO,
        GOPHER_MAX_WORDS,
        GOPHER_MEAN_WORD_LEN,
        GOPHER_MIN_ALPHA_WORD_RATIO,
        GOPHER_MIN_DISTINCT_STOPWORDS,
        GOPHER_MIN_WORDS,
    )

    stop = _in_list(STOPWORDS)
    return f"""
    WITH tok AS (
      SELECT doc_id, source, text,
             string_split_regex(trim(text), '\\s+') AS toks
      FROM documents),
    rules AS (
      SELECT source,
             (len(toks) >= {GOPHER_MIN_WORDS} AND len(toks) <= {GOPHER_MAX_WORDS})
               AS rule_word_count,
             (CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                / CAST(greatest(len(toks), 1) AS DOUBLE) >= {GOPHER_MEAN_WORD_LEN[0]}
              AND CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                / CAST(greatest(len(toks), 1) AS DOUBLE) <= {GOPHER_MEAN_WORD_LEN[1]})
               AS rule_mean_word_len,
             (CAST(len(regexp_extract_all(text, '#'))
                   + len(regexp_extract_all(text, '\\.\\.\\.')) AS DOUBLE)
                / CAST(greatest(len(toks), 1) AS DOUBLE) < {GOPHER_MAX_SYMBOL_RATIO})
               AS rule_symbol_ratio,
             (CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]'))) AS DOUBLE)
                / CAST(greatest(len(toks), 1) AS DOUBLE) >= {GOPHER_MIN_ALPHA_WORD_RATIO})
               AS rule_alpha_words,
             (len(list_distinct(list_filter(toks, t -> t IN ({stop}))))
                >= {GOPHER_MIN_DISTINCT_STOPWORDS})
               AS rule_stopwords
      FROM tok)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN rule_word_count THEN 1 ELSE 0 END) AS BIGINT) AS n_word_count,
           CAST(SUM(CASE WHEN rule_mean_word_len THEN 1 ELSE 0 END) AS BIGINT) AS n_mean_word_len,
           CAST(SUM(CASE WHEN rule_symbol_ratio THEN 1 ELSE 0 END) AS BIGINT) AS n_symbol_ratio,
           CAST(SUM(CASE WHEN rule_alpha_words THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha_words,
           CAST(SUM(CASE WHEN rule_stopwords THEN 1 ELSE 0 END) AS BIGINT) AS n_stopwords_rule,
           CAST(SUM(CASE WHEN rule_word_count AND rule_mean_word_len
                          AND rule_symbol_ratio AND rule_alpha_words
                          AND rule_stopwords THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
    FROM rules
    GROUP BY source
    ORDER BY source
    """


@register(
    "t10_gopher_quality_filter",
    oracle=_gopher_oracle(),
    doc="Gopher rule-based quality filter: per-source rule pass counts",
    tags=("text", "quality", "pipeline"),
)
def t10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import gopher_quality_filter

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    rules = gopher_quality_filter(docs)
    as_int = lambda c: F.col(c).cast("long")  # noqa: E731
    return (
        rules.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(as_int("rule_word_count")).alias("n_word_count"),
            F.sum(as_int("rule_mean_word_len")).alias("n_mean_word_len"),
            F.sum(as_int("rule_symbol_ratio")).alias("n_symbol_ratio"),
            F.sum(as_int("rule_alpha_words")).alias("n_alpha_words"),
            F.sum(as_int("rule_stopwords")).alias("n_stopwords_rule"),
            F.sum(as_int("keep")).alias("n_keep"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# t11 — accent folding / canonical normalization. Accented text is injected
# deterministically into every 11th document (both dialects build the same
# augmented corpus), then the fold must agree byte-for-byte via md5.
# ---------------------------------------------------------------------------
_ACCENT_PREFIX = "Café naïve jalapeño über façade — "


def _accent_oracle() -> str:
    from ..operators.text import ACCENT_FROM, ACCENT_TO

    return f"""
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 0
                  THEN '{_ACCENT_PREFIX}' || text ELSE text END AS text
      FROM documents)
    SELECT doc_id,
           md5(trim(regexp_replace(
               translate(lower(text), '{ACCENT_FROM}', '{ACCENT_TO}'),
               '\\s+', ' ', 'g'))) AS folded_md5,
           CAST(length(text)
                - length(translate(text, '{ACCENT_FROM}{ACCENT_FROM.upper()}', ''))
             AS INT) AS n_accented
    FROM aug
    ORDER BY doc_id
    """


@register(
    "t11_accent_fold",
    oracle=_accent_oracle(),
    doc="accent folding + canonical normalization (fixed translate table)",
    tags=("text", "normalize", "pipeline"),
)
def t11(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import ACCENT_FROM, fold_accents

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.lit(_ACCENT_PREFIX), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    both_cases = ACCENT_FROM + ACCENT_FROM.upper()
    return docs.select(
        "doc_id",
        F.md5(fold_accents("text")).alias("folded_md5"),
        (
            F.length("text") - F.length(F.translate(F.col("text"), both_cases, ""))
        ).cast("int").alias("n_accented"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# t12 — data-mixing weights: reshape the observed per-source distribution
# into a target mixture; weight = target/observed capped at 10x.
# ---------------------------------------------------------------------------
_MIX_TARGETS = {"src0": 0.5, "src1": 0.2, "src2": 0.3}


def _mix_oracle() -> str:
    cases = " ".join(
        f"WHEN '{s}' THEN {f!r}::DOUBLE" for s, f in sorted(_MIX_TARGETS.items())
    )
    return f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_rows FROM documents GROUP BY source),
    tot AS (SELECT SUM(n_rows) AS n_total FROM counts)
    SELECT source, n_rows,
           CAST(n_rows AS DOUBLE) / CAST(n_total AS DOUBLE) AS observed_fraction,
           (CASE source {cases} ELSE 0.0::DOUBLE END) AS target_fraction,
           least((CASE source {cases} ELSE 0.0::DOUBLE END)
                 / (CAST(n_rows AS DOUBLE) / CAST(n_total AS DOUBLE)),
                 10.0::DOUBLE) AS weight
    FROM counts, tot
    ORDER BY source
    """


@register(
    "t12_source_mix_weights",
    oracle=_mix_oracle(),
    doc="data-mixing: per-source sampling weights toward a target mixture",
    tags=("text", "sampling", "pipeline"),
)
def t12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import source_mix_weights

    docs = load_table(spark, sf_dir, "documents").select("source")
    return source_mix_weights(docs, "source", _MIX_TARGETS).orderBy("source")


# ---------------------------------------------------------------------------
# t13 — sequence-packing plan: contiguous token-budget bin assignment per
# source via window cumsum (the pre-tokenization packing step).
# ---------------------------------------------------------------------------
@register(
    "t13_sequence_packing",
    oracle="""
    WITH tok AS (
      SELECT source, doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens
      FROM documents),
    cum AS (
      SELECT source, doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS tokens_before
      FROM tok),
    plan AS (
      SELECT source, doc_id, n_tokens,
             CAST(tokens_before // 2048 AS BIGINT) AS bin,
             tokens_before % 2048 AS offset_in_bin
      FROM cum)
    SELECT source, bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(offset_in_bin) AS BIGINT) AS max_offset
    FROM plan
    GROUP BY source, bin
    ORDER BY source, bin
    """,
    doc="sequence packing: contiguous token-budget bins via window cumsum",
    tags=("text", "packing", "pipeline"),
)
def t13(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import sequence_packing_plan

    docs = load_table(spark, sf_dir, "documents").select("source", "doc_id", "text")
    plan = sequence_packing_plan(
        docs, order_col="doc_id", group_col="source", token_budget=2048
    )
    return (
        plan.groupBy("source", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("offset_in_bin").alias("max_offset"),
        )
        .orderBy("source", "bin")
    )


# ---------------------------------------------------------------------------
# t14 — link-density boilerplate signal. URLs are injected deterministically
# into every 9th document so both dialects score the identical corpus.
# ---------------------------------------------------------------------------
def _link_oracle() -> str:
    from ..operators.text import URL_PATTERN

    return f"""
    WITH aug AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 9 = 0
                  THEN text || ' see https://ex.org/a/' || CAST(doc_id AS VARCHAR)
                       || ' and http://b.io/p' || CAST(doc_id % 7 AS VARCHAR)
                  ELSE text END AS text
      FROM documents),
    sig AS (
      SELECT doc_id, source,
             CAST(len(regexp_extract_all(text, '{URL_PATTERN}')) AS INT) AS n_urls,
             CAST(length(text) - length(regexp_replace(text, '{URL_PATTERN}', '', 'g'))
               AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE)
               AS link_char_ratio
      FROM aug)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN n_urls > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_with_links,
           CAST(SUM(n_urls) AS BIGINT) AS total_urls,
           MAX(link_char_ratio) AS max_ratio
    FROM sig
    GROUP BY source
    ORDER BY source
    """


@register(
    "t14_link_density",
    oracle=_link_oracle(),
    doc="link-density boilerplate signal (URL count + char ratio)",
    tags=("text", "quality", "pipeline"),
)
def t14(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import link_density

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 9 == 0,
            F.concat(
                F.col("text"),
                F.lit(" see https://ex.org/a/"),
                F.col("doc_id").cast("string"),
                F.lit(" and http://b.io/p"),
                (F.col("doc_id") % 7).cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    sig = link_density(docs)
    return (
        sig.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("n_urls") > 0).cast("long")).alias("n_with_links"),
            F.sum("n_urls").alias("total_urls"),
            F.max("link_char_ratio").alias("max_ratio"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# t15 — rare-ngram novelty (operators/text.py rare_ngram_novelty): fraction
# of each document's distinct bigrams that are corpus-rare (df <= 2). The
# oracle rebuilds the identical distinct bigram-hash sets (same md5-derived
# 32-bit hashes as the dedup family), so counts and the single double
# division match bitwise.
# ---------------------------------------------------------------------------
@register(
    "t15_rare_ngram_novelty",
    oracle="""
    WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
                 FROM documents),
    pos AS (SELECT doc_id, toks,
                   unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS i
            FROM tok),
    sh0 AS (SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS shingle FROM pos),
    sh AS (SELECT DISTINCT doc_id,
                  ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh0),
    freq AS (SELECT h, COUNT(*) AS df_ FROM sh GROUP BY h),
    per_doc AS (
      SELECT sh.doc_id, COUNT(*) AS n_ngrams,
             CAST(SUM(CASE WHEN freq.df_ <= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rare
      FROM sh JOIN freq ON sh.h = freq.h
      GROUP BY sh.doc_id)
    SELECT doc_id, n_ngrams, n_rare,
           CAST((n_rare * 1000000) // n_ngrams AS BIGINT) AS novelty_ppm
    FROM per_doc
    ORDER BY doc_id
    """,
    doc="text: rare-bigram novelty score (corpus-df inverted index)",
    tags=("text", "quality", "ngram"),
)
def t15(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import rare_ngram_novelty

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # driver-proof projection (registry contract: no FP outputs in
    # oracle-gated queries): the double `novelty` ratio becomes integer
    # parts-per-million via exact integer floor-division; the raw counts
    # stay in the output so nothing is lost.
    return (
        rare_ngram_novelty(docs, k=2, max_df=2)
        .select(
            "doc_id",
            "n_ngrams",
            "n_rare",
            F.expr("(n_rare * 1000000L) div n_ngrams").alias("novelty_ppm"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# t16 — corpus token histogram (distributed wordcount + Zipf view): global
# top-20 tokens with exact counts and frequency-per-10k shares. Shares are
# raw IEEE divisions of exact integers, so both engines produce identical
# doubles with no rounding step.
# ---------------------------------------------------------------------------
@register(
    "t16_corpus_token_histogram",
    oracle=r"""
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
      FROM documents),
    counts AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n
               FROM toks WHERE token <> '' GROUP BY token),
    total AS (SELECT CAST(SUM(n) AS BIGINT) AS total_tokens FROM counts),
    ranked AS (SELECT token, n,
                      CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) AS BIGINT)
                        AS rank
               FROM counts)
    SELECT rank, token, n, n * 10000.0 / total_tokens AS freq_per_10k
    FROM ranked, total
    WHERE rank <= 20
    ORDER BY rank
    """,
    doc="corpus-level wordcount: top-20 tokens, exact counts + freq shares",
    tags=("text", "corpus", "histogram"),
)
def t16(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import corpus_token_histogram

    return corpus_token_histogram(load_table(spark, sf_dir, "documents"), top_n=20)


# ---------------------------------------------------------------------------
# t17 — per-source vocabulary health: token volume, distinct vocabulary,
# type/token ratio, tokens/doc. Ratios are divisions of exact BIGINTs —
# deterministic doubles in both engines.
# ---------------------------------------------------------------------------
@register(
    "t17_vocab_stats_by_source",
    oracle=r"""
    WITH toks AS (
      SELECT source, doc_id,
             unnest(string_split_regex(trim(text), '\s+')) AS token
      FROM documents)
    SELECT source,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT token) AS BIGINT) AS n_types,
           CAST(COUNT(DISTINCT token) AS DOUBLE) / COUNT(*) AS type_token_ratio,
           CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT doc_id) AS tokens_per_doc
    FROM toks WHERE token <> ''
    GROUP BY source
    ORDER BY source
    """,
    doc="per-source vocabulary stats: volume, types, TTR, tokens/doc",
    tags=("text", "corpus", "vocab"),
)
def t17(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import vocab_stats_by_source

    return vocab_stats_by_source(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# t18 — per-domain URL statistics (operators/text.url_domain_stats): the
# crawl-curation half of the URL story (t14 scores documents; this scores
# DOMAINS for allow/block lists and per-domain dedup budgets). URLs are
# synthesized deterministically like t14 (the synthetic corpus has none).
# ---------------------------------------------------------------------------
@register(
    "t18_url_domain_stats",
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
      SELECT doc_id, unnest(regexp_extract_all(text, 'https?://[^\\s]+')) AS url
      FROM docs2),
    parsed AS (
      SELECT doc_id, url,
             regexp_extract(url, 'https?://([^/\\s]+)', 1) AS domain
      FROM urls)
    SELECT domain,
           COUNT(*) AS n_urls,
           COUNT(DISTINCT doc_id) AS n_docs,
           MIN(url) AS sample_url
    FROM parsed
    GROUP BY domain
    ORDER BY domain
    """,
    doc="text pipeline: per-domain URL counts, linking-doc counts and a "
        "deterministic sample URL (domain allow/block-list input)",
    tags=("text", "url", "pipeline"),
)
def t18(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import url_domain_stats

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
    return url_domain_stats(docs).orderBy("domain")


# ---------------------------------------------------------------------------
# t19 — temperature-scaled source mixing (operators/sampling.py
# temperature_mix): the standard multi-source LLM recipe — sampling shares
# p_s ∝ n_s^(1/T) flatten the source distribution as T drops; rows kept by
# the same engine-replayable hash-bucket rule as t06. With 1/T = 2 the
# pow/sum arithmetic stays on exact integers inside doubles, so the rates
# (and therefore every kept row) match DuckDB bit-for-bit.
# ---------------------------------------------------------------------------
@register(
    "t19_temperature_mix",
    oracle="""
    WITH counts AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows FROM documents
      GROUP BY source),
    powed AS (
      SELECT source, n_rows, pow(CAST(n_rows AS DOUBLE), 2.0) AS p_raw
      FROM counts),
    tot AS (SELECT SUM(p_raw) AS z FROM powed),
    rates AS (
      SELECT source,
             LEAST(1.0, 2000.0 * (p_raw / z) / CAST(n_rows AS DOUBLE)) AS rate
      FROM powed, tot),
    kept AS (
      SELECT d.source, d.doc_id
      FROM documents d JOIN rates r ON d.source = r.source
      WHERE ('0x' || substr(md5('tmix19' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
              % 10000 < FLOOR(r.rate * 10000))
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM kept
    GROUP BY source
    ORDER BY source
    """,
    doc="data-mixing: temperature-scaled source sampling (p ~ n^(1/T), "
        "deterministic hash acceptance)",
    tags=("text", "sampling", "pipeline", "mixing"),
)
def t19(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import temperature_mix

    docs = load_table(spark, sf_dir, "documents").select("source", "doc_id")
    kept = temperature_mix(
        docs, "source", "doc_id",
        inv_temperature=2.0, target_rows=2000, salt="tmix19",
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# t20 — per-source boilerplate n-gram coverage (operators/text.py
# boilerplate_by_source): the inverse lens of t15 — the share of each
# source's distinct 5-grams that are corpus-common (df >= 3), the standard
# signal for template-heavy sources needing cleaning. The oracle rebuilds
# the identical distinct shingle-hash sets (same md5-derived 32-bit
# hashes as the dedup family), so every count matches bitwise.
# ---------------------------------------------------------------------------
@register(
    "t20_boilerplate_by_source",
    oracle="""
    WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
                 FROM documents),
    pos AS (SELECT doc_id, toks,
                   unnest(generate_series(1, greatest(len(toks) - 4, 0))) AS i
            FROM tok),
    sh0 AS (SELECT doc_id, array_to_string(toks[i:i+4], ' ') AS shingle FROM pos),
    sh AS (SELECT DISTINCT doc_id,
                  ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh0),
    freq AS (SELECT h, COUNT(*) AS df_ FROM sh GROUP BY h),
    per_doc AS (
      SELECT sh.doc_id, COUNT(*) AS n_ngrams,
             CAST(SUM(CASE WHEN freq.df_ >= 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_boiler
      FROM sh JOIN freq ON sh.h = freq.h
      GROUP BY sh.doc_id)
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(SUM(p.n_ngrams) AS BIGINT) AS total_ngrams,
           CAST(SUM(p.n_boiler) AS BIGINT) AS boiler_ngrams,
           CAST((SUM(p.n_boiler) * 1000000) // SUM(p.n_ngrams) AS BIGINT)
             AS boiler_ppm
    FROM per_doc p JOIN documents d ON p.doc_id = d.doc_id
    GROUP BY d.source
    ORDER BY d.source
    """,
    doc="text: per-source boilerplate 5-gram coverage (corpus-df inverted "
        "index + dimension rollup)",
    tags=("text", "quality", "ngram", "boilerplate"),
)
def t20(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import boilerplate_by_source

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    return (
        boilerplate_by_source(docs, k=5, min_df=3)
        .select(
            "source",
            "n_docs",
            "total_ngrams",
            "boiler_ngrams",
            "boiler_ppm",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# t21 — the end-to-end training-data funnel, composed from the pipeline
# operators the suite gates individually: exact dedup (keep-min-id per
# normalized-text fingerprint, t04's key) -> quality gate (t03's composite
# score >= 0.5) -> deterministic hash-bucket sampling (t06's rule, 50%).
# Output is the per-source funnel: totals at each stage plus the sampled
# token budget — the numbers a data-curation run actually reports. Every
# stage is a narrow projection or a single shuffle; the funnel aggregates
# are four small per-source rollups joined on the source key.
# ---------------------------------------------------------------------------
@register(
    "t21_pipeline_funnel",
    oracle=f"""
    WITH keepers AS (
      SELECT MIN(doc_id) AS doc_id
      FROM (SELECT doc_id,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                     AS fp
            FROM documents) t
      GROUP BY fp),
    uniq AS (
      SELECT d.* FROM documents d JOIN keepers k ON d.doc_id = k.doc_id),
    {quality_ctes("uniq")},
    qual AS (
      SELECT u.doc_id, u.source, q.n_tokens
      FROM uniq u JOIN q ON u.doc_id = q.doc_id
      WHERE q.quality_score >= 0.5),
    sampled AS (
      SELECT * FROM qual
      WHERE ('0x' || substr(md5('pipe' || CAST(doc_id AS VARCHAR)), 1, 8))
              ::BIGINT % 10000
            < (CASE source WHEN 'src0' THEN 2000
                           WHEN 'src1' THEN 8000
                           ELSE 5000 END)),
    s_total AS (SELECT source, COUNT(*) AS n_total FROM documents GROUP BY source),
    s_uniq AS (SELECT source, COUNT(*) AS n_unique FROM uniq GROUP BY source),
    s_qual AS (SELECT source, COUNT(*) AS n_quality FROM qual GROUP BY source),
    s_samp AS (SELECT source, COUNT(*) AS n_sampled,
                      CAST(SUM(n_tokens) AS BIGINT) AS tokens_sampled
               FROM sampled GROUP BY source)
    SELECT t.source,
           t.n_total,
           COALESCE(u.n_unique, 0) AS n_unique,
           COALESCE(ql.n_quality, 0) AS n_quality,
           COALESCE(sp.n_sampled, 0) AS n_sampled,
           COALESCE(sp.tokens_sampled, 0) AS tokens_sampled
    FROM s_total t
    LEFT JOIN s_uniq u ON t.source = u.source
    LEFT JOIN s_qual ql ON t.source = ql.source
    LEFT JOIN s_samp sp ON t.source = sp.source
    ORDER BY t.source
    """,
    doc="pipeline: dedup -> quality gate -> deterministic sample, "
        "per-source funnel counts + sampled token budget",
    tags=("text", "pipeline", "dedup", "quality", "sampling"),
)
def t21(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import normalize_text
    from ..operators.sampling import stratified_sample
    from ..operators.text import quality_score as _qs

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    keepers = (
        docs.select("doc_id", F.md5(normalize_text("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    uniq = docs.join(keepers, "doc_id")
    qual = (
        _qs(uniq)
        .filter(F.col("quality_score") >= 0.5)
        .select("doc_id", "source", "n_tokens")
    )
    sampled = stratified_sample(
        qual, "source", {"src0": 0.2, "src1": 0.8},
        id_col="doc_id", salt="pipe", default_fraction=0.5,
    )
    s_total = docs.groupBy("source").agg(F.count("*").alias("n_total"))
    s_uniq = uniq.groupBy("source").agg(F.count("*").alias("n_unique"))
    s_qual = qual.groupBy("source").agg(F.count("*").alias("n_quality"))
    s_samp = sampled.groupBy("source").agg(
        F.count("*").alias("n_sampled"),
        F.sum("n_tokens").alias("tokens_sampled"),
    )
    return (
        s_total.join(s_uniq, "source", "left")
        .join(s_qual, "source", "left")
        .join(s_samp, "source", "left")
        .select(
            "source",
            "n_total",
            F.coalesce("n_unique", F.lit(0)).alias("n_unique"),
            F.coalesce("n_quality", F.lit(0)).alias("n_quality"),
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
            F.coalesce("tokens_sampled", F.lit(0)).alias("tokens_sampled"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# t22 — bigram-coverage LM quality proxy (the CCNet recipe, engine-exact):
# train a tiny "language model" = the top-K corpus bigrams (count desc,
# bigram asc — fully deterministic), then score every document by what
# fraction of ITS bigrams the model covers. Low coverage ⇒ out-of-domain
# or noisy text — the quality-filter signal CCNet thresholds with a real
# LM, reproduced here with exact integer counts so two engines agree
# bit-for-bit (no floating logprob sums, which are summation-order
# dependent). Scale shape: ONE bigram-count shuffle + a window for the
# top-K + a BROADCAST of the K-row model back onto the corpus + one
# per-source rollup. No UDFs.
# ---------------------------------------------------------------------------
@register(
    "t22_bigram_coverage",
    oracle="""
    WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS w
               FROM documents),
    bg AS (
      SELECT doc_id, source, w[t.i] || ' ' || w[t.i + 1] AS bg
      FROM w, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) t
      WHERE len(w) >= 2
    ),
    model AS (
      SELECT bg FROM (
        SELECT bg, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, bg ASC) AS rk
        FROM bg GROUP BY bg) WHERE rk <= 2000
    ),
    scored AS (
      SELECT b.doc_id, b.source,
             COUNT(*) AS n_bg,
             SUM(CASE WHEN m.bg IS NOT NULL THEN 1 ELSE 0 END) AS n_in
      FROM bg b LEFT JOIN model m ON b.bg = m.bg
      GROUP BY b.doc_id, b.source
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_bg) AS BIGINT) AS n_bigrams,
           CAST(SUM(n_in) AS BIGINT) AS n_covered,
           CAST(SUM(n_in) AS DOUBLE) / SUM(n_bg) AS coverage
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
    doc="text: bigram-coverage LM quality proxy (top-2000 corpus bigram "
        "model, exact integer coverage per source — the CCNet filter shape)",
    tags=("text", "quality", "lm", "pipeline"),
)
def t22(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", "source", F.split("text", " ").alias("w")
    )
    # the <2-word guard lives INSIDE the expression (empty array -> zero
    # exploded rows), not as a Filter node the scan can't push
    bg = w.select(
        "doc_id", "source",
        F.explode(F.expr(
            "CASE WHEN size(w) >= 2 THEN "
            "transform(sequence(0, size(w) - 2), "
            "i -> concat(w[int(i)], ' ', w[int(i) + 1])) "
            "ELSE array() END"
        )).alias("bg"),
    )
    # orderBy + limit plans as TakeOrderedAndProject — a DISTRIBUTED
    # per-partition top-K + driver merge, not the single-task global sort
    # a row_number window would be; ties break on the bigram string so the
    # model set is deterministic in both engines
    model = (
        bg.groupBy("bg").agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("bg").asc())
        .limit(2000)
        .select("bg", F.lit(1).alias("in_model"))
    )
    scored = (
        bg.join(F.broadcast(model), "bg", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_bg"),
            F.sum(F.coalesce("in_model", F.lit(0))).alias("n_in"),
        )
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bg").alias("n_bigrams"),
            F.sum("n_in").alias("n_covered"),
            (F.sum("n_in").cast("double") / F.sum("n_bg")).alias("coverage"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# t23 — BPE-ish pre-tokenizer inflation (token-budget estimation). The
# cheap subword proxy every token-budget planner runs before paying for a
# real BPE pass: split on digit/letter transitions and punctuation, then
# compare against the whitespace count — the inflation ratio (in exact
# integer ppm) is the per-source fudge factor between "words" and "BPE
# tokens". Runs over a synthesized log-line corpus (event_type ||
# user_id || ' ' || props) because it exercises BOTH split rules:
# 'click42' hits the letter->digit transition, the JSON props hit the
# punctuation rule. Pure built-ins (regexp_replace/split/size), zero
# Python in the hot path; one map-side-combinable groupBy.
# ---------------------------------------------------------------------------
@register(
    "t23_bpe_token_inflation",
    oracle=r"""
    WITH msg AS (
      SELECT event_type,
             event_type || CAST(user_id AS VARCHAR) || ' ' || props AS m
      FROM events
    ),
    b AS (
      SELECT event_type,
             len(regexp_split_to_array(trim(m), '\s+')) AS ws_n,
             len(regexp_split_to_array(trim(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(m, '(\d)([a-zA-Z])', '\1 \2', 'g'),
                   '([a-zA-Z])(\d)', '\1 \2', 'g'),
                 '([.,!?;:])', ' \1 ', 'g')), '\s+')) AS bpe_n
      FROM msg
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(ws_n) AS BIGINT) AS ws_tokens,
           CAST(SUM(bpe_n) AS BIGINT) AS bpe_tokens,
           CAST(SUM(bpe_n) * 1000000 // SUM(ws_n) AS BIGINT)
             AS inflation_ppm
    FROM b GROUP BY event_type ORDER BY event_type
    """,
    doc="text: BPE-ish pre-tokenizer inflation vs whitespace tokens "
        "(integer ppm) over synthesized log lines — the token-budget "
        "fudge factor",
    tags=("text", "tokens", "bpe", "pipeline"),
)
def t23(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    msg = ev.select(
        "event_type",
        F.concat(
            F.col("event_type"), F.col("user_id").cast("string"),
            F.lit(" "), F.col("props"),
        ).alias("text"),
    )
    toks = msg.select(
        "event_type",
        token_count("text").alias("ws_n"),
        token_count_bpe("text").alias("bpe_n"),
    )
    return (
        toks.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("ws_n").alias("ws_tokens"),
            F.sum("bpe_n").alias("bpe_tokens"),
            F.expr("sum(bpe_n) * 1000000 div sum(ws_n)")
            .alias("inflation_ppm"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# t24 — EXACT per-source document budgets ("at most N docs from each
# source"), the count-budgeted complement of t06's fractional mixing:
# `capped_sample_per_group` keeps each source's cap smallest rows by a
# salted-hash order — deterministic across runs, partitionings, and
# engines. The operator's scale shape (group counts -> hash-space
# pre-filter -> window over ~safety*caps survivors, never the corpus)
# must produce EXACTLY the naive global window's answer, which is what
# the oracle computes with a plain ROW_NUMBER over the identical hash.
# ---------------------------------------------------------------------------
@register(
    "t24_capped_source_budgets",
    oracle="""
    WITH ranked AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY ('0x' || substr(md5('cap' ||
                           CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
                        doc_id) AS rn
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM ranked
    WHERE rn <= CASE source WHEN 'src0' THEN 5 WHEN 'src1' THEN 30
                            WHEN 'src2' THEN 12 ELSE 8 END
    GROUP BY source
    ORDER BY source
    """,
    doc="data mixing: exact per-source document budgets via "
        "deterministic hash-ranked caps (windowed over O(caps) "
        "survivors, not the corpus)",
    tags=("text", "sampling", "pipeline"),
)
def t24(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import capped_sample_per_group

    docs = load_table(spark, sf_dir, "documents").select("source", "doc_id")
    kept = capped_sample_per_group(
        docs,
        "source",
        {"src0": 5, "src1": 30, "src2": 12},
        id_col="doc_id",
        salt="cap",
        default_cap=8,
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("doc_id").alias("id_sum"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("source")
    )
