"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure DataFrame transformations built from JVM-side
functions — no Python UDFs — so they stay inside whole-stage codegen and
scale linearly with partitions (a 100 TB documents table maps each operator
to one narrow scan stage, no shuffle).

Reference parity note: the reference connector (lance-trino) has no text
operators; these are the "beyond-reference" LLM-pipeline surface required by
BASELINE.json's north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import normalize_text, tokens

# Deterministic per-language marker-word lists for the n-gram/stopword
# language-ID heuristic. On real multilingual text these discriminate well;
# they are fixed constants so the DuckDB oracle can embed the same lists.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("de", "shi", "le", "zai", "he"),
}
STOPWORDS = LANG_MARKERS["en"]


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("tokens", tokens(text_col))


def _eq_term(term: str):
    """One-arg lambda factory for F.filter (a two-parameter lambda would be
    (element, index) to PySpark); binds the term as a literal Column —
    quote-safe, no SQL text interpolation."""
    return lambda x: x == F.lit(term)


def _count_in(arr_col: str, values) -> Column:
    """size(filter(arr, t -> t IN values)) with the values bound as literal
    Columns, not interpolated into SQL text — quote-safe for any term a
    library caller passes (a term containing ' would break an f-string
    F.expr), and still a pure JVM higher-order expression."""
    vals = list(values)
    return F.size(F.filter(arr_col, lambda t: t.isin(vals)))


def token_count(text_col: str = "text") -> Column:
    """Whitespace token count (the BPE-ish regex variant is
    `token_count_bpe`)."""
    return F.size(tokens(text_col))


def token_count_bpe(text_col: str = "text") -> Column:
    """BPE-ish subword proxy: splits on word boundaries AND digit/letter
    transitions, the usual cheap pre-tokenizer estimate."""
    c = F.regexp_replace(F.col(text_col), r"(\d)([a-zA-Z])", r"$1 $2")
    c = F.regexp_replace(c, r"([a-zA-Z])(\d)", r"$1 $2")
    c = F.regexp_replace(c, r"([.,!?;:])", r" $1 ")
    return F.size(F.split(F.trim(c), r"\s+"))


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of marker-word hit counts, ties broken
    by language code order, 'und' when nothing matches."""
    out = with_tokens(df, text_col)
    score_cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        out = out.withColumn(f"score_{lang}", _count_in("tokens", markers))
        score_cols.append(f"score_{lang}")
    best = F.greatest(*[F.col(c) for c in score_cols])
    pred = F.lit("und")
    # Iterate in reverse so earlier languages win ties (first match wins).
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return out.withColumn("lang_pred", pred).drop("tokens")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: all integer-derived, so the composite score
    (a fixed-weight double expression) is deterministic across engines."""
    out = with_tokens(df, text_col)
    out = (
        out.withColumn("n_chars_m", F.length(text_col))
        .withColumn("n_tokens", F.size("tokens"))
        .withColumn("n_stopwords", _count_in("tokens", STOPWORDS))
        .withColumn(
            "n_punct", F.length(F.regexp_replace(text_col, r"[^.,!?;:]", ""))
        )
        .withColumn(
            "n_alpha", F.length(F.regexp_replace(text_col, r"[^a-zA-Z]", ""))
        )
    )
    return out.drop("tokens")


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score in [0,1]: rewards stopword presence and
    mid-length docs, penalizes punctuation soup. Matches the oracle SQL in
    suite/text.py term for term."""
    out = quality_features(df, text_col)
    stop_ratio = F.col("n_stopwords").cast("double") / F.greatest(
        F.col("n_tokens"), F.lit(1)
    )
    alpha_ratio = F.col("n_alpha").cast("double") / F.greatest(
        F.col("n_chars_m"), F.lit(1)
    )
    punct_ratio = F.col("n_punct").cast("double") / F.greatest(
        F.col("n_chars_m"), F.lit(1)
    )
    length_term = F.least(F.col("n_tokens").cast("double") / F.lit(100.0), F.lit(1.0))
    score = (
        F.lit(0.3) * length_term
        + F.lit(0.3) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.3) * alpha_ratio
        - F.lit(0.1) * F.least(punct_ratio * 10, F.lit(1.0))
    )
    # No rounding: every input is an integer count, so the IEEE-double score
    # is bit-identical across engines; rounding *algorithms* (HALF_UP on
    # shortest-repr vs scaled C rounding) are the only thing that could
    # diverge, so we avoid them entirely.
    return out.withColumn("quality_score", score)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the normalized text (exact-dup key)."""
    return df.withColumn("fingerprint", F.md5(normalize_text(text_col)))


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    text_col: str = "text",
    k: int = 3,
    min_overlap: int = 2,
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share at least
    ``min_overlap`` distinct word k-gram shingles with a benchmark document.

    Returns (id_col, bench_id_col, n_shared) for every contaminated
    (document, benchmark) pair.

    Scale shape — the decisive property: the benchmark side (eval prompts)
    is thousands-to-millions of short rows, so it is BROADCAST; the 100 TB
    corpus side is one narrow scan + shingle explode that joins map-side
    with zero corpus shuffle. The only exchange is the per-(doc, bench)
    overlap count over *matching* shingles — a tiny fraction of the corpus.
    """
    from ..functions import tokens, word_shingles

    # tokenization is PROJECTED before the shingle transform: Spark does no
    # common-subexpression elimination inside transform() lambdas, so an
    # inlined tokens() would re-split the text once per shingle — measured
    # ~5x slower at sf0.1 (same lesson as dedup.shingle_hashes)
    def _shingled(df, out_id, in_id):
        return (
            df.select(F.col(in_id).alias(out_id),
                      tokens(F.col(text_col)).alias("_toks"))
            .select(
                out_id,
                F.explode(
                    F.array_distinct(word_shingles(F.col("_toks"), k))
                ).alias("shingle"),
            )
        )

    d = _shingled(docs, id_col, id_col)
    b = _shingled(benchmark, bench_id_col, bench_id_col)
    return (
        d.join(F.broadcast(b), "shingle")
        .groupBy(id_col, bench_id_col)
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= F.lit(min_overlap))
    )


# PII patterns shared verbatim with the DuckDB oracle (suite/text.py). The
# subset of regex syntax used (character classes, bounded repeats, no
# backrefs/lookaround) behaves identically in Java's regex and DuckDB's RE2.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("phone", r"\d{3}-\d{3}-\d{4}", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub common PII shapes from text before training: emails, phone
    numbers, IPv4 addresses → fixed placeholder tokens, with a per-kind
    match count per document.

    Pure JVM-side `regexp_replace`/`regexp_count` — narrow scan, no shuffle,
    linear at any corpus size. Counts are computed on the ORIGINAL text so
    overlapping patterns report what each rule saw."""
    out = df
    for kind, pattern, _ in PII_PATTERNS:
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(F.col(text_col), F.lit(pattern))
        )
    redacted = F.col(text_col)
    for _, pattern, token in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pattern, token)
    return out.withColumn("redacted", redacted)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 256,
    stride: int = 192,
) -> DataFrame:
    """Split documents into fixed-token-count overlapping chunks — the
    standard context-window preparation step before tokenization/packing.

    Chunk i covers tokens [i*stride, i*stride + chunk_tokens); the last
    chunk is the first one whose window reaches the end of the document
    (shorter tails are never emitted twice). A document shorter than
    ``chunk_tokens`` yields exactly one chunk.

    Implementation is pure JVM expressions: tokenize once, build the chunk
    index list with `sequence`, `posexplode` it, and slice the token array —
    a narrow explode whose output size is input_tokens/stride, with no
    shuffle and no Python in the path.
    """
    if stride <= 0 or chunk_tokens <= 0 or stride > chunk_tokens:
        raise ValueError("need 0 < stride <= chunk_tokens")
    out = df.withColumn("_toks", tokens(text_col)).withColumn(
        "_n_chunks",
        F.greatest(
            F.ceil(
                (F.size("_toks") - F.lit(chunk_tokens)) / F.lit(float(stride))
            ).cast("int")
            + 1,
            F.lit(1),
        ),
    )
    exploded = out.select(
        *df.columns,
        F.posexplode(F.expr("sequence(1, _n_chunks)")).alias("chunk_id", "_one"),
        F.col("_toks"),
    )
    chunk_toks = F.expr(f"slice(_toks, chunk_id * {stride} + 1, {chunk_tokens})")
    return (
        exploded.withColumn("chunk_text", F.concat_ws(" ", chunk_toks))
        .withColumn("chunk_n_tokens", F.size(chunk_toks))
        .drop("_toks", "_one")
    )


def repetition_stats(df: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """Intra-document repetition signals used by pretraining quality filters:
    the fraction of duplicate word k-grams (1 - distinct/total) and the
    dominance of the single most frequent token (top_token_ratio). High
    values flag boilerplate, keyword stuffing, and generation loops.

    Pure JVM expressions over the token array — per-row aggregate lambdas,
    no explode, no shuffle."""
    from ..functions import tokens, word_shingles

    # max token frequency as a sorted run-length fold: O(n log n) per row vs
    # the naive distinct x filter double loop (O(n^2) — measured 2.5x slower
    # at sf0.1 document lengths). NULL on empty token arrays, matching the
    # array_max-over-empty semantics of the naive form.
    top_count = F.when(
        F.size("tokens") > 0,
        F.expr(
            "aggregate(array_sort(tokens), "
            "struct(cast(null as string) as prev, 0 as run, 0 as best), "
            "(acc, x) -> struct(x as prev, "
            "IF(x <=> acc.prev, acc.run + 1, 1) as run, "
            "greatest(acc.best, IF(x <=> acc.prev, acc.run + 1, 1)) as best), "
            "acc -> acc.best)"
        ),
    )
    # tokens PROJECTED before the shingle lambda — Spark does no CSE inside
    # transform(), so an inlined tokens() re-splits the text per shingle
    # (the contamination-check lesson; ~5x at sf0.1)
    return (
        df.withColumn("tokens", tokens(F.col(text_col)))
        .withColumn("_sh", word_shingles(F.col("tokens"), k))
        .withColumn("n_grams", F.size("_sh"))
        .withColumn("n_distinct_grams", F.size(F.array_distinct("_sh")))
        .withColumn(
            "dup_gram_ratio",
            F.when(
                F.col("n_grams") > 0,
                F.lit(1.0)
                - F.col("n_distinct_grams").cast("double")
                / F.col("n_grams").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "top_token_ratio",
            top_count.cast("double") / F.greatest(F.size("tokens"), F.lit(1)).cast("double"),
        )
        .drop("_sh")
    )


# ---------------------------------------------------------------------------
# Gopher-style rule-based quality filtering (Rae et al. 2021 heuristics,
# public paper): each rule a pure JVM boolean expression — narrow scan, no
# shuffle, linear at any corpus size.
# ---------------------------------------------------------------------------
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MEAN_WORD_LEN = (3.0, 10.0)
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_WORD_RATIO = 0.8
GOPHER_MIN_DISTINCT_STOPWORDS = 2


def gopher_quality_filter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Gopher-rule booleans + overall ``keep``.

    Rules (each an independent signal for downstream analysis):
      - word_count: token count in [GOPHER_MIN_WORDS, GOPHER_MAX_WORDS]
      - mean_word_len: mean token length in [3, 10]
      - symbol_ratio: ('#' + '...') occurrences / tokens < 0.1
      - alpha_words: >= 80 % of tokens contain an alphabetic character
      - stopwords: >= 2 distinct English stopwords present
    """
    out = with_tokens(df, text_col)
    n_tok = F.size("tokens")
    sum_len = F.expr(
        "aggregate(transform(tokens, t -> length(t)), 0, (a, v) -> a + v)"
    )
    mean_len = sum_len.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")
    n_symbols = F.regexp_count(F.col(text_col), F.lit("#")) + F.regexp_count(
        F.col(text_col), F.lit(r"\.\.\.")
    )
    n_alpha_words = F.expr("size(filter(tokens, t -> t rlike '[a-zA-Z]'))")
    n_distinct_stop = F.size(
        F.array_distinct(F.filter("tokens", lambda t: t.isin(list(STOPWORDS))))
    )
    out = (
        out.withColumn("n_tokens", n_tok)
        .withColumn(
            "rule_word_count",
            (n_tok >= GOPHER_MIN_WORDS) & (n_tok <= GOPHER_MAX_WORDS),
        )
        .withColumn(
            "rule_mean_word_len",
            (mean_len >= GOPHER_MEAN_WORD_LEN[0])
            & (mean_len <= GOPHER_MEAN_WORD_LEN[1]),
        )
        .withColumn(
            "rule_symbol_ratio",
            n_symbols.cast("double")
            / F.greatest(n_tok, F.lit(1)).cast("double")
            < GOPHER_MAX_SYMBOL_RATIO,
        )
        .withColumn(
            "rule_alpha_words",
            n_alpha_words.cast("double")
            / F.greatest(n_tok, F.lit(1)).cast("double")
            >= GOPHER_MIN_ALPHA_WORD_RATIO,
        )
        .withColumn("rule_stopwords", n_distinct_stop >= GOPHER_MIN_DISTINCT_STOPWORDS)
    )
    keep = (
        F.col("rule_word_count")
        & F.col("rule_mean_word_len")
        & F.col("rule_symbol_ratio")
        & F.col("rule_alpha_words")
        & F.col("rule_stopwords")
    )
    return out.withColumn("keep", keep).drop("tokens")


# ---------------------------------------------------------------------------
# Accent folding: fixed single-char mapping shared verbatim with the DuckDB
# oracle (both engines' translate() has identical 1:1-codepoint semantics).
# ---------------------------------------------------------------------------
ACCENT_FROM = "áàâäãåéèêëíìîïóòôöõúùûüçñý"
ACCENT_TO = "aaaaaaeeeeiiiiooooouuuucny"


def fold_accents(col: Column | str, text_col_is_name: bool = True) -> Column:
    """Deterministic accent folding + canonicalization: lowercase, fold the
    fixed accent table, collapse whitespace, trim. Pure JVM `translate` —
    no ICU/locale dependence, so every engine agrees byte-for-byte."""
    c = F.col(col) if isinstance(col, str) else col
    folded = F.translate(F.lower(c), ACCENT_FROM, ACCENT_TO)
    return F.trim(F.regexp_replace(folded, r"\s+", " "))


# ---------------------------------------------------------------------------
# BM25 ranking (rational-idf variant). The classic BM25 idf is
# ln((N-df+0.5)/(df+0.5)); we keep the *rational* idf (no log) so every
# arithmetic step is an IEEE-754 op both engines execute in the same order —
# scores are bit-identical, which the ln() of two libm implementations does
# not guarantee. Ranking order is preserved (idf_rational is monotone in
# idf_log).
# ---------------------------------------------------------------------------
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document against a fixed term set with BM25 (rational
    idf). Corpus stats (N, avgdl, per-term df) are one tiny aggregate
    broadcast to the scoring scan — the 100 TB shape: two narrow passes,
    no shuffle of the corpus, no Python.

    Returns (id_col, dl, score) with score > 0 only for matching docs.
    """
    toks = with_tokens(docs.select(id_col, text_col), text_col)
    per_doc = toks.select(
        F.col(id_col),
        F.size("tokens").alias("dl"),
        *[
            F.size(F.filter("tokens", _eq_term(t))).alias(f"tf_{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    norm = F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (F.col("dl").cast("double") / avgdl)
    )
    score = F.lit(0.0)
    for i in range(len(query_terms)):
        idf = (
            F.col("n_docs").cast("double") - F.col(f"df_{i}").cast("double") + F.lit(0.5)
        ) / (F.col(f"df_{i}").cast("double") + F.lit(0.5))
        tf = F.col(f"tf_{i}").cast("double")
        score = score + idf * (tf * F.lit(BM25_K1 + 1.0)) / (tf + norm)
    return scored.select(id_col, "dl", score.alias("score"))


def sequence_packing_plan(
    df: DataFrame,
    order_col: str = "doc_id",
    group_col: str | None = None,
    token_budget: int = 2048,
    text_col: str = "text",
) -> DataFrame:
    """Contiguous sequence-packing plan: assign documents (in a deterministic
    order) to fixed token-budget bins by cumulative token count —
    bin = floor(tokens_before / budget). The pre-tokenization packing step
    of a training pipeline, as a pure window computation: one shuffle by
    ``group_col`` (or a single global ordering when None), no Python.

    Contiguous packing intentionally lets a document straddle a bin
    boundary (its tokens fill the tail of one bin and the head of the
    next) — the plan records ``bin`` (where the document starts) and
    ``offset_in_bin`` for the consumer to slice.
    """
    n_tok = token_count(text_col)
    parts = [group_col] if group_col else []
    w = (
        W.partitionBy(*parts).orderBy(order_col).rowsBetween(W.unboundedPreceding, -1)
    )
    out = df.withColumn("n_tokens", n_tok).withColumn(
        "tokens_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return out.withColumn(
        "bin", (F.col("tokens_before") / F.lit(token_budget)).cast("long")
    ).withColumn(
        "offset_in_bin", F.col("tokens_before") % F.lit(token_budget)
    )


URL_PATTERN = r"https?://[^\s]+"


def link_density(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Link-density boilerplate signal: URL count and the fraction of
    characters inside URLs per document (link farms / nav pages score
    high). Pure JVM regexp — narrow scan, no shuffle."""
    urls = F.regexp_count(F.col(text_col), F.lit(URL_PATTERN))
    url_chars = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), URL_PATTERN, "")
    )
    return (
        df.withColumn("n_urls", urls)
        .withColumn(
            "link_char_ratio",
            url_chars.cast("double")
            / F.greatest(F.length(F.col(text_col)), F.lit(1)).cast("double"),
        )
    )


def rare_ngram_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 2,
    max_df: int = 2,
) -> DataFrame:
    """Corpus-novelty signal: the fraction of a document's distinct word
    k-grams that are RARE corpus-wide (document frequency <= max_df).
    High novelty = mostly unique phrasing; low = boilerplate assembled from
    common n-grams — a standard pretraining-quality feature complementing
    the within-document repetition stats (t09).

    Scale shape: distinct (doc, ngram-hash) explode (map-side narrow), one
    groupBy(h) for document frequencies, one join back on the hash, one
    groupBy(doc) — the same inverted-index skeleton as ngram_jaccard, no
    all-pairs step, integer counts + a single exact double division so the
    DuckDB oracle matches bitwise."""
    from .dedup import shingle_hashes

    sh = shingle_hashes(df, id_col, text_col, k)
    dfreq = sh.groupBy("h").agg(F.count("*").alias("df_"))
    per_doc = (
        sh.join(dfreq, "h")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_ngrams"),
            F.sum((F.col("df_") <= max_df).cast("long")).alias("n_rare"),
        )
    )
    return per_doc.withColumn(
        "novelty",
        F.col("n_rare").cast("double") / F.col("n_ngrams").cast("double"),
    )


def corpus_token_histogram(
    docs: DataFrame, text_col: str = "text", top_n: int = 20
) -> DataFrame:
    """Corpus-level token frequency distribution — the canonical distributed
    wordcount, with exact frequency shares.

    Scale shape: one explode (narrow) + one hash-shuffled groupBy with
    map-side partial counts; the global top-n is TakeOrderedAndProject
    (per-partition heaps, no full sort), and the corpus total joins back as
    a single-row broadcast scalar. Nothing in the plan is proportional to
    vocabulary size except the one counts shuffle."""
    toks = docs.select(F.explode(tokens(text_col)).alias("token")).filter(
        F.col("token") != ""
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("total_tokens"))
    top = counts.orderBy(F.col("n").desc(), "token").limit(top_n)
    w = W.orderBy(F.col("n").desc(), "token")
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).cast("bigint").alias("rank"),
            "token",
            "n",
            (F.col("n") * F.lit(10000.0) / F.col("total_tokens")).alias(
                "freq_per_10k"
            ),
        )
        .orderBy("rank")
    )


def vocab_stats_by_source(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source vocabulary health: token volume, distinct vocabulary
    (type count), type/token ratio, and tokens per document — the corpus
    diagnostics a mixing/dedup pipeline watches per source.

    Scale shape: one explode + one groupBy(source) with two-phase
    COUNT(DISTINCT) (Spark's expand + partial aggregate); doc counts ride
    the same aggregate via countDistinct(id), so the whole operator is a
    single shuffle keyed on the (low-cardinality) source column."""
    toks = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("_id"),
        F.explode(tokens(text_col)).alias("token"),
    ).filter(F.col("token") != "")
    return (
        toks.groupBy("source")
        .agg(
            F.countDistinct("_id").alias("n_docs"),
            F.count("*").alias("n_tokens"),
            F.countDistinct("token").alias("n_types"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_types",
            (F.col("n_types") / F.col("n_tokens")).alias("type_token_ratio"),
            (F.col("n_tokens") / F.col("n_docs")).alias("tokens_per_doc"),
        )
        .orderBy("source")
    )


def url_domain_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-domain link statistics over a document corpus — the URL half of
    a crawl-curation pipeline (domain allow/block lists, per-domain dedup
    budgets, citation graphs). Extracts every URL, parses its domain with
    plain regexp (JVM-side, no UDF), and aggregates: url count, distinct
    linking documents, and a deterministic sample URL (MIN) per domain.

    Scale shape: regexp_extract_all + explode is a narrow per-row
    projection; the only shuffle is the final domain aggregation, and
    domains are a heavy-hitter-friendly key (map-side combine collapses
    each partition to its distinct domain set first)."""
    urls = df.select(
        F.col("doc_id"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 0)
        ).alias("url"),
    ).withColumn(
        "domain", F.regexp_extract(F.col("url"), r"https?://([^/\s]+)", 1)
    )
    return urls.groupBy("domain").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.min("url").alias("sample_url"),
    )


def boilerplate_by_source(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    k: int = 5,
    min_df: int = 3,
) -> DataFrame:
    """Per-source boilerplate coverage: the share of each source's distinct
    word k-grams that are corpus-COMMON (document frequency >= min_df) —
    the inverse lens of rare_ngram_novelty and the standard signal for
    template/boilerplate-heavy sources that need cleaning before training
    (navigation chrome, license footers, scraped templates).

    Scale shape: the same inverted-index skeleton as the dedup family —
    distinct (doc, ngram-hash) pairs, one groupBy(h) for document
    frequencies, a hash-join back, a per-doc aggregate, then a small
    dimension join on doc_id and a per-source rollup. No all-pairs step;
    every count is exact integer so the DuckDB oracle matches bitwise."""
    from .dedup import shingle_hashes

    sh = shingle_hashes(df, id_col, text_col, k)
    dfreq = sh.groupBy("h").agg(F.count("*").alias("df_"))
    per_doc = (
        sh.join(dfreq, "h")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_ngrams"),
            F.sum((F.col("df_") >= min_df).cast("long")).alias("n_boiler"),
        )
    )
    return (
        per_doc.join(df.select(id_col, source_col), id_col)
        .groupBy(source_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_ngrams").alias("total_ngrams"),
            F.sum("n_boiler").alias("boiler_ngrams"),
        )
        .withColumn(
            "boiler_ppm",
            F.expr("(boiler_ngrams * 1000000L) div total_ngrams"),
        )
    )
