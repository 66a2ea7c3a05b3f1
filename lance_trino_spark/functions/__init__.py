"""Column-level helper functions (all JVM-side `pyspark.sql.functions`
compositions — no Python UDFs in any hot path).

Cross-engine determinism: several helpers are mirrored in the DuckDB oracle
SQL of the suite; their exact arithmetic (md5-derived 32-bit hashes, modular
affine permutations bounded to stay inside BIGINT, left-fold float sums) is
chosen so Spark and DuckDB agree bit-for-bit. Change them in lockstep with
suite/dedup.py / suite/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Prime just above 2^32 for affine minhash permutations.
MINHASH_PRIME = 4_294_967_311
# Multipliers capped at 2^30 so a*h + b < 2^62 stays inside BIGINT in both
# Spark and DuckDB (DuckDB errors on BIGINT overflow; Spark wraps — either
# behavior would break cross-engine agreement).
_A_CAP = 1 << 30


def minhash_perms(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic affine-permutation constants (a_j, b_j). Derived from a
    fixed Weyl sequence — no RNG so the same literals can be embedded in
    oracle SQL."""
    perms = []
    for j in range(num_perm):
        a = ((j + 1) * 2_654_435_761 + 0x9E3779B9) % _A_CAP | 1
        b = ((j + 1) * 0x85EBCA6B + 0xC2B2AE35) % MINHASH_PRIME
        perms.append((a, b))
    return perms


def h32(col: Column | str) -> Column:
    """Deterministic 32-bit hash of a string: first 8 hex chars of md5.
    DuckDB equivalent: ``('0x' || substr(md5(x), 1, 8))::BIGINT``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def normalize_text(col: Column | str) -> Column:
    """Canonical text form for fingerprinting: lowercase, collapsed
    whitespace, trimmed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (DuckDB: string_split_regex(trim(x),'\\s+'))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def word_shingles(tokens_col: Column | str, k: int = 3) -> Column:
    """Word k-gram shingles as space-joined strings, preserving order.
    DuckDB: list slice + array_to_string over generate_series."""
    c = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    # Guard: Spark's sequence(1, 0) is the DESCENDING [1, 0], not empty like
    # DuckDB's generate_series — a document shorter than k tokens must yield
    # zero shingles, not two bogus ones.
    return F.expr(
        f"CASE WHEN size({_n(c)}) >= {k} THEN "
        f"transform(sequence(1, size({_n(c)}) - {k - 1}),"
        f" i -> concat_ws(' ', slice({_n(c)}, i, {k})))"
        f" ELSE array() END"
    )


def _n(c: Column) -> str:
    # Column → SQL fragment for use inside F.expr. Only used with simple
    # named columns.
    return c._jc.toString()  # noqa: SLF001


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Left-fold dot product of two float arrays in DOUBLE — a fixed
    summation order so engines agree to the last bit before rounding."""
    ca = a if isinstance(a, str) else _n(a)
    cb = b if isinstance(b, str) else _n(b)
    return F.expr(
        f"aggregate(zip_with({ca}, {cb}, (x, y) -> cast(x as double) * cast(y as double)),"
        f" cast(0.0 as double), (acc, v) -> acc + v)"
    )


def l2_norm(a: Column | str) -> Column:
    ca = a if isinstance(a, str) else _n(a)
    return F.sqrt(
        F.expr(
            f"aggregate({ca}, cast(0.0 as double),"
            f" (acc, v) -> acc + cast(v as double) * cast(v as double))"
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity in DOUBLE. Not rounded: the DuckDB oracle replicates
    the same left-fold summation order (list_reduce over index-ordered
    products), so both engines produce bit-identical doubles."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
