"""Shared deterministic hashing: identical results in Spark and DuckDB.

The engine needs a string→int64 hash that the DuckDB oracle can reproduce
bit-for-bit. ``h60`` takes the first 15 hex chars of md5 (60 bits, always
non-negative, fits int64):

  Spark :  CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)
  DuckDB:  ('0x' || substr(md5(x), 1, 15))::BIGINT

Seeded variants prepend ``'<seed>|'`` to the input. All MinHash/SimHash/
fingerprint operators build on this primitive, so the oracle runs the same
algorithm rather than trusting the engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# modulus for fingerprint arithmetic: keeps products within int64
FP_MOD = 1_000_000_007


def h60(col: Column | str) -> Column:
    """60-bit md5-prefix hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h60_seeded(col: Column | str, seed: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return h60(F.concat(F.lit(f"{seed}|"), c))


def h60_sql(expr: str) -> str:
    """DuckDB twin of :func:`h60` over a SQL expression string."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def h60_seeded_sql(expr: str, seed: int) -> str:
    return h60_sql(f"'{seed}|' || {expr}")


# --- tokenization (identical regex semantics both engines) -----------------

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens_expr(text_col: str = "text") -> Column:
    """Lower-cased word tokens, empties removed (Spark)."""
    return F.expr(
        f"filter(split(lower({text_col}), '{TOKEN_SPLIT_RE}'), t -> t != '')"
    )


def tokens_raw_expr(text_col: str = "text") -> Column:
    """Lower-cased split WITHOUT the empty-token filter (Spark).

    For consumers that only SUM a per-token quantity where an empty
    token contributes zero (e.g. ceil(length/4) subword counts): the
    result is identical to folding over :func:`tokens_expr`, and
    skipping the ``filter`` lambda drops one interpreted higher-order
    pass over every token (~11% of the count projection at 50M rows,
    r10 A/B). NOT for shingling/size() consumers — empties would change
    those."""
    return F.expr(f"split(lower({text_col}), '{TOKEN_SPLIT_RE}')")


def tokens_sql(text_col: str = "text") -> str:
    """DuckDB twin of :func:`tokens_expr`."""
    return (
        f"list_filter(string_split_regex(lower({text_col}), '{TOKEN_SPLIT_RE}'),"
        " t -> t != '')"
    )


def shingles_expr(toks: str, k: int) -> str:
    """Spark SQL expr: k-word shingles from a token-array column name."""
    joined = ", ' ', ".join(f"element_at({toks}, i + {j})" for j in range(k))
    return (
        f"CASE WHEN size({toks}) < {k} THEN array() "
        f"ELSE transform(sequence(1, size({toks}) - {k - 1}), "
        f"i -> concat({joined})) END"
    )


def shingles_sql(toks: str, k: int) -> str:
    """DuckDB twin of :func:`shingles_expr`."""
    joined = " || ' ' || ".join(f"{toks}[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN len({toks}) < {k} THEN [] "
        f"ELSE list_transform(generate_series(1, len({toks}) - {k - 1}), "
        f"i -> {joined}) END"
    )
