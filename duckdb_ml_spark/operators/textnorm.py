"""Text normalization / shingling primitives shared by dedup + text analysis.

Every helper has an exact DuckDB-SQL twin (the *_SQL strings) so operator outputs
are value-hash checkable against the oracle. Normalization contract:
lowercase → collapse non-alphanumeric runs to single spaces → trim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- normalized text -------------------------------------------------------

def norm_text(col) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def norm_text_sql(expr: str) -> str:
    return f"trim(regexp_replace(lower({expr}), '[^a-z0-9]+', ' ', 'g'))"


# --- word tokens ------------------------------------------------------------

def tokens(col) -> Column:
    """Split normalized text on single spaces (no empty tokens by construction)."""
    return F.split(norm_text(col), " ")


def tokens_sql(expr: str) -> str:
    return f"string_split({norm_text_sql(expr)}, ' ')"


# --- word n-gram shingles ---------------------------------------------------

def shingles(col, n: int = 3) -> Column:
    """Word n-grams as space-joined strings; empty array when < n tokens."""
    toks = tokens(col)
    idx = F.sequence(F.lit(0), F.size(toks) - n)  # 0-based start positions
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


def shingles_sql(expr: str, n: int = 3) -> str:
    """DuckDB twin of shingles(): lateral generate_series over 1-based positions.

    Usable as a FROM-clause fragment:
        WITH toks AS (SELECT doc_id, {tokens_sql} AS w FROM documents)
        SELECT doc_id, {gram} FROM toks, generate_series(1, len(w)-(n-1)) AS t(i)
    """
    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    return gram
