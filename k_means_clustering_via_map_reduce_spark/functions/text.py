"""Text expression builders shared by the text-analysis and dedup
operators. All pure JVM-side expressions (no Python UDFs): tokenization,
word n-gram shingling, and an md5-based min-shingle fingerprint.

Determinism contract: every builder here has an exact ANSI-SQL equivalent
(DuckDB list lambdas) used by the oracle harness, so token/shingle
boundaries must match to the character.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """Whitespace tokens of trimmed text — identical to DuckDB
    ``string_split(trim(text), ' ')``. Fixture texts are single-space
    separated; ``split`` on a single space keeps parity exact."""
    return F.split(F.trim(text), " ")


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined), the unit for
    jaccard / MinHash dedup. Guarded for texts shorter than n words
    (``F.sequence`` would otherwise produce a DESCENDING sequence)."""
    toks = tokens(text)
    n_tok = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n_tok - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(n_tok >= n, F.array_distinct(grams)).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def min_shingle_md5_fingerprint(text: Column, n: int = 5) -> Column:
    """Document fingerprint: minimum md5 over word n-gram shingles (a
    1-permutation MinHash, usable as a near-dup blocking key). md5 hex is
    identical across Spark and DuckDB, making this fully oracle-checkable.
    """
    toks = tokens(text)
    n_tok = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n_tok - (n - 1)),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))),
    )
    return F.when(n_tok >= n, F.array_min(grams)).otherwise(
        F.md5(F.concat_ws(" ", toks))
    )
