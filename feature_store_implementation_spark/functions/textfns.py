"""Text column helpers shared by the dedup and text-analysis operators.

Tokenization is whitespace-based with empty-token filtering, matching the
oracle-expressible DuckDB form
``list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')`` exactly."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens_col(text: Column, lowercase: bool = True) -> Column:
    t = F.lower(text) if lowercase else text
    return F.filter(F.split(t, r"\s+"), lambda x: x != "")


def word_ngrams_col(tokens: Column, n: int) -> Column:
    """Word n-gram shingles (space-joined), deduplicated. Documents shorter
    than n tokens contribute their whole token sequence as one shingle so
    they still participate in similarity."""
    joined_all = F.array_join(tokens, " ")
    ngrams = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
        lambda i: F.array_join(F.slice(tokens, i, n), " "),
    )
    return F.when(F.size(tokens) >= n, F.array_distinct(ngrams)).otherwise(
        F.array(joined_all)
    )
