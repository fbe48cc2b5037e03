"""Text-analysis column expressions — tokenization, n-grams, ratios,
fingerprints. All built-in Catalyst expressions (whole-stage codegen'd),
shared by the text/dedup query modules.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column, sep: str = " ") -> Column:
    return F.split(text, sep)


def ngrams(toks: Column, n: int = 2, joiner: str = " ") -> Column:
    """Word n-grams as array<string>; empty when fewer than n tokens
    (including NULL input, whose size() is NULL under ANSI).

    ``F.sequence(start, stop)`` defaults to step -1 when start > stop, so
    a bare ``sequence(1, size - (n-1))`` on a short document yields a
    DESCENDING index array ([1, 0], …) and ``element_at(toks, 0)`` throws
    under Spark 4's ANSI mode. The whole construction is therefore gated
    behind ``size >= n``; CaseWhen only evaluates the taken branch, so
    short docs never touch the sequence.
    """
    grams = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                joiner, *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
            ),
        ),
        lambda s: s != "",
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def stopword_ratio(toks: Column, stopwords: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(stopwords))).cast("double") / F.size(toks)


def vocabulary_fingerprint(text: Column) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    vocabulary — identical across engines (md5 is portable)."""
    return F.md5(F.array_join(F.sort_array(F.array_distinct(tokens(text))), " "))
