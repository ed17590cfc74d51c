"""Text-column primitives for the dedup / text-analysis operators.

[EXT] — north-star additions; the reference computes nothing over its
stored strings (SURVEY.md §2.2). Everything here is built-in-function
composition (split / transform / filter / sequence) so it stays inside
whole-stage codegen; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: whitespace tokenizer — fixture texts are single-space separated
TOKEN_SEP = r"\s+"


def tokens(text: Column | str) -> Column:
    """Whitespace tokens with empties dropped (safe on ''/trailing space)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, TOKEN_SEP), lambda t: t != "")


def distinct_tokens(text: Column | str) -> Column:
    return F.array_distinct(tokens(text))


def token_shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles: array of 'w1 w2 … wn' strings.

    Built as sequence(0, len-n) → transform(slice → concat_ws): stays
    JVM-side. Documents shorter than n tokens yield a single shingle of
    the whole text so they still participate in similarity.
    """
    toks = tokens(text)
    k = F.size(toks)
    whole = F.array(F.concat_ws(" ", toks))
    grams = F.transform(
        F.sequence(F.lit(1), k - n + 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(k >= n, grams).otherwise(whole)
