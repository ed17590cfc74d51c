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


def canonical_text(text: Column | str) -> Column:
    """Canonical form for near-exact dedup: lowercase, trim, collapse
    internal whitespace. The standard first pass of an LLM-corpus
    dedup pipeline (case/whitespace variants are the same document)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """MinHash signature: array of ``num_hashes`` 64-bit minima.

    Hash family: ``xxhash64(seed_i, shingle)`` — seeding via an extra
    hashed column gives ``num_hashes`` independent functions from the
    one built-in. Entirely per-row JVM expression work (transform +
    array_min): signatures need NO shuffle and NO UDF, so this step
    scales linearly with a pure map stage at any data size.
    """
    # NB: seed binding must use a closure factory, not a defaulted
    # lambda arg — PySpark dispatches higher-order-function lambdas on
    # their total parameter count, so `lambda s, i=i:` would be treated
    # as the (element, index) form and silently hash with the array
    # index instead of the seed.
    def _hasher(seed: int):
        return lambda s: F.xxhash64(F.lit(seed), s)

    sigs = [F.array_min(F.transform(shingles, _hasher(i))) for i in range(num_hashes)]
    return F.array(*sigs)


def lsh_band_keys(signature: Column, bands: int = 16, rows: int = 4) -> Column:
    """Banded LSH keys: array of ``(band, key)`` structs.

    Each band hashes ``rows`` consecutive signature slots into one
    64-bit key; two documents collide in a band iff that slice of
    their signatures agrees exactly. With Jaccard ``j``, detection
    probability is ``1 - (1 - j^rows)^bands`` — at (16, 4), j=0.9
    documents are missed with probability ~4e-8 while j=0.2 noise
    almost never collides. The downstream candidate join shuffles only
    ``docs x bands`` tiny rows, never all-pairs.
    """
    keys = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[signature[b * rows + r] for r in range(rows)]).alias("key"),
        )
        for b in range(bands)
    ]
    return F.array(*keys)


def simhash64(terms: Column) -> Column:
    """64-bit SimHash over an array of terms (tokens or shingles).

    Bit ``j`` of the result is 1 iff the sum over terms of
    ``±1`` (sign of bit ``j`` of ``xxhash64(term)``) is positive.
    Near-duplicate documents differ in few bits (small Hamming
    distance). Pure per-row fold — no shuffle, no UDF.
    """
    hashes = F.transform(terms, lambda t: F.xxhash64(t))

    def _bit_merge(bit: int):
        # closure factory (see minhash_signature) — a defaulted lambda
        # arg would change the lambda's arity for PySpark's dispatch
        return lambda acc, h: acc + (F.shiftright(h, bit).bitwiseAND(F.lit(1)) * 2 - 1)

    bit_sums = [F.aggregate(hashes, F.lit(0).cast("long"), _bit_merge(j)) for j in range(64)]
    out = F.lit(0).cast("long")
    for j, s in enumerate(bit_sums):
        # bitwise OR of disjoint bits; shiftleft keeps bit 63 in-range
        # (it becomes the sign bit of the 64-bit pattern)
        out = out.bitwiseOR(
            F.when(s > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(F.lit(0).cast("long"))
        )
    return out
