"""Scalar text helpers shared by the dedup / text-analysis operators.

Everything here is built from JVM built-ins (``split``, ``xxhash64``,
``transform``/``aggregate`` higher-order functions) — no Python UDFs in
the hot path, so these compose into whole-stage codegen and scale with
the cluster, not with the Python interpreter.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def simple_word_count(col: Column | str) -> Column:
    """Whitespace word count via space counting — engine-portable
    semantics: ``len(text) - len(remove(' ')) + 1`` for non-empty text.

    DELIBERATELY not ``size(word_tokens(c))``: this exact formula is
    what the DuckDB oracles replicate (the gate queries hash-match on
    it), so on text with consecutive/leading/trailing spaces or tab
    separators the count EXCEEDS the token count — both engines agree,
    which is the property that matters.  Use
    ``F.size(word_tokens(c))`` when a count must equal the tokenizer's
    output."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(c) == 0, F.lit(0)).otherwise(
        F.length(c) - F.length(F.replace(c, F.lit(" "), F.lit(""))) + 1
    )


def word_tokens(col: Column | str) -> Column:
    """Whitespace tokens with empties dropped — THE shared tokenizer of
    every corpus-level operator (same rule as the DuckDB oracles).
    Keep all tokenization on this one definition: four operators used
    to inline identical copies, and a future rule change (e.g. tab
    splitting) must land everywhere at once or operators silently
    diverge from the oracle rule."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, " "), lambda x: x != F.lit(""))


def char_ngrams(col: Column | str, n: int = 5) -> Column:
    """Array of character n-gram shingles of ``col`` (distinct not
    applied; callers dedup as needed).  Implemented with ``sequence`` +
    ``transform`` — evaluated vectorized JVM-side, no explode needed
    until the caller wants one."""
    c = F.col(col) if isinstance(col, str) else col
    length = F.length(c)
    starts = F.sequence(F.lit(1), F.greatest(length - (n - 1), F.lit(1)))
    return F.when(length < n, F.array(c)).otherwise(
        F.transform(starts, lambda i: F.substring(c, i, n))
    )


def stable_hash64(col: Column, seed: int) -> Column:
    """Seeded 64-bit stable hash: xxhash64 with the seed mixed in via
    concat — deterministic across sessions/partitions (xxhash64 is a
    fixed algorithm, unlike ``F.hash``'s murmur3 which is also stable but
    32-bit).

    NULL inputs coalesce to a sentinel BEFORE the concat: concat
    null-propagates, and ``xxhash64(NULL)`` is one constant regardless
    of what the seed string would have been — a multi-seed caller
    (minhash-style signatures) would otherwise see every null collapse
    to the same value across ALL seeds instead of seed-distinct
    hashes."""
    return F.xxhash64(
        F.concat(F.lit(f"s{seed}:"), F.coalesce(col, F.lit("\x00<null>")))
    )
