"""Text-analysis operators for LLM-data-pipeline workloads
(north-star extension surface, BASELINE.json): quality scoring, token
counting, language ID, document fingerprinting.

Everything is built from JVM built-ins (regexp, higher-order array
functions) — no Python UDFs — so each operator is a narrow projection
over the documents table: Catalyst prunes to (id, text) at the scan and
the work parallelizes per-partition with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import simple_word_count, word_tokens
from .materialize import ensure_min_parallelism

#: BPE-ish tokenizer: letter runs, single digits, or single
#: non-alphanumeric-non-space marks (ASCII-safe across regex engines).
TOKEN_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"

#: Marker stopwords per language for the n-gram/stopword language-ID
#: heuristic. Ordered dict — the order breaks score ties deterministically.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "to"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}

FINGERPRINT_MOD = 1_000_000_007


def occurrence_count(text: Column, needle: str) -> Column:
    """Count non-overlapping occurrences of a literal substring via
    length arithmetic — identical semantics in any engine."""
    n = len(needle)
    return (
        F.length(text) - F.length(F.replace(text, F.lit(needle)))
    ) / F.lit(n)


def quality_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document quality features: char/word counts, average word
    length, punctuation & digit & whitespace ratios.

    One narrow projection; all expressions fuse into a single
    whole-stage-codegen span over the scan."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = simple_word_count(t)
    no_space = F.replace(t, F.lit(" "))
    punct = F.length(no_space) - F.length(
        F.regexp_replace(no_space, "[^A-Za-z0-9]", "")
    )
    digits = F.length(no_space) - F.length(
        F.regexp_replace(no_space, "[0-9]", "")
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        words.cast("long").alias("n_words"),
        F.round(F.length(no_space) / F.greatest(words, F.lit(1)), 4).alias(
            "avg_word_len"
        ),
        F.round(punct / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
        F.round(digits / F.greatest(n_chars, F.lit(1)), 4).alias(
            "digit_ratio"
        ),
        F.round(
            (n_chars - F.length(no_space)) / F.greatest(n_chars, F.lit(1)), 4
        ).alias("space_ratio"),
    )


def token_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    pattern: str = TOKEN_PATTERN,
) -> DataFrame:
    """Token counting: whitespace words + BPE-ish regex tokens + distinct
    token count. ``regexp_extract_all`` is evaluated JVM-side."""
    t = F.col(text_col)
    toks = F.regexp_extract_all(t, F.lit(pattern), 0)
    return df.select(
        F.col(id_col),
        simple_word_count(t).cast("long").alias("n_words"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
    )


def _marker_score(text: Column, markers: list[str]) -> Column:
    """Stopword hit score: total occurrences of ``' marker '`` in the
    space-padded text (padding catches boundary words).

    Internal spaces are DOUBLED before counting: adjacent occurrences
    ('the the the') share their delimiting space, and the
    non-overlapping replace-count would see only every other one —
    systematically halving repeated-stopword runs and skewing the
    per-language argmax on short texts.  With doubled spaces every
    occurrence owns both its delimiters.  (Mirrored in the DuckDB
    oracle, plans/queries._lang_id_oracle.)"""
    padded = F.concat(
        F.lit(" "), F.replace(text, F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    score = F.lit(0.0)
    for m in markers:
        score = score + occurrence_count(padded, f" {m} ")
    return score


def language_id(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    markers: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword scores,
    ties broken by marker-table order, zero-score → 'und' (undetermined).

    The scoring is pure column arithmetic (no UDF); for a real corpus
    swap in character-n-gram profiles — the operator shape (argmax over
    per-language score columns) stays identical."""
    markers = markers or LANG_MARKERS
    t = F.lower(F.col(text_col))
    scores = {lang: _marker_score(t, ms) for lang, ms in markers.items()}
    # greatest() requires >= 2 columns; a single-language marker table
    # is its own max
    vals = list(scores.values())
    best = vals[0] if len(vals) == 1 else F.greatest(*vals)
    pred = F.lit("und")
    # Build the CASE chain in reverse so earlier languages win ties.
    for lang in reversed(list(markers)):
        pred = F.when(
            (scores[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    out = df.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        *[
            F.round(scores[lang], 1).alias(f"score_{lang}")
            for lang in markers
        ],
    )
    return out


def fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mod: int = FINGERPRINT_MOD,
) -> DataFrame:
    """Deterministic polynomial rolling-hash fingerprint:
    ``fold(chars, acc -> (acc*31 + ascii(char)) % mod)``.

    Engine-portable (same value in any SQL engine with a list fold) —
    unlike md5/xxhash this is reproducible from the algorithm spec, which
    makes it the cross-system dedup key for mirrored corpora."""
    # The character fold is the most CPU-expensive per-row transform in
    # the text stack; don't let it fuse into a single-split scan task.
    df = ensure_min_parallelism(df)
    t = F.col(text_col)
    # Chunked Horner: fold 8 characters per lambda step instead of one
    # (higher-order-function steps are interpreted, so step count is
    # the cost driver — ~8× fewer steps, same arithmetic).  Per chunk:
    # acc' = (acc·31^L + Σ ascii(c_i)·31^(L-1-i)) mod M, with the
    # acc·31^L product split into two ≤31⁴ factors so every
    # intermediate stays below 2^63 (acc < M ≈ 1e9; M·31⁴ ≈ 9.2e14).
    chunk = 8
    pow31 = [31**k for k in range(chunk)]  # 31^0..31^7
    chunks = F.regexp_extract_all(t, F.lit("(?s).{1,%d}" % chunk), 0)

    def step(acc, ch):
        length = F.length(ch)
        inner = None
        for i in range(1, chunk + 1):
            # 31^(L-i) via literal lookup; i > L contributes 0
            term = F.when(
                F.lit(i) <= length,
                F.ascii(F.substring(ch, i, 1)).cast("long")
                * F.element_at(
                    F.array(*[F.lit(p) for p in pow31]),
                    (length - i + 1).cast("int"),
                ),
            ).otherwise(F.lit(0).cast("long"))
            inner = term if inner is None else inner + term
        lo = F.least(length, F.lit(4))
        hi = length - lo
        p_lo = F.element_at(
            F.array(*[F.lit(31**k) for k in range(5)]), (lo + 1).cast("int")
        )
        p_hi = F.element_at(
            F.array(*[F.lit(31**k) for k in range(5)]), (hi + 1).cast("int")
        )
        return ((acc * p_lo % F.lit(mod)) * p_hi % F.lit(mod) + inner) % F.lit(
            mod
        )

    fp = F.aggregate(chunks, F.lit(0).cast("long"), step)
    return df.select(
        F.col(id_col),
        F.when(F.length(t) == 0, F.lit(0)).otherwise(fp).alias("fingerprint"),
        F.length(t).alias("n_chars_computed"),
    )


def chunk_documents(
    docs: DataFrame,
    width: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-width character chunks —
    (doc_id, chunk_id, chunk_text, n_chars) with one output row per
    chunk.  The fan-out runs as sequence→transform→posexplode entirely
    in the JVM: no UDF, and the explode multiplies rows BEFORE any
    shuffle, so chunking composes with downstream per-chunk operators
    (embedding, token counting) at scan parallelism.

    Fixed-width is the deterministic baseline; a boundary-aware variant
    (break on whitespace near the target width) changes only the slice
    expression, not the dataflow shape."""
    # chunk i = substr(text, i*width+1, width), i in [0, ceil(len/width))
    out = docs.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, greatest(cast(ceil(length({text_col})/{width}) as int),1)-1), "
                f"i -> substr({text_col}, i*{width}+1, {width}))"
            )
        ).alias("chunk_id", "chunk_text"),
    )
    return out.withColumn("n_chars", F.length("chunk_text")).filter(
        F.col("n_chars") > 0
    )


def chunk_documents_boundary(
    docs: DataFrame,
    width: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Whitespace-boundary chunking: words pack greedily into chunks of
    ~``width`` chars (each word costs len+1 for its separator), so no
    word is ever split — the chunking an embedding/tokenizer stage
    actually wants, vs the fixed-width baseline in
    :func:`chunk_documents`.

    Dataflow: tokenize → posexplode → running char count per doc (one
    window, partitioned by doc — each doc sorts locally) → chunk id by
    integer division → re-assemble each chunk with an order-preserving
    sorted-struct array join.  All JVM expressions; the only shuffle is
    the doc-partitioned window."""
    words = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), " ")
        ).alias("pos", "word"),
    ).filter(F.col("word") != "")
    w = Window.partitionBy(id_col).orderBy("pos")
    with_chunk = words.withColumn(
        "_cum", F.sum(F.length("word") + 1).over(w)
    ).withColumn(
        "chunk_id",
        ((F.col("_cum") - F.length("word") - 1) / width).cast("int"),
    )
    return (
        with_chunk.groupBy(id_col, "chunk_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda s: s.getField("word"),
                ),
                " ",
            ).alias("chunk_text"),
            F.count("*").alias("n_words"),
        )
        .withColumn("n_chars", F.length("chunk_text"))
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. '21, public): the
    duplicate-word fraction and the share of the single most-frequent
    word n-gram — the standard "is this document degenerate boilerplate"
    signals a training-data pipeline applies before tokenization.

    Scale shape: per-(doc, ngram) frequencies via explode + hash
    aggregate (map-side combine collapses repeats before the shuffle,
    which carries one row per DISTINCT (doc, ngram)), then a per-doc
    max.  Never an O(len²) per-row array scan — a 10⁶-token document
    costs 10⁶ explode rows, not 10¹² comparisons.  The top-ngram tie
    rule is max(struct(count, ngram)): highest count, then
    lexicographically greatest ngram — deterministic on both engines.

    A zero-shuffle alternative (array_sort + an ``F.aggregate``
    longest-run fold, no explode) was counterfactually measured at 1M
    docs: 2.5× SLOWER steady-state (48.5 s vs 19.3 s) — higher-order
    lambdas evaluate on the interpreted expression path, while the
    explode + hash aggregate stays inside whole-stage codegen.  The
    shuffles are cheap (map-side combine; one row per distinct
    (doc, ngram)); the per-element eval path is not."""
    # Gram/tokenization fan-out is the CPU-heavy map stage; do not let
    # it fuse into an under-split (single row group) scan task.
    df = ensure_min_parallelism(df)
    toks = word_tokens(text_col)
    base = df.select(F.col(id_col), toks.alias("_t"))
    word_stats = base.select(
        F.col(id_col),
        F.size("_t").cast("long").alias("n_words"),
        # zero tokens means zero DUPLICATED tokens, not "maximally
        # repeated": without the zero-word branch the formula gives
        # 1.0 - 0/1 = 1.0 and a Gopher-style dup_word_frac threshold
        # flags every empty/whitespace doc as degenerate-repetitive
        F.when(F.size("_t") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.lit(1.0)
                - F.size(F.array_distinct("_t"))
                / F.greatest(F.size("_t"), F.lit(1)),
                4,
            )
        )
        .alias("dup_word_frac"),
    )
    grams = F.when(
        F.size("_t") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("_t") - n),
            lambda i: F.concat_ws(
                " ", F.slice(F.col("_t"), i + 1, n)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_gram = (
        base.select(F.col(id_col), F.explode(grams).alias("_g"))
        .groupBy(id_col, "_g")
        .agg(F.count("*").alias("_n"))
    )
    top = (
        per_gram.groupBy(id_col)
        .agg(
            F.max(F.struct(F.col("_n"), F.col("_g"))).alias("_top"),
            F.sum("_n").alias("_total"),
        )
        .select(
            F.col(id_col),
            F.col("_top._g").alias("top_ngram"),
            F.col("_top._n").cast("long").alias("top_ngram_n"),
            F.round(F.col("_top._n") / F.col("_total"), 4).alias(
                "top_ngram_frac"
            ),
        )
    )
    return word_stats.join(top, id_col, "left").select(
        id_col,
        "n_words",
        "dup_word_frac",
        F.coalesce(F.col("top_ngram"), F.lit("")).alias("top_ngram"),
        F.coalesce(F.col("top_ngram_n"), F.lit(0)).alias("top_ngram_n"),
        F.coalesce(F.col("top_ngram_frac"), F.lit(0.0)).alias(
            "top_ngram_frac"
        ),
    )


def _word_tokens(text_col: str) -> Column:
    """Alias of functions.text.word_tokens (the one shared tokenizer)."""
    return word_tokens(text_col)


def boilerplate_ngram_stats(
    df: DataFrame,
    n: int = 3,
    min_docs: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level boilerplate detection (the CCNet/C4 idea at phrase
    granularity): a word n-gram appearing in ≥ ``min_docs`` DISTINCT
    documents is boilerplate (headers, footers, license blurbs); each
    document reports how much of it is made of such phrases.

    Scale shape — two shuffles, both on the n-gram key:
    1. per-doc DISTINCT grams via ``array_distinct`` (JVM-side, before
       any explode fan-out reaches a shuffle), then a gram-keyed hash
       aggregate counting distinct docs.  Map-side partial aggregation
       collapses each gram to one row per partition, so the shuffle
       carries one (gram, partial) row per distinct gram per partition —
       never one row per occurrence.
    2. the (doc, gram) pairs re-join the boilerplate gram set.  AQE
       broadcasts it (it is frequency-bounded: ≤ corpus_grams/min_docs
       rows), so the probe side never shuffles and the gram explode is
       recomputed under each consumer rather than materialized.
    That double-compute is deliberate: a shared ``repartition(_g)``
    exchange (explode once, both consumers read the shuffle files) was
    counterfactually measured at 1M docs / 48M gram rows — 0.95× median
    over 3 interleaved pairs, inside box noise — because the exchange
    shuffles ~8× the corpus bytes while the recompute is a second pass
    over an already-small map stage.  No driver materialization anywhere.
    """
    # Gram/tokenization fan-out is the CPU-heavy map stage; do not let
    # it fuse into an under-split (single row group) scan task.
    df = ensure_min_parallelism(df)
    grams_arr = F.when(
        F.size("_t") >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("_t") - n),
                lambda i: F.concat_ws(" ", F.slice(F.col("_t"), i + 1, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    doc_grams = (
        df.select(F.col(id_col), _word_tokens(text_col).alias("_t"))
        .select(F.col(id_col), F.explode_outer(grams_arr).alias("_g"))
    )
    boiler = (
        doc_grams.filter(F.col("_g").isNotNull())
        .groupBy("_g")
        .agg(F.count("*").alias("_df"))  # rows are per-doc DISTINCT grams
        .filter(F.col("_df") >= min_docs)
    )
    return (
        doc_grams.join(boiler, "_g", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.col("_g")).cast("long").alias("n_grams"),
            F.count(F.col("_df")).cast("long").alias("n_boiler_grams"),
            # Integer basis-point ratio (repo convention, the
            # avg_tokens_e2 pattern): exact integer division on both
            # engines, immune to the driver's float-exact hash.
            F.expr(
                "(count(_df) * 10000) div greatest(count(_g), 1)"
            ).cast("long").alias("boiler_frac_e4"),
        )
    )


#: Redaction patterns, applied in order (URLs first so an embedded
#: email-like path segment is not double-counted).  ASCII-only classes —
#: identical semantics under Java regex (Spark) and RE2 (DuckDB).
#: The angle brackets are load-bearing: '<'/'>' sit outside every
#: pattern's character class, so a placeholder can never extend into a
#: later pattern's match (e.g. '<URL>@dom.tld' is not an email — the
#: local part would need a class character where '>' is).  Pinned by
#: tests/test_text_ops.py::test_pii_scrub_placeholders_cannot_synthesize_matches.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://[A-Za-z0-9./_%-]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("ip", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
]


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII scrubbing: sequential regex redaction of URLs, emails, and
    IPv4-shaped numbers with typed placeholder tokens, plus per-category
    match counts — the pre-training privacy pass every public pipeline
    (C4, Dolma, RefinedWeb) runs in some form.

    Each category's count is evaluated on the text AFTER the previous
    category's redaction, so an email inside a URL counts once as URL.
    Pure ``regexp_replace``/``regexp_count`` column expressions: the
    whole scrub fuses into one codegen span over the scan — zero
    shuffles, scales linearly with corpus bytes."""
    t = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(F.regexp_count(t, F.lit(pat)).cast("long").alias(f"n_{name}"))
        t = F.regexp_replace(t, pat, token)
    return df.select(F.col(id_col), *counts, t.alias("clean_text"))


def passage_dedup_stats(
    df: DataFrame,
    width: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Passage-level exact duplication profile: documents are cut into
    non-overlapping ``width``-word passages; a passage text occurring in
    ≥2 distinct documents is a duplicate passage.  Per doc: passage
    count, duplicated-passage count, and the duplicated fraction — the
    sub-document dedup signal (C4 dedups at 3-sentence spans) that
    document-level hashing misses.

    Scale shape: passage fan-out is a JVM ``sequence``+``transform``
    (no UDF); the corpus-frequency aggregate groups by passage text with
    map-side partials, then the per-doc rollup re-uses the same
    passage-keyed partitioning.  The shuffle carries one row per
    distinct (passage, doc) — for production-size corpora swap the
    passage string for ``xxhash64(passage)`` to shrink shuffle bytes
    (collision odds ~n²/2⁶⁴); the gate keeps the text so the oracle is
    exact."""
    toks = _word_tokens(text_col)
    passages = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("_t"), F.lit(1)), F.lit(width)),
        lambda i: F.concat_ws(" ", F.slice(F.col("_t"), i, width)),
    )
    doc_pass = (
        df.select(F.col(id_col), toks.alias("_t"))
        .filter(F.size("_t") > 0)
        .select(F.col(id_col), F.explode(passages).alias("_p"))
    )
    by_passage = doc_pass.groupBy("_p").agg(
        F.countDistinct(id_col).alias("_docs")
    )
    return (
        doc_pass.join(by_passage, "_p")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_passages"),
            F.sum((F.col("_docs") >= 2).cast("long")).alias("n_dup_passages"),
            # Integer basis-point ratio (repo convention) — exact
            # integer division, no cross-engine float drift.
            F.expr(
                "(sum(CAST(_docs >= 2 AS INT)) * 10000) div count(*)"
            ).cast("long").alias("dup_passage_frac_e4"),
        )
    )


def bpe_pair_counts(
    df: DataFrame,
    top_k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """One BPE merge step over the corpus: global frequencies of adjacent
    character pairs inside whitespace words, top-k by (count desc, pair
    asc) — the inner loop of byte-pair-encoding vocabulary induction,
    run corpus-wide as a distributed aggregate.

    Scale shape: per-word pair fan-out is JVM ``sequence``+``transform``
    (a w-char word yields w-1 pairs before any shuffle); the pair
    frequency aggregate is a hash agg with map-side combine — the
    shuffle carries one row per distinct pair per partition, and the
    pair alphabet is tiny (≤ |charset|²), so the final agg is
    broadcast-sized regardless of corpus size.  Top-k is a
    TakeOrderedAndProject, never a global sort."""
    words = df.select(
        F.explode(_word_tokens(text_col)).alias("_w")
    ).filter(F.length("_w") >= 2)
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("_w") - 1),
                lambda i: F.substring(F.col("_w"), i, 2),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair"))
        .limit(top_k)
    )


def benchmark_overlap(
    df: DataFrame,
    bench: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    exclude_self_matches: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word n-gram with an eval-suite document — the n-gram-overlap rule
    public LLM pipelines apply before training (GPT-3 appendix C /
    Dolma's decontamination stage use 8-13-gram variants).

    ``bench`` is small BY CONTRACT (eval suites are 10³-10⁵ docs), so
    its exploded distinct shingles broadcast to every executor; the
    corpus side streams through a broadcast hash join with no text
    shuffle — the only shuffle is the per-doc match aggregate, which
    carries (doc_id, matched-gram) pairs.  Output: one row per
    CONTAMINATED doc (n_shared_ngrams ≥ 1).

    ``bench``'s id column: ``bench_id_col`` when bench carries a column
    of that name, else ``id_col`` (the subset-style bench the in-repo
    gate uses — a filtered view of the corpus itself); either way the
    output aliases it to ``bench_id_col``.  ``exclude_self_matches``
    (default True) drops gram matches where the two ids are EQUAL —
    correct exactly when bench ids live in the corpus id space
    (subset-style); pass False for an independent eval table, where an
    id collision is meaningless and excluding it would silently ship a
    contaminated document to training."""

    def grams(frame: DataFrame, in_id: str, out_id: str) -> DataFrame:
        # Gram identity = xxhash64 OVER THE TOKEN-ARRAY SLICE: the
        # n-gram string is never materialized (no concat_ws, no
        # ~8-word string per position through distinct/join/agg — the
        # shuffle and the broadcast carry 8-byte longs).  Counts match
        # the string formulation unless two distinct grams collide in
        # 64 bits: p ≈ G²/2⁶⁵, ~10⁻¹⁰ at a million grams — far below
        # the gate's float-rounding tolerances elsewhere.
        toks = word_tokens(text_col)
        gs = F.array_distinct(
            F.when(
                F.size("_t") >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size("_t") - n),
                    lambda i: F.xxhash64(
                        F.concat_ws(" ", F.slice(F.col("_t"), i + 1, n))
                    ),
                ),
            ).otherwise(F.array().cast("array<bigint>"))
        )
        return (
            frame.select(F.col(in_id).alias(out_id), toks.alias("_t"))
            .select(out_id, gs.alias("_gs"))
            .select(
                out_id,
                F.size("_gs").alias("_n_doc_grams"),
                F.explode("_gs").alias("_g"),
            )
        )

    # Only the corpus side rebalances: bench is broadcast-small by
    # contract, and its gram stage is a rounding error.
    corpus = grams(ensure_min_parallelism(df), id_col, id_col)
    bench_in = bench_id_col if bench_id_col in bench.columns else id_col
    bench_g = grams(bench, bench_in, bench_id_col).select(
        bench_id_col, "_g"
    )
    joined = corpus.join(F.broadcast(bench_g), "_g")
    if exclude_self_matches:
        joined = joined.filter(F.col(id_col) != F.col(bench_id_col))
    return joined.groupBy(id_col).agg(
        F.countDistinct("_g").cast("long").alias("n_shared_ngrams"),
        F.countDistinct(bench_id_col).cast("long").alias("n_bench_docs"),
        F.min(bench_id_col).alias("min_bench_id"),
        F.round(
            F.countDistinct("_g") / F.max("_n_doc_grams"), 4
        ).alias("shared_frac"),
    )


def feature_hash_counts(
    df: DataFrame,
    dims: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashing-trick bag-of-words (Weinberger et al. '09): every token
    maps to ``dim = md5_bucket(token) mod dims`` and the document's
    feature vector is the per-dim token count, emitted as sparse
    (doc_id, dim, n) rows — the fixed-width featurization step before
    classical quality classifiers (fastText-style) in curation
    pipelines.

    The md5-hex-digit fold follows the SHAPE of
    ``operators.dedup.md5_bucket`` but is deliberately its own spec —
    no seed prefix (the feature space is unseeded by definition) and
    no NULL sentinel (tokens are non-null by construction of the
    tokenizer) — and is oracle-pinned independently, so a change to
    the split-bucket spec must NOT be blindly mirrored here.  It keeps
    the feature space engine-portable: any stack reproduces identical
    vectors from the spec.  Dataflow: explode tokens → project dim →
    hash aggregate with
    map-side combine; the shuffle carries one row per distinct
    (doc, dim) — bounded by ``dims`` per document regardless of length."""
    toks = df.select(
        F.col(id_col), F.explode(_word_tokens(text_col)).alias("_w")
    )
    hexd = F.md5(F.col("_w"))
    val = F.lit(0).cast("long")
    for i in range(1, 7):
        val = val * 16 + (
            F.instr(F.lit("0123456789abcdef"), F.substring(hexd, i, 1)) - 1
        )
    return (
        toks.withColumn("dim", F.pmod(val, F.lit(dims)).cast("long"))
        .groupBy(id_col, "dim")
        .agg(F.count("*").cast("long").alias("n"))
    )


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-trained bigram language-model scoring (the CCNet/KenLM
    idea, count-based): train add-one-smoothed bigram probabilities on
    the corpus itself, then score each SCORABLE document by its mean
    negative log-probability — low = fluent-for-this-corpus, high =
    outlier or degenerate text.  The standard statistical quality
    filter between heuristics (repetition_stats) and a learned
    classifier.

    Output contract: documents with fewer than two whitespace tokens
    have no bigrams, hence no defined perplexity — they are ABSENT
    from the output (not scored 0, which would fake fluency).  Callers
    folding scores into a corpus-wide table should left-join on doc_id
    and treat the resulting NULL as "unscorable — route to the
    degenerate-document heuristics", which is what repetition_stats
    exists to flag.

    P(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V),  V = |vocabulary|;
    score(doc) = avg over the doc's bigrams of −ln P.

    Scale shape: training and scoring share ONE bigram explode — the
    (w1, w2)-keyed frequency aggregate (map-side combined) joins back to
    the per-doc bigram stream on the same key (exchange reuse).  The
    unigram-count join carries NO broadcast hint: a web-scale
    whitespace-token vocabulary (URLs, junk tokens) is unbounded, so
    forcing vocab-sized state through the driver/executors is an OOM
    hazard — the join shuffles on w1 (the bigram stream's key prefix)
    and AQE still broadcasts at runtime when c_x measures small.  Only
    the 1-row vocabulary-size aggregate is a forced broadcast.  Nothing
    buffers per group; cost is two passes over exploded bigrams."""
    toks = _word_tokens(text_col)
    grams = (
        df.select(F.col(id_col), toks.alias("_t"))
        .filter(F.size("_t") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_t") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("_t"), i).alias("w1"),
                        F.element_at(F.col("_t"), i + 1).alias("w2"),
                    ),
                )
            ).alias("_g"),
        )
        .select(id_col, "_g.w1", "_g.w2")
    )
    c_xy = grams.groupBy("w1", "w2").agg(F.count("*").alias("_cxy"))
    c_x = grams.groupBy("w1").agg(F.count("*").alias("_cx"))
    vocab = df.select(
        F.explode(_word_tokens(text_col)).alias("_w")
    ).agg(F.countDistinct("_w").cast("double").alias("_v"))
    scored = (
        grams.join(c_xy, ["w1", "w2"])
        .join(c_x, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            (
                -F.log((F.col("_cxy") + 1) / (F.col("_cx") + F.col("_v")))
            ).alias("_nll"),
        )
    )
    # avg_nll_e3: floor-scaled integer variant for float-exact gates —
    # the double average accumulates in engine-specific order.
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.avg("_nll"), 4).alias("avg_nll"),
        F.floor(F.avg("_nll") * 1000.0).cast("long").alias("avg_nll_e3"),
    )
